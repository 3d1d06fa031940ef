package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over an `ArrayType(FloatType)` embedding
  * column: brute-force top-k as the exactness baseline, and a blocked
  * (IVF-style) variant as the scale path.
  *
  * Scale design: the scan side never shuffles — the query vector (or
  * the small query set) broadcasts, the dot product is a codegen'd
  * higher-order expression (`zip_with` + `aggregate`, no UDF boxing),
  * and `orderBy(desc).limit(k)` compiles to TakeOrderedAndProject
  * (per-partition top-k, driver merges k·P rows, never a global sort).
  * At 100 TB add metadata partition pruning in front; the blocked
  * variant shows the nprobe=1 IVF shape where only the query's
  * cell(s) are scanned.
  *
  * Reference surface: LanceDB brute-force vector KNN, cosine, k=5
  * (generate_note_embeddings.py:61); TIPS.md notes no index needed
  * below 100K vectors — the same judgement call, made explicit here.
  */
object Vectors {

  /** Exact cosine similarity (double). For ranking, prefer
    * `intDot` + pre-normalized vectors — same order, cheaper, and
    * reproducible across engines.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), _ + _)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")), lit(0.0), _ + _)
    dot / sqrt(na * nb)
  }

  /** Floats scaled to exact 1e7-scaled longs — integer dot products
    * are order-independent and bit-identical across engines. Native
    * [[graft.functions.IntVector]] expression (fused codegen loop,
    * bit-identical to the `transform(v, x => round(x * 1e7)
    * .cast(LONG))` HOF it replaced — that lambda evaluated interpreted
    * per element on the same scan `int_dot` already runs fused).
    */
  def intVector(v: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.IntVector(
        org.apache.spark.sql.GraftExpressionBridge.expression(v)))

  /** Exact integer dot product of two intVector columns — the native
    * [[graft.functions.IntDot]] expression (fused codegen loop; the
    * zip_with+aggregate HOF it replaced evaluated interpreted on the
    * hottest scan in the engine). Bit-identical: integer math has no
    * rounding and the same 64-bit wrap.
    */
  def intDot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.IntDot(
        org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b)))

  /** Brute-force top-k by integer dot product against the single query
    * vector in `query` (column `qv`, broadcast). Returns (id, dot).
    */
  def knnDot(emb: DataFrame, idCol: String, query: DataFrame, k: Int): DataFrame =
    emb.crossJoin(broadcast(query))
      .select(col(idCol), intDot(col("iv"), col("qv")).as("dot"))
      .orderBy(col("dot").desc, col(idCol).asc)
      .limit(k)

  /** IVF-style blocked top-k: scan only rows in the query's block
    * (nprobe=1). `emb` needs (idCol, blk, iv); `query` (qblk, qv).
    */
  def knnDotBlocked(emb: DataFrame, idCol: String, query: DataFrame, k: Int): DataFrame =
    emb.join(broadcast(query), col("blk") === col("qblk"))
      .select(col(idCol), intDot(col("iv"), col("qv")).as("dot"))
      .orderBy(col("dot").desc, col(idCol).asc)
      .limit(k)

  /** Exact top-k for EACH query in a small query set `(qid, qv)` —
    * the batch shape training pipelines need (score an incoming batch
    * against a reference corpus). Queries broadcast and score at scan
    * speed like [[knnDot]]; the per-query top-k then runs as a SALTED
    * two-phase rank, because a single `Window.partitionBy(qid)` would
    * funnel every scored row of a query through one reducer (|corpus|
    * rows per task — the skew wall at scale):
    * phase 1 ranks within (qid, salt) — each query's scored rows
    * spread over `nSalts` partitions, only k survive each — phase 2
    * ranks the ≤ k·nSalts survivors per query. Total shuffled rows
    * after phase 1 are k·nSalts·|queries|, independent of corpus
    * size. Returns (qid, idCol, dot, rank), rank 1..k by
    * (dot desc, id asc).
    */
  def knnDotMany(emb: DataFrame, idCol: String, queries: DataFrame, k: Int,
      nSalts: Int = 16): DataFrame =
    topKPerQuery(
      emb.crossJoin(broadcast(queries))
        .select(col("qid"), col(idCol), intDot(col("iv"), col("qv")).as("dot")),
      idCol, k, nSalts)

  /** Per-vector symmetric int8 scale: max |x_i| as a double. The
    * dequantization factor is `scale / 127`; keeping the raw max (not
    * the ratio) avoids one rounding step in the score rescale.
    */
  def q8Scale(v: Column): Column = {
    // max |x_i| WITHOUT the per-element HOF (r19): equal to
    // greatest(|max|, |min|) for every array — array_max/array_min
    // skip nulls like the transform did, empty/null arrays stay null,
    // and a NaN element dominates both forms identically (NaN orders
    // greatest). All codegen'd collection expressions; this runs over
    // the whole corpus at index-build time.
    val vd = v.cast("array<double>")
    greatest(abs(array_max(vd)), abs(array_min(vd)))
  }

  /** Symmetric int8 scalar quantization of a float-vector column:
    * q_i = floor(x_i / scale · 127) as TINYINT — 1 byte per
    * dimension in columnar storage, 4× smaller than float32 and 8×
    * smaller than the 1e7-scaled long form. This is the vector
    * COMPRESSION path at 100 TB: the quantized index is what the
    * scan reads; full precision is fetched only for the re-rank
    * candidates ([[knnQuantized]]). All arithmetic is double-divide /
    * double-multiply / floor — deterministic IEEE ops an oracle
    * engine reproduces bit-for-bit (round-half cases never arise
    * with floor). Zero vectors quantize to all-zero instead of NaN.
    * Quantization runs ONCE at index-build time, so the interpreted
    * HOF here never sits on the query path; scoring reuses the
    * codegen'd [[intDot]].
    *
    * `scale` must be [[q8Scale]] of the SAME row MATERIALIZED by a
    * prior projection (`.select(..., q8Scale(v).as("scale"))`, then
    * reference `col("scale")`) — not the q8Scale expression inline
    * (one scale per row, computed once).
    *
    * r19: the per-element map is the native fused-codegen
    * [[graft.functions.Q8Vector]] (the IntVector recipe) — the
    * `transform` lambda it replaces evaluated INTERPRETED per element
    * over the whole corpus at build time; Q8VectorExprSpec pins
    * bit-equality against that HOF.
    */
  def q8Vector(v: Column, scale: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.Q8Vector(
        org.apache.spark.sql.GraftExpressionBridge.expression(v),
        org.apache.spark.sql.GraftExpressionBridge.expression(
          scale.cast("double"))))

  /** Two-phase quantized KNN — the production ANN shape for a corpus
    * whose full-precision vectors don't fit the scan budget:
    * phase 1 scans the int8 index (`embQ8`: idCol, q8 TINYINT[],
    * scale) and takes the top `rerankK` by the rescaled quantized
    * dot (TakeOrderedAndProject — never a global sort); phase 2
    * fetches ONLY those candidates from the full-precision store
    * (`embFull`: idCol, iv — a broadcast semi-join, the "fetch" of a
    * two-tier index) and re-ranks exactly. `query` is one row with
    * (qq8 BIGINT[], qscale, qv) so both phases reuse one broadcast.
    * Returns (idCol, dot) — identical shape and, at rerankK ≥ corpus
    * size, identical content to [[knnDot]].
    *
    * The phase-1 rank key is dotq·scale·scale_q (the /127² constant
    * dropped — it never reorders); multiplication order is fixed so
    * candidate selection is bit-deterministic across engines.
    */
  def knnQuantized(embQ8: DataFrame, embFull: DataFrame, idCol: String,
      query: DataFrame, k: Int, rerankK: Int): DataFrame = {
    require(rerankK >= k, s"rerankK $rerankK < k $k")
    val q = broadcast(query)
    val cand = embQ8.crossJoin(q)
      .select(col(idCol),
        (intDot(col("q8").cast("array<bigint>"), col("qq8")).cast("double") *
          col("scale") * col("qscale")).as("qscore"))
      .orderBy(col("qscore").desc, col(idCol).asc)
      .limit(rerankK)
      .select(idCol)
    embFull.join(broadcast(cand), Seq(idCol), "left_semi")
      .crossJoin(q)
      .select(col(idCol), intDot(col("iv"), col("qv")).as("dot"))
      .orderBy(col("dot").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch [[knnQuantized]]: top-k per query for a query SET over the
    * int8 index — the compressed batch-serving shape. Phase 1 scores
    * the quantized scan against every query (one broadcast, one pass)
    * and keeps `rerankK` candidates per query via the salted
    * two-phase rank (no reducer ever holds a corpus-sized window);
    * phase 2 fetches ONLY the candidate (qid, id) pairs from the
    * full-precision store — the candidate set broadcasts, so the
    * fetch is scan-side — and re-ranks exactly. `queries` carries
    * (qid, qq8 BIGINT[], qscale, qv). Returns (qid, idCol, dot, rank)
    * like [[knnDotMany]], and equals it when rerankK ≥ corpus size.
    */
  def knnQuantizedMany(embQ8: DataFrame, embFull: DataFrame, idCol: String,
      queries: DataFrame, k: Int, rerankK: Int, nSalts: Int = 16): DataFrame = {
    require(rerankK >= k, s"rerankK $rerankK < k $k")
    val q = broadcast(queries)
    val cand = topKPerQuery(
      embQ8.crossJoin(q)
        .select(col("qid"), col(idCol),
          (intDot(col("q8").cast("array<bigint>"), col("qq8")).cast("double") *
            col("scale") * col("qscale")).as("dot")),
      idCol, rerankK, nSalts)
      .select(col("qid"), col(idCol))
    topKPerQuery(
      embFull.join(broadcast(cand), Seq(idCol))
        .join(q.select(col("qid"), col("qv")), Seq("qid"))
        .select(col("qid"), col(idCol), intDot(col("iv"), col("qv")).as("dot")),
      idCol, k, nSalts)
  }

  /** Deterministic, ENGINE-PORTABLE random hyperplanes for signed
    * random projection LSH: weight(p, i) = first 8 hex chars of
    * md5("pl_p_i") as an integer, centered (− 2³¹) — the same value
    * any engine with md5 computes, so a DuckDB oracle reproduces the
    * buckets bit-for-bit (the same trick as the min-wise hashing).
    * Rows are plane index 0..nPlanes−1; columns 1-based dimension
    * index (matching SQL list subscripts).
    */
  def lshPlanes(nPlanes: Int, dim: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes)(p => Array.tabulate(dim) { i0 =>
      val d = md.digest(s"pl_${p}_${i0 + 1}".getBytes("UTF-8"))
      val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      hi - 2147483648L
    })
  }

  /** Banded LSH keys for an intVector column: planes split into
    * `nBands` bands of r = nPlanes/nBands sign bits; key =
    * band · 2^r + bits. Two vectors are CANDIDATES if any band key
    * collides — the standard banding trade (more bands ⇒ higher
    * recall at lower per-band precision), same shape as the MinHash
    * bands. Integer dot products against integer plane weights —
    * exact sign, no float anywhere, so buckets are engine-portable.
    *
    * r19: the plane dots ride the native [[intDot]] (this sits on
    * d8's SCAN path — nPlanes interpreted zip_with folds per row was
    * the scan stage's dominant cost; the docstring here always said
    * to promote it the day that happened). intDot and the HOF fold
    * agree exactly on equal-length inputs, and every caller length-
    * guards its vectors against `dim` before banding (a mismatched
    * row raises loudly rather than banding wrong).
    */
  def lshBandKeys(iv: Column, planes: Array[Array[Long]], nBands: Int): Column = {
    require(planes.length % nBands == 0)
    val r = planes.length / nBands
    val keys = (0 until nBands).map { b =>
      val bits = (0 until r).map { j =>
        val w = array(planes(b * r + j).map(lit): _*)
        when(intDot(iv, w) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      (lit(b.toLong * (1L << r)) + bits).as(s"band$b")
    }
    array(keys: _*)
  }

  /** Salted two-phase per-query top-k over a scored frame
    * (qid, idCol, dot): rank within (qid, salt) — each query's rows
    * spread over nSalts partitions, k survive each — then rank the
    * ≤ k·nSalts survivors per query. The second shuffle moves
    * k·nSalts·|queries| rows, independent of corpus size.
    */
  private[search] def topKPerQuery(scored: DataFrame, idCol: String, k: Int,
      nSalts: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col("qid"), col("__salt"))
      .orderBy(col("dot").desc, col(idCol).asc)
    val survivors = scored
      .withColumn("__salt", pmod(hash(col(idCol)), lit(nSalts)))
      .withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= k).drop("__r", "__salt")
    val w2 = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col(idCol).asc)
    survivors
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
  }
}
