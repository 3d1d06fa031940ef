package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import org.apache.spark.storage.StorageLevel

import graft.text.TextFunctions

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design:
  *  - every signature (content key, minhash, simhash, int-vector) is a
  *    pure per-row expression — map-side only, no shuffle to compute;
  *  - pair generation never does an unblocked self-join: candidates
  *    come from shared shingles (Jaccard), shared LSH bands (MinHash),
  *    equal signatures (SimHash), or a blocking key (embeddings) — the
  *    joins shuffle on those keys and AQE handles skew;
  *  - hashes are md5 hex strings (min-wise over strings ≡ min-wise
  *    over the 128-bit values, since the hex is fixed-width), so the
  *    DuckDB oracle computes bit-identical signatures.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct normalized content,
    * representative = min id. `docs ⟶ (content_key, rep_id, n_docs)`.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.contentKey(col(textCol)).as("content_key"))
      .groupBy("content_key")
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_docs"))

  /** Distinct word k-gram shingles of a document. Docs shorter than k
    * tokens yield one partial shingle (slice clamps). The floor of 1
    * matters: Spark's sequence(1, 0) is DESCENDING [1,0], not empty.
    */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = TextFunctions.tokens(text)
    val idx = sequence(lit(1), greatest(size(toks) - (k - 1), lit(1)))
    array_distinct(transform(idx, i => array_join(slice(toks, i, lit(k)), " ")))
  }

  /** Two 32-bit min-wise hash inputs per shingle, from ONE md5 digest:
    * h1 = first 8 hex chars, h2 = next 8, both as longs. The k minhash
    * functions are Kirsch-Mitzenmacher combinations h1 + i·h2 — one
    * digest per shingle instead of k, and the combine/min runs inside
    * codegen (conv/substring are ordinary expressions, not HOFs).
    */
  private def hashHalves(shingle: Column): (Column, Column) = {
    val digest = md5(shingle.cast("binary"))
    (conv(substring(digest, 1, 8), 16, 10).cast(LongType),
      conv(substring(digest, 9, 8), 16, 10).cast(LongType))
  }

  /** Candidate pairs (a < b) sharing at least one LSH band, verified
    * with exact Jaccard over the shingle sets; `minJaccard` filters.
    * Signature = nBands·rowsPerBand min-wise hashes, banded
    * rowsPerBand at a time. Returns (id_a, id_b, jaccard).
    *
    * Plan shape matters at scale: the signature is computed by ONE
    * codegen'd hash aggregate over exploded (id, shingle) rows —
    * min(h1 + i·h2) per hash function — with map-side partial
    * aggregation, so the only md5 per shingle happens at scan speed
    * and the shuffle carries id + k longs. The band self-join is
    * SKINNY — (id, band) only — so the shuffle never moves shingle
    * arrays; pairs dedup BEFORE the arrays are joined back for
    * verification (measured 8× on the sf0.1 bench, and the gap grows
    * with document size).
    */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, nHashes: Int, nBands: Int, rowsPerBand: Int,
      minJaccard: Double): DataFrame = {
    require(nHashes == nBands * rowsPerBand)
    // Plan-shape decisions that dominate the wall clock:
    //  - repartition the docs: a small parquet arrives as ONE split,
    //    and shingling is an interpreted HOF eval (not codegen) —
    //    without the spread it runs single-threaded;
    //  - persist sh and banded: they feed a self-join plus the
    //    verification rejoin, and Spark recomputes the subtree up to
    //    6× otherwise (5:1 on the sf0.1 bench);
    //  - materialize eagerly (count) so the self-join's two branches
    //    hit a populated cache instead of racing to fill it.
    val sh = docs.repartition(col(idCol)).select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleK).as("shingles"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (h1, h2) = hashHalves(col("shingle"))
    val hashed = sh.select(col("id"), explode(col("shingles")).as("shingle"))
      .select(col("id"), h1.as("h1"), h2.as("h2"))
    val minExprs = (0 until nHashes)
      .map(i => min(col("h1") + lit(i.toLong) * col("h2")).as(s"m$i"))
    val sig = hashed.groupBy("id").agg(minExprs.head, minExprs.tail: _*)
    val bandExprs = (0 until nBands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => col(s"m${b * rowsPerBand + r}").cast("string"))
      concat_ws("-", lit(b.toString) +: parts: _*)
    }
    val banded = sig
      .select(col("id"), explode(array(bandExprs: _*)).as("band"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    banded.count()
    val cands = banded.as("x")
      .join(banded.as("y"), col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** All-pairs n-gram Jaccard via shared-shingle blocking: only pairs
    * that share ≥1 BLOCKING shingle are materialized, never a cross
    * product. Blocking shingles are those with document frequency ≤
    * `maxDf` — the stop-shingle cap that bounds the pair blowup from
    * hot shingles (a shingle in f docs spawns f·(f-1)/2 pairs; on a
    * repetitive corpus that is quadratic death). The Jaccard itself
    * is computed over the FULL common-shingle counts of the blocked
    * pairs, so only pairs whose entire overlap is hot shingles are
    * missed — at any useful threshold those are not near-dups.
    * Returns (id_a, id_b, jaccard).
    */
  def jaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, minJaccard: Double, maxDf: Int = 64): DataFrame = {
    // same plan-shape treatment as minhashLshPairs: spread the
    // single-split input, cache the reused frames, materialize before
    // the self-join (see the scaladoc note there).
    val sh = docs.repartition(col(idCol)).select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleK).as("shingles"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val post = sh.select(col("id"), explode(col("shingles")).as("shingle"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    post.count()
    val rare = post.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("shingle")
    val blocked = post.join(rare, "shingle")
    val candidates = blocked.as("x")
      .join(blocked.as("y"), col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Hex char → 0..15 (portable: same instr trick as the oracle SQL). */
  private def hexVal(c: Column): Column =
    instr(lit("0123456789abcdef"), c).cast(LongType) - 1

  /** `nBits`-bit SimHash over the token multiset: bit j is the sign of
    * Σ_tokens (±1) where +1 iff bit j of md5(token) is set. Computed
    * from the first nBits/4 hex chars of each token hash.
    */
  def simhash(text: Column, nBits: Int = 16): Column = {
    require(nBits % 4 == 0 && nBits <= 64)
    val hashes = transform(TextFunctions.tokens(text), t => md5(t.cast("binary")))
    val bits = (0 until nBits).map { j =>
      val hc = j / 4; val sub = 3 - (j % 4) // hex char index, bit within
      val ones = size(filter(hashes, h =>
        (hexVal(substring(h, hc + 1, 1)) / lit(1L << sub)).cast(LongType) % 2 === 1))
      // majority: ones*2 >= total  ⇒ bit set
      when(ones * 2 >= size(hashes), lit(1L << (nBits - 1 - j))).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Embedding near-dup with exact integer arithmetic: floats scaled
    * to 1e7 longs; cos(a,b) > τ  ⇔  dot>0 ∧ dot²·SCALE² > τ²·SCALE²·|a|²·|b|²
    * evaluated in DECIMAL(38,0) — no float rounding anywhere, so the
    * DuckDB oracle agrees exactly. Pairs are blocked on `blockCol`
    * (cluster/label id — the IVF-style scale path; at 100 TB the block
    * key comes from LSH or a coarse quantizer).
    * Returns (id_a, id_b).
    */
  def embeddingNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String, blockCol: String,
      tauNumSq: Long, tauDenSq: Long): DataFrame = {
    val iv = emb.repartition(col(idCol)).select(
      col(idCol).as("id"), col(blockCol).as("blk"),
      transform(col(vecCol), x => round(x * 1e7).cast(LongType)).as("iv"))
      .withColumn("nrm2",
        aggregate(col("iv"), lit(0L), (acc, v) => acc + v * v))
      .persist(StorageLevel.MEMORY_AND_DISK)
    iv.count()
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    iv.as("a").join(iv.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("dot",
        aggregate(zip_with(col("a.iv"), col("b.iv"), _ * _), lit(0L), _ + _))
      .filter(col("dot") > 0 &&
        dec(col("dot")) * dec(col("dot")) * tauDenSq >
          dec(lit(tauNumSq)) * dec(col("a.nrm2")) * dec(col("b.nrm2")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }
}
