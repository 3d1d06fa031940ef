package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

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

  /** MinHash signature: for each seed, the minimum md5(seed||shingle)
    * hex string over the document's shingles (k independent min-wise
    * hashes). Null-safe: empty shingle set ⇒ md5(seed) sentinel.
    */
  def minhash(shingles: Column, seeds: Seq[String]): Column =
    array(seeds.map { seed =>
      coalesce(
        array_min(transform(shingles, sh => md5(concat(lit(seed), sh).cast("binary")))),
        md5(lit(seed).cast("binary")))
    }: _*)

  /** LSH band keys: the signature split into `nBands` contiguous bands
    * of `rowsPerBand`, each hashed to one key. Docs sharing ANY band
    * key become candidate pairs.
    */
  def lshBands(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    array((0 until nBands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => element_at(sig, b * rowsPerBand + r + 1))
      concat_ws("", lit(s"$b:") +: parts: _*)
    }: _*)

  /** Candidate pairs (a < b) sharing at least one LSH band, verified
    * with exact Jaccard over the shingle sets; `minJaccard` filters.
    * Returns (id_a, id_b, jaccard).
    */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, seeds: Seq[String], nBands: Int, rowsPerBand: Int,
      minJaccard: Double): DataFrame = {
    require(seeds.length == nBands * rowsPerBand)
    val sh = docs.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleK).as("shingles"))
    val banded = sh
      .select(col("id"), col("shingles"),
        explode(lshBands(minhash(col("shingles"), seeds), nBands, rowsPerBand)).as("band"))
    val cands = banded.as("x")
      .join(banded.as("y"), col("x.band") === col("y.band") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.shingles").as("sh_a"), col("y.shingles").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** All-pairs n-gram Jaccard via shared-shingle blocking: only pairs
    * that share ≥1 shingle are materialized (common-shingle join),
    * never a full cross product. Returns (id_a, id_b, jaccard).
    */
  def jaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, minJaccard: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleK).as("shingles"))
    val post = sh.select(col("id"), size(col("shingles")).as("n"),
      explode(col("shingles")).as("shingle"))
    val common = post.as("x")
      .join(post.as("y"), col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
      .agg(count(lit(1)).as("common"))
    common
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")).cast("double")).as("jaccard"))
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
    val iv = emb.select(
      col(idCol).as("id"), col(blockCol).as("blk"),
      transform(col(vecCol), x => round(x * 1e7).cast(LongType)).as("iv"))
      .withColumn("nrm2",
        aggregate(col("iv"), lit(0L), (acc, v) => acc + v * v))
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

  /** Deterministic seed strings for minhash permutations. */
  def seeds(n: Int): Seq[String] = (0 until n).map(i => s"seed$i:")
}
