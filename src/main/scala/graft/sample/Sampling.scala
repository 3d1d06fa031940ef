package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines — the
  * subsample / mixture-weight / per-source-quota stage that sits
  * between dedup and tokenization in an LLM data pipeline (the
  * reference corpus is already curated; at 100 TB the curation step
  * IS the engine's job).
  *
  * Every sampler here is HASH-based, never `rand()`: the keep/drop
  * decision is a pure function of the row key and a seed string, so
  * (a) re-runs and retried tasks make identical decisions —
  * `rand()`-sampling inside a retried Spark task silently resamples,
  * (b) the sample is reproducible across engines (the DuckDB oracles
  * replay the same md5 arithmetic), and (c) downstream incremental
  * runs can re-derive membership without storing it. The decision
  * rides a 16-bit hex prefix of md5(key || seed) compared against a
  * 4-hex-digit threshold — rate resolution 1/65536, plan-side only,
  * fully codegen'd, no shuffle.
  */
object Sampling {

  /** 4-hex-digit bucket of a row key: uniform over 0x0000..0xffff,
    * portable (md5 of the SAME string bytes everywhere).
    *
    * HARD CONTRACT: `key` must be a string or integral column. The
    * cast-to-string rendering of those types is identical across
    * engines, so integer keys match `CAST(k AS VARCHAR)` oracles.
    * Float, decimal, and timestamp keys render DIFFERENTLY between
    * Spark and other engines (trailing zeros, exponent form, timezone
    * suffix) and would silently produce a divergent — but individually
    * plausible — sample; hash such keys yourself into a string/int
    * key column first.
    */
  def hashBucket(key: Column, seed: String = ""): Column =
    substring(md5(concat(key.cast("string"), lit(seed))), 1, 4)

  /** Threshold hex string for a rate: rows keep when
    * `hashBucket < threshold`. Rate 1.0 → "zzzz" sorts after every
    * hex digit, keeping all rows without a special case.
    */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    val t = math.floor(rate * 65536).toLong
    if (t >= 65536) "zzzz" else f"$t%04x"
  }

  /** Deterministic Bernoulli sample: keep each row with probability
    * `rate`, decided by the row's key hash. A pure filter — pushes to
    * the scan, no shuffle, safe under task retry.
    */
  def bernoulli(df: DataFrame, key: Column, rate: Double,
      seed: String = ""): DataFrame =
    df.filter(hashBucket(key, seed) < lit(rateThreshold(rate)))

  /** Mixture sampling: per-source keep rates (the LLM-pipeline
    * "dataset mixture weights" stage — e.g. keep 80% of books, 10%
    * of common-crawl). Sources missing from `rates` are dropped —
    * an explicit mixture is a whitelist. Still one codegen'd filter.
    */
  def mixture(df: DataFrame, key: Column, source: Column,
      rates: Map[String, Double], seed: String = ""): DataFrame = {
    require(rates.nonEmpty, "empty mixture")
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit("0000")) {
      case (acc, (s, r)) => when(source === s, lit(rateThreshold(r))).otherwise(acc)
    }
    df.filter(hashBucket(key, seed) < thr)
  }

  /** Weighted sampling WITHOUT replacement: `min(n, |group|)` rows
    * per group with inclusion probability ∝ `weight` — the
    * Efraimidis–Spirakis A-Res scheme under the same hash-determinism
    * contract as every sampler here. The exponential jitter is
    * `-ln(u) / w` with u drawn from 52 EXACT bits of
    * md5(key || seed) mapped into (0, 1) (numerator in [1, 2^52]
    * over divisor 2^52+1, so ln never sees 0 or 1), and
    * the per-group top-n takes the SMALLEST jitter — re-runs and task
    * retries draw the same sample. Cross-ENGINE the u's are exact but
    * ln is not correctly-rounded, so two jitters within ~1 ulp on
    * opposite sides of the rank-n boundary could select differently
    * (probability ~2⁻⁴⁰ per boundary with 52-bit u's — the x10 oracle
    * accepts this residual, unlike the fully-integer samplers above). This is the
    * data-mixing primitive `mixture` rates cannot express: quality- or
    * length-weighted subsampling where every row keeps mass
    * proportional to its score. Rows with null or non-positive weight
    * are DROPPED (they carry no inclusion mass — a loud filter, not a
    * silent jitter of ±Inf). One shuffle on the group columns; the
    * md5-collision tiebreak is (key asc), keeping the choice total.
    * `key` obeys [[hashBucket]]'s string/integral contract.
    */
  def weighted(df: DataFrame, groups: Seq[Column], key: Column,
      weight: Column, n: Int, seed: String = ""): DataFrame = {
    require(n > 0, "quota must be positive")
    // 13 hex chars = 52 bits: the widest md5 prefix a double holds
    // exactly; +1 shifts into [1, 2^52] so u > 0
    val u = (conv(substring(md5(concat(key.cast("string"), lit(seed))), 1, 13),
      16, 10).cast("long") + 1).cast("double") / lit(4503599627370497.0)
    val jitter = -log(u) / weight
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groups: _*)
      .orderBy(jitter.asc, key.asc)
    df.filter(weight > 0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Stratified quota sample: exactly `min(n, |group|)` rows per
    * group, chosen by hash order (deterministic, uniform within the
    * group). One shuffle on the group columns; the per-group sort is
    * the window's — at 100 TB this is the standard "n docs per
    * domain" cap. Ties (astronomically unlikely md5 collisions)
    * break on the key itself, keeping the choice total.
    */
  def stratified(df: DataFrame, groups: Seq[Column], key: Column, n: Int,
      seed: String = ""): DataFrame = {
    require(n > 0, "quota must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groups: _*)
      .orderBy(hashBucket(key, seed).asc, key.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic N-way labeled split — the train/val/test
    * assignment every corpus needs exactly once, as a pure
    * expression: each row's split is a function of md5(key || seed)
    * against the cumulative-fraction thresholds, so membership is
    * retry-stable, engine-replayable, and re-derivable downstream
    * without storing it (the same contract as [[bernoulli]]; d10's
    * inline 2-way split is this with one fraction). `splits` are
    * (label, fraction) pairs summing to ≤ 1; rows hashing past the
    * last threshold get `otherLabel` (pass fractions summing to 1
    * and it is unreachable except for rate-resolution rounding —
    * fractions quantize to 1/65536 like every threshold here).
    * Adds `splitCol` to the frame; no shuffle, pushes to the scan.
    */
  def split(df: DataFrame, key: Column, splits: Seq[(String, Double)],
      seed: String = "", splitCol: String = "split",
      otherLabel: String = "rest"): DataFrame = {
    require(splits.nonEmpty, "empty split spec")
    require(splits.map(_._1).distinct.size == splits.size, "duplicate split labels")
    val fracs = splits.map(_._2)
    require(fracs.forall(f => f >= 0 && f <= 1) && fracs.sum <= 1 + 1e-9,
      s"fractions must be in [0,1] and sum to <= 1: $fracs")
    val b = hashBucket(key, seed)
    val cums = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr = splits.zip(cums).foldRight(lit(otherLabel): Column) {
      case (((label, _), cum), orElse) =>
        when(b < rateThreshold(math.min(cum, 1.0)), lit(label)).otherwise(orElse)
    }
    df.withColumn(splitCol, expr)
  }

  /** TOKEN-budgeted per-source sample: rows in deterministic
    * md5(key || seed) order until each source's running token total
    * reaches `budget` — the "N tokens per source" training-mixture
    * primitive ([[stratified]] caps ROWS; a token target is what a
    * data mix actually specifies). A row is kept iff the running
    * total INCLUDING it is ≤ budget, so the kept set is a prefix of
    * the hash order — deterministic, engine-replayable, and stable
    * under re-runs like every sampler here. Returns (source, id,
    * n_tokens, cum_tokens).
    *
    * SKEW-SAFE exact prefix sum (a naive per-source running sum drags
    * a whole source through ONE ordered window partition — the
    * straggler a 100-TB mixture cannot afford): phase 1 aggregates
    * token sums per (source, 4-hex hash-prefix bucket) — ≤65536 rows
    * per source — and a bucket-level running sum (tiny window)
    * yields each bucket's BEFORE total; phase 2 adds the exact
    * within-bucket running sum, whose window partition is one
    * bucket's occupancy (corpus/65536 expected), never a whole
    * source. Because the bucket is a PREFIX of the hash, (bucket,
    * hash, key) order ≡ (hash, key) order, so the two-phase sum
    * equals the flat definition exactly — the x12 oracle states the
    * flat definition and hash-checks the equivalence.
    */
  def tokenBudget(df: DataFrame, source: Column, key: Column, tokens: Column,
      budget: Long, seed: String = ""): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val w = org.apache.spark.sql.expressions.Window
    val base = df.select(source.as("source"), key.as("id"), tokens.as("n_tokens"))
      .withColumn("__h", md5(concat(col("id").cast("string"), lit(seed))))
      .withColumn("__b", substring(col("__h"), 1, 4))
    val buckets = base.groupBy("source", "__b").agg(sum("n_tokens").as("__bt"))
      .withColumn("__before",
        sum("__bt").over(w.partitionBy("source").orderBy(col("__b").asc))
          - col("__bt"))
      .select(col("source"), col("__b"), col("__before"))
    base.join(buckets, Seq("source", "__b"))
      .withColumn("__cum", col("__before") + sum("n_tokens").over(
        w.partitionBy("source", "__b").orderBy(col("__h").asc, col("id").asc)))
      .filter(col("__cum") <= budget)
      .select(col("source"), col("id"), col("n_tokens"),
        col("__cum").as("cum_tokens"))
  }
}
