package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust-statistics quality gates — the outlier stage of a
  * training-data pipeline where x7's quantile gate trims a fixed
  * tail: median/MAD flagging adapts to each group's own spread, so a
  * heavy-tailed source doesn't need a hand-tuned percentile.
  *
  * Exactness contract (the x7 discipline): the median is the value AT
  * an exact rank — the lower median, position ceil(n/2) by value
  * order — never an interpolated percentile, and the MAD is the same
  * exact rank over |v − med|. Every number the gate compares is a
  * value from the data or one subtraction/multiplication away from
  * one — algebraic IEEE ops an oracle engine reproduces bit-for-bit
  * (no transcendentals anywhere).
  */
object Robust {

  /** Per-group robust outlier flags: each row of `df` returns with
    * its group's lower median, MAD (median absolute deviation), and
    * `is_outlier` = |v − med| > k·MAD. Rows in groups with MAD = 0
    * (over half the values identical) flag only when v ≠ med — the
    * conventional degenerate-MAD reading. Output columns:
    * (key, id, v, med, mad, is_outlier).
    *
    * Plan shape — SKEW-SAFE rank selection (the x7 rank arithmetic):
    * the corpus first collapses to a (key, v, n) VALUE-FREQUENCY
    * table (one hash aggregate with map-side combine), and the exact
    * rank is read off running frequency sums, so the per-key ordered
    * windows scan DISTINCT VALUES, not rows — a hot group that is 90%
    * of the corpus but has bounded value cardinality no longer drags
    * its entire row set through one window partition twice. The
    * selected median/MAD tables are group-count-sized and join back
    * broadcast-sized. (For a hot group whose DISTINCT-value count is
    * itself corpus-sized the window is still per-key ordered — that
    * degenerate case needs a sketch, which the exactness contract
    * here deliberately rejects.)
    */
  def madOutliers(df: DataFrame, group: Column, id: Column, value: Column,
      k: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val base = df.select(group.as("key"), id.as("id"), value.as("v"))
    // value at exact rank ceil(n/2): the v whose cumulative frequency
    // range [cum-n+1, cum] covers the rank — ties collapse into one
    // frequency row, so no per-row tiebreak is needed
    def lowerMedianFreq(freq: DataFrame, out: String): DataFrame =
      freq
        .withColumn("__cum", sum("n").over(
          Window.partitionBy("key").orderBy(col("v").asc)))
        .withColumn("__m", ceil(
          sum("n").over(Window.partitionBy("key")) / lit(2.0)).cast("long"))
        .where(col("__cum") >= col("__m") &&
          col("__cum") - col("n") < col("__m"))
        .select(col("key"), col("v").as(out))
    // The med/mad tables are GROUP-COUNT-sized (the join-back is
    // broadcast-sized by design), but they sit in the final plan as
    // unshared subtrees: med appears under devFreq→mad AND in the
    // row join, freq under both median selections — so the lazy plan
    // scanned the corpus 4× and ran the value-frequency aggregate 3×
    // (measured r19, x11 at sf0.1). Materialize the tiny tables
    // eagerly instead: freq is persisted for its two consumers, med
    // and mad are localCheckpoint'd (two sub-second jobs), and the
    // returned frame joins the corpus against the checkpoints — ONE
    // base scan at consumption, same rows (opt guide §1.2, §5 —
    // cache only what is reused and compact).
    val freq = base.groupBy("key", "v").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = lowerMedianFreq(freq, "med").localCheckpoint(true)
    // deviation frequencies derive from the VALUE table, not the rows:
    // distinct |v − med| re-aggregated because two values can share a
    // deviation (v = med ± d)
    val devFreq = freq.join(med, "key")
      .select(col("key"), abs(col("v") - col("med")).as("v"), col("n"))
      .groupBy("key", "v").agg(sum("n").as("n"))
    val mad = lowerMedianFreq(devFreq, "mad").localCheckpoint(true)
    freq.unpersist(false)
    base.join(med, "key")
      .withColumn("__dev", abs(col("v") - col("med")))
      .join(mad, "key")
      .select(col("key"), col("id"), col("v"), col("med"), col("mad"),
        (col("__dev") > lit(k) * col("mad")).as("is_outlier"))
  }
}
