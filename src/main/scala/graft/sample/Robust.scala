package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust-statistics quality gates — the outlier stage of a
  * training-data pipeline where x7's quantile gate trims a fixed
  * tail: median/MAD flagging adapts to each group's own spread, so a
  * heavy-tailed source doesn't need a hand-tuned percentile.
  *
  * Exactness contract (the x7 discipline): the median is the value AT
  * an exact rank — the lower median, position ceil(n/2) by (value,
  * tie) order — never an interpolated percentile, and the MAD is the
  * same exact rank over |v − med|. Every number the gate compares is
  * a value from the data or one subtraction/multiplication away from
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
    * Plan shape: two window passes (each one distribution on the
    * group key) derive the group-count-sized median and MAD tables;
    * both join back broadcast-sized. `tie` must make (v, tie) a
    * total order within the group (pass the row id).
    */
  def madOutliers(df: DataFrame, group: Column, id: Column, value: Column,
      k: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val base = df.select(group.as("key"), id.as("id"), value.as("v"))
    val wAll = Window.partitionBy("key")
    def lowerMedian(in: DataFrame, v: String, out: String): DataFrame =
      in.withColumn("__rn", row_number().over(
          Window.partitionBy("key").orderBy(col(v).asc, col("id").asc)))
        .withColumn("__n", count(lit(1)).over(wAll))
        .where(col("__rn") === ceil(col("__n") / lit(2.0)).cast("long"))
        .select(col("key"), col(v).as(out))
    val med = lowerMedian(base, "v", "med")
    val withMed = base.join(med, "key")
      .withColumn("__dev", abs(col("v") - col("med")))
    val mad = lowerMedian(withMed.select(col("key"), col("id"),
      col("__dev").as("v")), "v", "mad")
    withMed.join(mad, "key")
      .select(col("key"), col("id"), col("v"), col("med"), col("mad"),
        (col("__dev") > lit(k) * col("mad")).as("is_outlier"))
  }
}
