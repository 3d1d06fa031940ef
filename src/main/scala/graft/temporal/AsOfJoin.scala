package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark's built-ins
  * lack, composed per the SURVEY §2.4 preference order (a): union +
  * ordered window, no custom physical operator needed.
  *
  * For every left row, attach the right row with the greatest
  * `tsCol` ≤ the left row's `tsCol`, per `keyCol` (DuckDB/kdb ASOF
  * LEFT JOIN semantics).
  *
  * Plan shape: both sides are tagged and unioned, then ONE window
  * per key — a single shuffle on the key and a per-partition sort,
  * O((|L|+|R|) log) with no range-scan blowup; the naive formulation
  * (inequality join + max) is a quadratic theta-join Spark would
  * execute as BroadcastNestedLoop. Exact-timestamp matches count:
  * right rows sort before left rows on ties.
  */
object AsOfJoin {

  /** Range join without an equi-key, via time-bin blocking: rows
    * joinable iff |l.ts − r.ts| ≤ width. Naively that is an
    * inequality join Spark executes as a nested loop; binning ts
    * into width-sized buckets and exploding the left side into
    * {bin−1, bin, bin+1} turns it into an EQUI join on the bin,
    * with the exact range predicate as a post-filter. Candidate
    * blowup is 3×|L|, independent of |R| — linear, shuffle-keyed,
    * skew-safe under AQE.
    *
    * Inputs need a LONG `tsUsCol` (micros). Returns all (left, right)
    * column pairs within the window.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, tsUsCol: String,
      widthUs: Long): DataFrame = {
    // integer division (`div`), not `/`: double rounding near bin
    // boundaries would mis-bin edge rows
    val bin = expr(s"$tsUsCol div $widthUs")
    val lBinned = left
      .withColumn("__bin", explode(array(bin - 1, bin, bin + 1)))
    val rBinned = right.withColumn("__bin", bin)
    val rCols = right.columns.map(c => col(s"r.$c").as(s"r_$c"))
    lBinned.as("l").join(rBinned.as("r"), col("l.__bin") === col("r.__bin"))
      .filter(abs(col(s"l.$tsUsCol") - col(s"r.$tsUsCol")) <= widthUs)
      .select(left.columns.map(c => col(s"l.$c")).toIndexedSeq ++ rCols: _*)
  }

  /** Regular-grid resample + forward fill — the time-series
    * densification stage (irregular observations → one row per
    * (key, grid tick) carrying the most recent observation at-or-
    * before the tick, null before the first). The grid is
    * sequence+explode per key — never a driver loop — and the fill
    * IS [[asOf]]: one shuffle on the key, total. `tsCol` may be any
    * orderable type `sequence` supports (LONG micros, TIMESTAMP).
    */
  def resampleFfill(data: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String], gridStart: Column, gridEnd: Column,
      step: Column): DataFrame = {
    val grid = data.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(gridStart, gridEnd, step)).as(tsCol))
    asOf(grid, data.select((keyCol +: tsCol +: valueCols).map(col): _*),
      keyCol, tsCol, valueCols)
  }

  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightVals: Seq[String], suffix: String = "_asof"): DataFrame = {
    val lPayload = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    val rTypes = rightVals.map(c => c -> right.schema(c).dataType).toMap
    val lTypes = lPayload.map(c => c -> left.schema(c).dataType).toMap

    val lu = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side")) ++
        lPayload.map(col) ++
        rightVals.map(c => lit(null).cast(rTypes(c)).as(s"__r_$c")): _*)
    val ru = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side")) ++
        lPayload.map(c => lit(null).cast(lTypes(c)).as(c)) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)

    // duplicate right (key, ts) rows: order additionally by the value
    // columns so the pick is DETERMINISTIC (the greatest value tuple
    // wins) — without this, last() takes whichever tied row the
    // shuffle ordered last. Note an external oracle's ASOF may still
    // pick its own tied row; the operator's own answer is stable.
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol) +: col("__side") +:
        rightVals.map(c => col(s"__r_$c").asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lu.unionAll(ru)
      .select(
        Seq(col(keyCol), col(tsCol), col("__side")) ++
          lPayload.map(col) ++
          rightVals.map(c =>
            last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"$c$suffix")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
