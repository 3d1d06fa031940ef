package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-CDC primitives: the delta between two keyed snapshot
  * versions and its application back onto a base snapshot — the pair
  * that closes the warehouse CDC loop (snapshot → diff → ship the
  * delta → apply → next snapshot), feeding [[Sessions.scd2]] for
  * validity-interval history. The reference keeps no history at all
  * (each notebook run rebuilds its stores from scratch); this is the
  * incremental path a 100-TB corpus needs — ship key-count-sized
  * deltas, never re-snapshot.
  */
object Cdc {

  /** CDC delta between two keyed snapshots `a` (old) and `b` (new),
    * both carrying (`key`, `value`): one row per differing key with
    * `change` ∈ added | removed | changed and the old/new values
    * (`<value>_old` / `<value>_new`, null on the missing side).
    * Unchanged keys drop. One full-outer shuffle on the key; the
    * classification is a codegen'd CASE. At scale both sides are
    * snapshot tables bucketed by key, so the join co-locates.
    */
  def tableDiff(a: DataFrame, b: DataFrame, key: String, value: String): DataFrame = {
    // presence markers, NOT value nullness, drive the classification:
    // a key legitimately carrying a null value would otherwise
    // misclassify as added/removed and break the applyDelta closure
    // (CdcSpec pins the null-value round trip); the value comparison
    // is null-safe for the same reason
    val va = a.select(col(key), col(value).as("__old"), lit(true).as("__ina"))
    val vb = b.select(col(key), col(value).as("__new"), lit(true).as("__inb"))
    va.join(vb, Seq(key), "full_outer")
      .withColumn("change",
        when(col("__ina").isNull, "added")
          .when(col("__inb").isNull, "removed")
          .when(!(col("__old") <=> col("__new")), "changed"))
      .where(col("change").isNotNull)
      .select(col(key), col("__old").as(s"${value}_old"),
        col("__new").as(s"${value}_new"), col("change"))
  }

  /** Apply a [[tableDiff]] delta onto the base snapshot it was
    * diffed FROM: upsert added/changed keys with the delta's new
    * value, drop removed keys, pass everything else through —
    * `applyDelta(a, tableDiff(a, b)) ≡ b` exactly (CdcSpec pins the
    * closure; the x9 oracle rides the applied side against a
    * direct-SQL next snapshot, so a broken apply hash-mismatches).
    * One anti join on the delta (delta-key-sized — AQE broadcasts it
    * when it fits, the usual case) + one union — no full-snapshot
    * shuffle beyond the key join.
    */
  def applyDelta(base: DataFrame, delta: DataFrame, key: String,
      value: String): DataFrame = {
    val touched = delta.select(col(key))
    val upserts = delta
      .filter(col("change").isin("added", "changed"))
      .select(col(key), col(s"${value}_new").as(value))
    base.select(col(key), col(value))
      .join(touched, Seq(key), "left_anti")
      .unionByName(upserts)
  }
}
