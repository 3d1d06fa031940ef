package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives. A hot grouping key concentrates its
  * rows in one shuffle partition; salting splits each key into
  * `nSalts` sub-keys for the partial aggregate and removes the salt
  * in a second, much smaller aggregate. Decomposable aggregates only
  * (sum/count/min/max — the partial-merge algebra must hold).
  */
object Skew {

  /** Two-phase salted sum/count per key. Phase 1 shuffles on
    * (key, salt) — the hot key spreads over nSalts partitions —
    * phase 2 merges the nSalts partials per key. The salt derives
    * from `saltFrom` (any well-distributed row column, e.g. a row
    * id), keeping the plan fully deterministic.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFrom: String, nSalts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(saltFrom)), lit(nSalts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pn"))
      .groupBy(col(key))
      .agg(sum("__psum").as("sum_v"), sum("__pn").as("n"))

  /** Salted equi-join: result ≡ `big.join(dim, key)`, but the
    * shuffle key on the big side is (key, salt), so a hot join key
    * spreads over `nSalts` partitions instead of starving one
    * reducer. The dim side replicates once per salt (explode of a
    * literal range — dim-sized × nSalts, the standard trade). When
    * the dim side fits a broadcast, Spark's broadcast join already
    * avoids the skew; this is the path for when it does NOT —
    * mid-sized dims against skewed facts, the case AQE's skew-join
    * also targets (this form is deterministic and engine-portable,
    * and works under any join strategy).
    *
    * `saltFrom` must be high-cardinality and uncorrelated with `key`
    * (a row id, an event timestamp — NOT the key itself or a column
    * functionally dependent on it): every hot-key row must hash to a
    * DIFFERENT salt or the skew remains while the dim side still pays
    * the nSalts replication. saltFrom == key is rejected outright;
    * low-cardinality salt sources degrade silently and are on the
    * caller.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      saltFrom: String, nSalts: Int): DataFrame = {
    // nSalts = 0 would yield pmod NULL vs an exploded [0, -1] range —
    // a silently EMPTY join, not an error
    require(nSalts >= 1, s"nSalts must be positive, got $nSalts")
    require(saltFrom != key,
      s"saltFrom must differ from the join key '$key': salting by the " +
        "key maps each hot key to ONE salt — no spread, full replication cost")
    val b = big.withColumn("__salt", pmod(hash(col(saltFrom)), lit(nSalts)))
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    b.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
