package graft.tools

import org.apache.spark.sql.functions._

/** Bench-harness data scaler: derives an N× replica of a driver
  * testdata directory by unioning N key-disjoint copies of every
  * table, so scaling ratios (sf0.1 → sf1) can be MEASURED instead of
  * argued from plan shapes. Strictly a measurement tool — correctness
  * runs stay on the driver's own parquet (TESTDATA.md).
  *
  * Copy i offsets every key/foreign-key column by i·10⁸, which keeps
  * referential structure intact per copy and disjoint across copies:
  * joins fan out 10×, groups multiply 10×, the TPC-H-ish graph
  * becomes 10 disjoint copies (components ×10, same diameter — the
  * scaling shape a partitioned cluster sees). Document text gets a
  * per-copy suffix token so text operators never run on degenerate
  * exact duplicates.
  *
  * Usage: `runMain graft.tools.ScaleGen [srcDir] [outDir] [rep]`,
  * defaults `/root/testdata/sf0.1 → target/scaledata/sf1 ×10`.
  */
object ScaleGen {

  /** Integer id columns per table — primary keys and the foreign
    * keys that reference them, offset together so each copy's join
    * graph is closed under the offset.
    */
  val keyCols: Map[String, Set[String]] = Map(
    "region" -> Set("r_regionkey"),
    "nation" -> Set("n_nationkey", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_nationkey"),
    "supplier" -> Set("s_suppkey", "s_nationkey"),
    "part" -> Set("p_partkey"),
    "orders" -> Set("o_orderkey", "o_custkey"),
    "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Set("event_id", "user_id"),
    "documents" -> Set("doc_id"),
    "embeddings" -> Set("vec_id"))

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/scaledata/sf1")
    val rep = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.local(cpus)
    for ((table, keys) <- keyCols.toSeq.sortBy(_._1)) {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val copies = (0 until rep).map { i =>
        val off = i.toLong * 100000000L
        df.select(df.columns.toIndexedSeq.map { c =>
          if (keys.contains(c)) (col(c) + lit(off)).as(c)
          else if (table == "documents" && c == "text" && i > 0)
            concat(col(c), lit(s" copytoken$i")).as(c)
          else col(c)
        }: _*)
      }
      copies.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scalegen] $table x$rep -> $out/$table.parquet")
    }
    spark.stop()
  }
}
