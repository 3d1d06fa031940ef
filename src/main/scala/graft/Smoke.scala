package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: replicates the driver's t1 check (entry rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("4")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n (expect > 0)")
    spark.stop()
  }
}
