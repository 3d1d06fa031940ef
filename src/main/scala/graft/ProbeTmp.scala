package graft

import graft.graph.{CypherLite, PropertyGraph}
import org.apache.spark.sql.functions._

object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("8")
    val g = ops.GraphOps.tpchGraph(spark, "/root/testdata/sf0.001")
    def show(s: String): Unit = {
      println(s"=== $s")
      try CypherLite.query(g, s).show(10, truncate = false)
      catch { case e: Throwable => println(s"REJECT: ${e.getMessage}") }
    }
    show("WITH [2,4,6] AS xs RETURN xs[0] + xs[-1] AS v")
    show("WITH [2,4,6] AS xs RETURN xs[0] AS a, xs[-1] AS b, xs[7] AS oob")
    show("WITH [2,4,6] AS xs UNWIND xs AS x RETURN sum(x) AS s, count(*) AS n")
    show("WITH [2,4,6] AS xs UNWIND xs AS x WITH x WHERE x % 2 = 0 RETURN collect(x) AS evens")
    show("WITH [1,2,3] AS xs, 10 AS k UNWIND xs AS x RETURN sum(x) + k AS t")
    show("WITH range(1, 5) AS xs RETURN size(xs) AS n, xs[1] AS second")
    show("WITH 'a' AS s RETURN s")
    show("WITH [2,4,6] AS xs RETURN head(xs) AS h, last(xs) AS l, size(xs) AS n")
    // pointed rejects
    show("WITH p.x AS y RETURN y")
    show("WITH 1 AS one MATCH (n:nation) RETURN count(*) AS c")
    show("UNWIND xs AS x RETURN x")
    // existing shapes must keep working
    show("UNWIND [1,2,3] AS x RETURN sum(x) AS s")
    show("UNWIND [1,2,3] AS x WITH collect(x) AS xs RETURN xs[0] AS h, size(xs) AS n")
    // UNWIND redeclaration reject + self-shadow allowed
    show("UNWIND [1,2,3] AS x WITH collect(x) AS xs, count(*) AS n UNWIND xs AS n RETURN n")
    show("UNWIND [1,2,3] AS x WITH collect(x) AS xs UNWIND xs AS xs RETURN sum(xs) AS s")
    spark.stop()
  }
}
