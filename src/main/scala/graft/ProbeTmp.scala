package graft

object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("8")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("g155_cypher_int_div_where", "g156_cypher_orderby_degree",
        "g158_cypher_chained_cmp", "g159_cypher_avg_count_subq",
        "g160_cypher_label_explore", "g157_cypher_dayofweek")) {
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      def count(pat: String) = pat.r.findAllIn(plan).length
      println(s"== $name: exchanges=${count("Exchange")} " +
        s"sortMerge=${count("SortMergeJoin")} bhj=${count("BroadcastHashJoin")} " +
        s"bnlj=${count("BroadcastNestedLoop")} cartesian=${count("CartesianProduct")} " +
        s"scans=${count("Scan parquet")} wsc=${count("WholeStageCodegen")}")
      if (sys.env.contains("PLAN_FULL")) println(plan.take(4000))
    }
    spark.stop()
  }
}
