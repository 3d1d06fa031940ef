package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Temporary measurement probe for optimization rounds 19/20.
  *
  * Modes:
  *   jobs <names> [sfDir]  — run each query warm, then re-run with a
  *     job/stage listener; print per-job wall time + per-stage task
  *     totals and shuffle bytes.
  *   plan <names> <suffix> [sfDir] — dump .explain("formatted") of each
  *     query to plans/r20/<name>_<suffix>.txt.
  *   time <names> [sfDir] [reps] — min-of-N isolated wall times.
  */
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.local(cpus)
    val qs = SparkEntry.queries

    def clean(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    mode match {
      case "plan" =>
        val suffix = args(2)
        val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
        names.foreach { n =>
          val df = qs(n)(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val w = new java.io.PrintWriter(s"plans/r20/${n}_$suffix.txt")
          try w.println(txt) finally w.close()
          println(s"[plan] wrote plans/r20/${n}_$suffix.txt")
          clean()
        }

      case "time" =>
        val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
        val reps = if (args.length > 3) args(3).toInt else 3
        // warmup at sf0.001 like Bench
        names.foreach { n =>
          try qs(n)(spark, "/root/testdata/sf0.001").count()
          catch { case e: Throwable => println(s"[warm] $n failed: $e") }
        }
        names.foreach { n =>
          val times = (1 to reps).map { _ =>
            clean()
            val t0 = System.nanoTime()
            qs(n)(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[time] $n min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
        }

      case "tok" =>
        // isolate tokenization cost on the documents scan: baseline
        // (length only) vs lower+regexp_extract_all vs the shingle tail
        val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
        import org.apache.spark.sql.functions._
        val docs = graft.core.Tables.documents(spark, sfDir)
          .repartition(spark.sparkContext.defaultParallelism)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        docs.count()
        def t(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
          val times = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            df.count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[tok] $label min=${times.min}%.3f all=${times.map(x => f"$x%.3f").mkString(",")}")
        }
        t("baseline length")(docs.select(sum(length(col("text")))))
        t("lower only")(docs.select(sum(length(lower(col("text"))))))
        t("tokens regex")(docs.select(sum(size(
          graft.text.TextFunctions.tokens(col("text"))))))
        t("tokens+shingle")(docs.select(col("doc_id"),
          graft.text.TextFunctions.tokens(col("text")).as("toks"))
          .select(col("doc_id"), explode(sequence(lit(1),
            greatest(size(col("toks")) - 2, lit(1)))).as("pos"), col("toks"))
          .select(col("doc_id"),
            array_join(slice(col("toks"), col("pos"), lit(3)), " ").as("sh"))
          .groupBy("doc_id", "sh").agg(count(lit(1)))
          .select(sum(lit(1))))

      case "vlplan" =>
        // pre-checkpoint plan of the var-length Cypher shapes (the
        // query defs localCheckpoint(true) eagerly, so `plan` mode only
        // shows the checkpoint readout): rebuild the same
        // prefixed-string-id hierarchy graph the g* defs use and dump
        // the matchPaths chain plan itself.
        val suffix = args(1)
        val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
        import org.apache.spark.sql.functions.{col, concat, lit}
        val rn = graft.core.Tables.nation(spark, sfDir).select(
          concat(lit("r_"), col("n_regionkey").cast("string")).as("src"),
          concat(lit("n_"), col("n_nationkey").cast("string")).as("dst"))
        val nc = graft.core.Tables.customer(spark, sfDir).select(
          concat(lit("n_"), col("c_nationkey").cast("string")).as("src"),
          concat(lit("c_"), col("c_custkey").cast("string")).as("dst"))
        val co = graft.core.Tables.orders(spark, sfDir).select(
          concat(lit("c_"), col("o_custkey").cast("string")).as("src"),
          concat(lit("o_"), col("o_orderkey").cast("string")).as("dst"))
        val e = rn.unionAll(nc).unionAll(co)
        val gnodes = e.select(col("src").as("id"))
          .unionAll(e.select(col("dst").as("id"))).distinct()
        val g = graft.graph.PropertyGraph(
          nodes = Map("node" -> gnodes),
          edges = Map("LINKS" -> (("node", "node", e))))
        for ((nm, cy) <- Seq(
          "g8_cypher_varlength" ->
            "MATCH (a:node {id: 'r_0'})-[:LINKS*1..3]->(b:node) RETURN count(*) AS n_paths",
          "g16_cypher_undirected_varlength" ->
            "MATCH (a:node {id: 'c_1'})-[:LINKS*1..4]-(b:node) RETURN count(*) AS n_paths")) {
          val df = graft.graph.CypherLite.query(g, cy)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val w = new java.io.PrintWriter(s"plans/r20/${nm}_$suffix.txt")
          try w.println(txt) finally w.close()
          println(s"[vlplan] wrote plans/r20/${nm}_$suffix.txt")
          clean()
        }

      case "vplan" =>
        // executed plan of the jaccard-verify subplan (normally hidden
        // behind the eager checkpoint inside jaccardPairs)
        val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
        val docs = graft.core.Tables.documents(spark, sfDir)
        val post = graft.dedup.Dedup.postings(docs, "doc_id", "text", 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        post.count()
        val v = graft.dedup.Dedup.jaccardVerifyPlan(post, 0.5, 64)
        v.count()
        println(v.queryExecution.executedPlan.toString.take(12000))

      case "jobs" =>
        val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
        names.foreach { n =>
          try qs(n)(spark, "/root/testdata/sf0.001").count()
          catch { case e: Throwable => println(s"[warm] $n failed: $e") }
          clean()
          val jobStart = mutable.Map[Int, (Long, String)]()
          val jobs = mutable.ArrayBuffer[(Int, Double, String)]()
          val stages = mutable.ArrayBuffer[(Int, Int, Long, Long, Long, String)]()
          val listener = new SparkListener {
            override def onJobStart(j: SparkListenerJobStart): Unit = {
              val desc = Option(j.properties)
                .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
              jobStart(j.jobId) = (System.nanoTime(), desc)
            }
            override def onJobEnd(j: SparkListenerJobEnd): Unit = {
              jobStart.get(j.jobId).foreach { case (t0, desc) =>
                jobs += ((j.jobId, (System.nanoTime() - t0) / 1e9, desc))
              }
            }
            override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
              val i = s.stageInfo
              val rdds = i.rddInfos.map(r =>
                r.scope.map(_.name).getOrElse(r.name)).distinct.mkString(">")
              stages += ((i.stageId, i.numTasks,
                i.taskMetrics.executorRunTime,
                i.taskMetrics.shuffleReadMetrics.totalBytesRead,
                i.taskMetrics.shuffleWriteMetrics.bytesWritten,
                i.name.take(40) + " | " + rdds.take(140)))
            }
          }
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          qs(n)(spark, sfDir).count()
          val total = (System.nanoTime() - t0) / 1e9
          Thread.sleep(500) // let listener drain
          spark.sparkContext.removeSparkListener(listener)
          println(f"=== $n total=$total%.3f s, ${jobs.size} jobs, ${stages.size} stages")
          jobs.sortBy(_._1).foreach { case (id, d, desc) =>
            println(f"  job $id%4d  ${d}%7.3f s  $desc")
          }
          println(s"  top stages by executorRunTime:")
          stages.sortBy(-_._3).take(15).foreach { case (id, nt, rt, sr, sw, nm) =>
            println(f"  stage $id%4d tasks=$nt%3d runMs=$rt%7d shufR=${sr / 1024}%8dK shufW=${sw / 1024}%8dK  $nm")
          }
        }
    }
    spark.stop()
  }
}
