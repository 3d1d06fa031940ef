package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.rag.Rag
import graft.search.HashEmbedder

/** Batch-RAG scale probe (BENCH_NOTES evidence, round 11): runs the
  * FULL `Rag.answerMany` path — prune → keywords → fused BM25+KNN+RRF
  * retrieval → per-question Text2Cypher graph retrieval → synthesis —
  * against a PREBUILT (saved-then-loaded) [[Rag.CorpusIndex]] at the
  * given sf dir, for two batch sizes, and prints one JSON line with
  * wall-clock, Spark job counts, and total scan bytes per batch.
  *
  * What it evidences: the "nothing corpus-sized recomputes per
  * question" claim. The corpus-sized inputs (postings, vectors,
  * doc-lengths) are scanned a CONSTANT number of times per batch —
  * growing the batch 10× may grow jobs (per-question dimension-sized
  * graph retrievals) but must NOT grow scan bytes ~10×: the byte
  * delta per added question is the dimension-table graph path, not
  * the corpus.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt -batch
  * 'runMain graft.tools.RagBench target/scaledata/sf1 10 100'`
  */
object RagBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val ns = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.local(cpus)

    val jobs = new AtomicInteger(0)
    val bytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(s.stageInfo.taskMetrics.inputMetrics.bytesRead)
    })

    // ingest-time pass, timed separately: build the index from the
    // documents table and make it durable; the query path below loads
    // it back — nothing corpus-sized recomputes at answer time
    val docs = graft.core.Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_ragbench").toString
    val t0 = System.nanoTime()
    Rag.CorpusIndex.save(
      Rag.CorpusIndex.build(spark, docs, HashEmbedder()), dir)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val index = Rag.CorpusIndex.load(spark, dir)
    val graph = graft.ops.GraphOps.tpchGraph(spark, sfDir)

    // the graph path goes through the TEXTUAL Text2Cypher route —
    // CypherLite compiles a per-question template over the pruned
    // schema's graph, the reference's serving shape (rag.py:48-76)
    val regions = Seq("EUROPE", "ASIA", "AFRICA", "AMERICA", "MIDDLE EAST")
    val retriever = Rag.cypherRetriever { kws =>
      val r = kws.map(_.toUpperCase).find(k => regions.exists(k.startsWith))
        .getOrElse("EUROPE")
      s"""MATCH (r:region)-[:HAS_NATION]->(n:nation)
         |MATCH (n:nation)-[:HAS_CUSTOMER]->(c:customer)
         |WHERE r.r_name = '$r'
         |RETURN n.n_name AS n_name, count(*) AS n
         |ORDER BY n DESC, n_name LIMIT 5""".stripMargin
    }
    def questions(n: Int): Seq[String] = (0 until n).map { i =>
      val r = regions(i % regions.length).toLowerCase
      s"How many customers per nation are in region $r cohort$i?"
    }

    // the BATCHED graph arm: same rows as the per-question template —
    // one plan for all questions, the (qid, region) bindings broadcast
    // against the dimension tables, per-qid rank window. Two collects
    // per batch total (corpus + graph) regardless of N.
    val batchRetriever =
      (g: graft.graph.PropertyGraph, qkws: Seq[(Int, Seq[String])]) => {
        import spark.implicits._
        val qr = qkws.map { case (i, ks) =>
          (i, ks.map(_.toUpperCase).find(k => regions.exists(k.startsWith))
            .getOrElse("EUROPE"))
        }.toDF("qid", "r_name")
        g.nodes("region").join(broadcast(qr), "r_name")
          .select(col("qid"), col("id").as("rid"))
          .join(g.nodes("nation"), col("n_regionkey") === col("rid"))
          .select(col("qid"), col("n_nationkey"), col("n_name"))
          .join(g.nodes("customer"), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("qid"), col("n_name")).agg(count(lit(1)).as("n"))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("qid")
              .orderBy(col("n").desc, col("n_name"))))
          .select(col("qid"), col("rank"), col("n_name"), col("n"))
      }

    // warmup: small batch at the same sf so codegen/footers are hot
    // before the timed runs
    Rag.answerMany(spark, questions(2), graph, index, HashEmbedder(), retriever)
    Rag.answerManyGraphBatched(spark, questions(2), graph, index,
      HashEmbedder(), batchRetriever, graphRowsPerQuestion = 5)

    val runs = ns.flatMap { n =>
      jobs.set(0); bytes.set(0L)
      spark.sharedState.cacheManager.clearCache()
      val s0 = System.nanoTime()
      val res = Rag.answerMany(spark, questions(n), graph, index,
        HashEmbedder(), retriever)
      val sec = (System.nanoTime() - s0) / 1e9
      require(res.length == n && res.forall(_.synthesized.nonEmpty))
      val perQ = s""""n$n":{"sec":$sec,"jobs":${jobs.get},"scanKB":${bytes.get / 1024}}"""

      jobs.set(0); bytes.set(0L)
      spark.sharedState.cacheManager.clearCache()
      val b0 = System.nanoTime()
      val bres = Rag.answerManyGraphBatched(spark, questions(n), graph, index,
        HashEmbedder(), batchRetriever, graphRowsPerQuestion = 5)
      val bsec = (System.nanoTime() - b0) / 1e9
      require(bres.length == n && bres.forall(_.synthesized.nonEmpty))
      Seq(perQ,
        s""""n${n}_batched":{"sec":$bsec,"jobs":${jobs.get},"scanKB":${bytes.get / 1024}}""")
    }
    println(s"""{"metric":"rag_batch","sf":"$sfDir","buildSec":$buildSec,${runs.mkString(",")}}""")
    spark.stop()
  }
}
