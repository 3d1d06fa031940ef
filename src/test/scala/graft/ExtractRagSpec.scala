package graft

import org.apache.spark.sql.functions._

import graft.extract.Extraction
import graft.search.{Embedding, HashEmbedder}
import graft.rag.Rag

class ExtractSpec extends SparkSpec {

  private lazy val accuracy: Map[String, Double] = {
    val notes = Extraction.loadNotes(spark, "/root/reference/data/note.json")
    val extracted = Extraction.run(notes, Extraction.RuleBasedExtractor).toDF()
    val gold = graft.fhir.FhirPipeline.load(spark, "/root/reference/data/extracted_fhir.json")
      .select(col("record_id"), col("name.prefix").as("g_prefix"), col("gender"),
        col("birthDate"), col("phone"), col("email"), col("maritalStatus"),
        col("primaryLanguage"))
    Extraction.fieldAccuracy(extracted, gold, Seq(
      "prefix" -> "g_prefix", "gender" -> "gender", "birthDate" -> "birthDate",
      "phone" -> "phone", "email" -> "email", "maritalStatus" -> "maritalStatus",
      "primaryLanguage" -> "primaryLanguage"))
      .collect().map(r => r.getAs[String]("field") -> r.getAs[Double]("accuracy")).toMap
  }

  test("rule-based extractor runs over the full 2726-note corpus") {
    val notes = Extraction.loadNotes(spark, "/root/reference/data/note.json")
    assert(Extraction.run(notes, Extraction.RuleBasedExtractor).count() === 2726)
  }

  test("regex-baseline field accuracy vs LLM gold stays above measured floors") {
    // measured on 2026-08-12: phone .992, language .950, prefix .909,
    // email .884, gender .869, marital .840, birthDate .653 — floors
    // pinned just below so regressions in the extractor fail loudly.
    val floors = Map(
      "phone" -> 0.98, "primaryLanguage" -> 0.94, "prefix" -> 0.89,
      "email" -> 0.87, "gender" -> 0.85, "maritalStatus" -> 0.82,
      "birthDate" -> 0.64)
    for ((f, floor) <- floors)
      assert(accuracy(f) >= floor, s"$f accuracy ${accuracy(f)} < $floor")
  }

  test("extraction is deterministic across runs") {
    val notes = Extraction.loadNotes(spark, "/root/reference/data/note.json").limit(200)
    val a = Extraction.run(notes, Extraction.RuleBasedExtractor).collect().sortBy(_.record_id)
    val b = Extraction.run(notes, Extraction.RuleBasedExtractor).collect().sortBy(_.record_id)
    assert(a.toSeq === b.toSeq)
  }
}

class EmbedderSpec extends SparkSpec {

  test("hash embedder: deterministic, unit-norm, dimension-stable") {
    val e = HashEmbedder(dim = 64, seed = 42)
    val v1 = e.embed("spark join window table")
    val v2 = e.embed("spark join window table")
    assert(v1.toSeq === v2.toSeq)
    assert(v1.length === 64)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(e.embed("").forall(_ === 0.0f), "empty text embeds to zero vector")
  }

  test("similar texts embed closer than dissimilar ones") {
    val e = HashEmbedder()
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val base = e.embed("the patient received a seasonal influenza vaccine")
    val near = e.embed("the patient received an influenza vaccine yesterday")
    val far = e.embed("quarterly revenue grew across all market segments")
    assert(cos(base, near) > cos(base, far))
  }

  test("batched embedding runs partition-parallel with stable results") {
    import TestSession.spark.implicits._
    val rows = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].repartition(4)
    val out = Embedding.embed(spark, rows, HashEmbedder()).collect()
    assert(out.length === 500)
    assert(out.forall(_.vector.length === 64))
  }
}

class RagSpec extends SparkSpec {

  test("hybrid RAG pipeline answers end-to-end with deterministic stubs") {
    val g = graft.ops.GraphOps.tpchGraph(spark, sf)
    val docs = graft.core.Tables.documents(spark, sf)
    // template graph retriever: customers per segment in mentioned region
    val retriever = (graph: graft.graph.PropertyGraph, kws: Seq[String]) => {
      val region = kws.map(_.toUpperCase).find(k =>
        Seq("EUROPE", "ASIA", "AFRICA", "AMERICA").exists(k.startsWith))
        .getOrElse("EUROPE")
      graph.matchPath("region", col("r_name") === region,
          Seq("HAS_NATION", "HAS_CUSTOMER"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("c_mktsegment"))
    }
    // index built ONCE (the ingest-time pass); both questions reuse it
    val index = Rag.CorpusIndex.build(spark, docs, HashEmbedder())
    val res = Rag.answer(spark, "How many customers per segment are in the region Europe?",
      g, index, HashEmbedder(), retriever)
    assert(res.keywords.contains("customers") && res.keywords.contains("europe"))
    assert(res.prunedSchema.contains("""<node label="region">"""))
    assert(!res.prunedSchema.contains("""<node label="nation">"""),
      "unmentioned labels pruned")
    assert(res.graphAnswer.nonEmpty && res.graphAnswer != "no results")
    assert(res.vectorAnswer.nonEmpty)
    assert(res.synthesized.startsWith("graph: "))
    // determinism end to end
    val res2 = Rag.answer(spark, "How many customers per segment are in the region Europe?",
      g, index, HashEmbedder(), retriever)
    assert(res2.synthesized === res.synthesized)
    // the durable index path: save → load → identical answer with
    // nothing recomputed from the corpus
    val dir = java.nio.file.Files.createTempDirectory("graft_cidx").toString
    Rag.CorpusIndex.save(index, dir)
    val res3 = Rag.answer(spark, "How many customers per segment are in the region Europe?",
      g, Rag.CorpusIndex.load(spark, dir), HashEmbedder(), retriever)
    assert(res3.synthesized === res.synthesized)
  }

  test("answerMany: one fused retrieval plan, results align with answer() per question") {
    val g = graft.ops.GraphOps.tpchGraph(spark, sf)
    val docs = graft.core.Tables.documents(spark, sf)
    val index = Rag.CorpusIndex.build(spark, docs, HashEmbedder())
    val retriever = (graph: graft.graph.PropertyGraph, kws: Seq[String]) =>
      graph.nodes("region").select("r_name").orderBy("r_name").limit(3)
    val questions = Seq(
      "How many customers per segment are in the region Europe?",
      "Which nation has the most orders in the region Asia?")
    val batch = Rag.answerMany(spark, questions, g, index, HashEmbedder(), retriever)
    assert(batch.length === 2)
    for ((q, res) <- questions.zip(batch)) {
      val single = Rag.answer(spark, q, g, index, HashEmbedder(), retriever)
      assert(res.synthesized === single.synthesized,
        s"batched answer must equal the single-question path for: $q")
    }

    // the FULLY batched serving entry (graph arm one job too): a
    // batch retriever computing the same rows per qid must reproduce
    // answerMany question-for-question
    import org.apache.spark.sql.expressions.Window
    val batchRetriever =
      (graph: graft.graph.PropertyGraph, qkws: Seq[(Int, Seq[String])]) => {
        import TestSession.spark.implicits._
        val rn = graph.nodes("region").select(col("r_name"))
          .withColumn("rank", row_number().over(Window.orderBy("r_name")))
          .filter(col("rank") <= 3)
        qkws.map(_._1).toDF("qid").crossJoin(rn)
          .select(col("qid"), col("rank"), col("r_name"))
      }
    val fully = Rag.answerManyGraphBatched(spark, questions, g, index,
      HashEmbedder(), batchRetriever)
    for (((res, bres), q) <- batch.zip(fully).zip(questions))
      assert(bres.synthesized === res.synthesized,
        s"graph-batched serving must equal answerMany for: $q")
    // contract violations reject loudly
    intercept[IllegalArgumentException] {
      Rag.answerManyGraphBatched(spark, questions, g, index, HashEmbedder(),
        (graph, _) => graph.nodes("region").select("r_name"))
    }
  }

  test("Text2Cypher retriever: the graph path executes generated Cypher TEXT") {
    import TestSession.spark.implicits._
    val g = graft.ops.GraphOps.tpchGraph(spark, sf)
    val toCypher = (kws: Seq[String]) => {
      val region = kws.map(_.toUpperCase).find(k =>
        Seq("EUROPE", "ASIA", "AFRICA", "AMERICA").exists(k.startsWith))
        .getOrElse("EUROPE")
      s"""MATCH (r:region)-[:HAS_NATION]->(n:nation)-[:HAS_CUSTOMER]->(c:customer)
         |WHERE r.r_name = '$region'
         |RETURN c.c_mktsegment AS seg, count(*) AS n
         |ORDER BY n DESC, seg LIMIT 5""".stripMargin
    }
    // the textual route returns the same rows as the DataFrame-API
    // pattern it stands in for
    val viaText = Rag.cypherRetriever(toCypher)(g, Seq("europe"))
      .as[(String, Long)].collect().toSeq
    val viaApi = g.matchPath("region", col("r_name") === "EUROPE",
        Seq("HAS_NATION", "HAS_CUSTOMER"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("c_mktsegment")).limit(5)
      .as[(String, Long)].collect().toSeq
    assert(viaText === viaApi && viaText.nonEmpty)
    // and it rides the full hybrid answer path
    val docs = graft.core.Tables.documents(spark, sf)
    val index = Rag.CorpusIndex.build(spark, docs, HashEmbedder())
    val res = Rag.answer(spark, "How many customers per segment are in the region Europe?",
      g, index, HashEmbedder(), Rag.cypherRetriever(toCypher))
    assert(res.graphAnswer.nonEmpty && res.graphAnswer != "no results")
  }
}
