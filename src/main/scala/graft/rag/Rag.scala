package graft.rag

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph
import graft.search.{Embedder, Fts, Vectors}

/** Hybrid RAG orchestration (reference src/rag.py:120-157): question →
  * schema pruning → entity keywords → CONCURRENT {graph path, vector
  * path} → per-path answers → synthesis.
  *
  * Every LLM step (reference BAML functions L4-L8) sits behind the
  * `LlmClient` seam with a deterministic default, so the pipeline runs
  * end-to-end with zero egress: schema pruning keeps labels mentioned
  * in the question, entity keywords are the question's rare tokens,
  * Text2Cypher becomes a template lookup over the graph-query layer,
  * and answering/synthesis render the retrieved rows. A real client
  * implements the same four methods.
  *
  * The two retrieval paths are independent Spark jobs — the engine's
  * analog of the reference's asyncio.gather concurrency — and each is
  * a bounded top-k, so the driver only ever collects k rows.
  */
object Rag {

  /** L4-L8 seam. `graphAnswer` subsumes Text2Cypher+execution: given
    * the question and the pruned schema it returns retrieved rows
    * (the deterministic default uses template queries; a real client
    * generates Cypher-like plans against the same graph API).
    */
  trait LlmClient extends Serializable {
    def pruneSchema(schemaXml: String, question: String): String
    def entityKeywords(question: String, schemaXml: String): Seq[String]
    def answer(question: String, context: String): String
    def synthesize(question: String, vectorAnswer: String, graphAnswer: String): String
  }

  /** Deterministic default: pure-function stand-ins with the same
    * information flow as the prompts they replace.
    */
  object DeterministicLlm extends LlmClient {
    def pruneSchema(schemaXml: String, question: String): String = {
      val q = question.toLowerCase
      schemaXml.linesIterator.filter { l =>
        val isNode = l.contains("<node ") || l.contains("<rel ")
        !isNode || "label=\"([A-Za-z_]+)\"".r.findFirstMatchIn(l)
          .exists(m => q.contains(m.group(1).toLowerCase))
      }.mkString("\n")
    }
    def entityKeywords(question: String, schemaXml: String): Seq[String] = {
      val stop = graft.text.TextFunctions.stopwords.values.flatten.toSet ++
        Set("what", "which", "how", "many", "are", "было", "did", "do", "does", "was", "were")
      question.toLowerCase.split("[^a-z0-9]+").filter(_.length > 2)
        .filterNot(stop).distinct.toSeq
    }
    def answer(question: String, context: String): String =
      if (context.isEmpty) "no results" else context
    def synthesize(question: String, vectorAnswer: String, graphAnswer: String): String =
      s"graph: $graphAnswer | vector: $vectorAnswer"
  }

  final case class RagResult(
      question: String, keywords: Seq[String], prunedSchema: String,
      graphAnswer: String, vectorAnswer: String, synthesized: String)

  /** One-time retrieval index over a document corpus — the engine's
    * analog of the reference's stored LanceDB table + Tantivy index
    * (built once at ingest, generate_note_embeddings.py:26-50, then
    * queried per question, rag.py:88): `post` is the S8 postings
    * table, `stats` the 1-row corpus statistics, `vecs` the S7
    * vector-sink shape (vec_id, iv), `docLen` the per-doc token
    * lengths BM25's normalization reads (Tantivy stores fieldnorms
    * next to its postings for the same reason). Each member is a
    * DataFrame, so at scale they are parquet tables written at index
    * time and read back here — NOTHING in the query path recomputes
    * corpus-sized state (round 4's `answer` re-embedded the whole
    * corpus per question).
    */
  final case class CorpusIndex(
      docs: DataFrame, post: DataFrame, stats: DataFrame, vecs: DataFrame,
      docLen: DataFrame)

  object CorpusIndex {
    /** Build from a (doc_id, text) corpus — the ingest-time pass. */
    def build(spark: SparkSession, docs: DataFrame, embedder: Embedder): CorpusIndex = {
      import spark.implicits._
      val vecs = graft.search.Embedding.embed(spark,
        docs.select(col("doc_id"), col("text")).as[(Long, String)], embedder)
        .select(col("id").as("vec_id"), Vectors.intVector(col("vector")).as("iv"))
      val dl = Fts.docLengths(docs, "doc_id", "text")
      CorpusIndex(
        docs,
        Fts.postings(docs, "doc_id", "text"),
        Fts.corpusStats(dl),
        vecs,
        dl)
    }

    /** Persist the index as parquet tables (the durable S7/S8 sinks —
      * the engine's LanceDB-table + Tantivy-index-on-disk analog).
      * Docs are stored too, so a query session needs only the
      * directory. At real scale write `post` bucketed/partitioned by
      * term hash and `vecs` partitioned by IVF cell.
      */
    def save(index: CorpusIndex, dir: String): Unit = {
      index.docs.write.mode("overwrite").parquet(s"$dir/docs")
      index.post.write.mode("overwrite").parquet(s"$dir/post")
      index.stats.write.mode("overwrite").parquet(s"$dir/stats")
      index.vecs.write.mode("overwrite").parquet(s"$dir/vecs")
      index.docLen.write.mode("overwrite").parquet(s"$dir/doclen")
    }

    /** Load an index previously written by [[save]] — the query-time
      * entry: nothing is recomputed.
      */
    def load(spark: SparkSession, dir: String): CorpusIndex =
      CorpusIndex(
        spark.read.parquet(s"$dir/docs"),
        spark.read.parquet(s"$dir/post"),
        spark.read.parquet(s"$dir/stats"),
        spark.read.parquet(s"$dir/vecs"),
        spark.read.parquet(s"$dir/doclen"))

    /** Persist with the postings BUCKETED by term (managed tables
      * under `name`_*): the scale-path layout. A term-keyed scan then
      * (a) bucket-prunes — a query's `term IN (…)` filter reads only
      * its terms' buckets, the Tantivy-segment-lookup analog — and
      * (b) already carries hash partitioning on `term`, so docFreq's
      * groupBy and the score join need NO exchange on the postings
      * side (CorpusIndexSpec asserts both on the physical plan).
      * Bucket count sizes to corpus: ~1 bucket per 128 MB of
      * postings at 100 TB.
      */
    def saveBucketed(spark: SparkSession, index: CorpusIndex, name: String,
        nBuckets: Int = 8): Unit = {
      index.docs.write.mode("overwrite").saveAsTable(s"${name}_docs")
      index.post.write.mode("overwrite")
        .bucketBy(nBuckets, "term").sortBy("term")
        .saveAsTable(s"${name}_post")
      index.stats.write.mode("overwrite").saveAsTable(s"${name}_stats")
      index.vecs.write.mode("overwrite").saveAsTable(s"${name}_vecs")
      index.docLen.write.mode("overwrite").saveAsTable(s"${name}_dl")
    }

    /** Load a [[saveBucketed]] index from the catalog; the postings
      * frame keeps its bucket spec, so downstream term-keyed plans
      * pick up pruning and shuffle elimination automatically.
      */
    def loadBucketed(spark: SparkSession, name: String): CorpusIndex =
      CorpusIndex(
        spark.table(s"${name}_docs"),
        spark.table(s"${name}_post"),
        spark.table(s"${name}_stats"),
        spark.table(s"${name}_vecs"),
        spark.table(s"${name}_dl"))
  }

  /** Text2Cypher made literal: a graph retriever whose seam output
    * is a TEXTUAL Cypher statement (what a real LLM client emits,
    * reference src/rag.py:48-76) executed by [[graft.graph.CypherLite]]
    * over the same graph — the deterministic `toCypher` template
    * stands where the LLM generation sits, and the execution path is
    * byte-identical to the real one.
    */
  def cypherRetriever(toCypher: Seq[String] => String)
      : (PropertyGraph, Seq[String]) => DataFrame =
    (g, kws) => graft.graph.CypherLite.query(g, toCypher(kws))

  /** End-to-end hybrid query over a property graph and a PREBUILT
    * [[CorpusIndex]]; retrieval is hybrid BM25 + embedded-query KNN
    * fused with RRF, top-`k` — the reference's hybrid is Tantivy BM25
    * + vector with RRF defaults top_k=2, k=60
    * (generate_note_embeddings.py:49, rag.py:80-94). Only the
    * QUESTION is embedded here — one vector on the driver;
    * corpus-sized work happened at index build.
    */
  def answer(
      spark: SparkSession, question: String, graph: PropertyGraph,
      index: CorpusIndex, embedder: Embedder,
      graphRetriever: (PropertyGraph, Seq[String]) => DataFrame,
      llm: LlmClient = DeterministicLlm, k: Int = 2): RagResult = {

    val pruned = llm.pruneSchema(graph.schemaXml, question)
    val keywords = llm.entityKeywords(question, pruned)

    // vector path: hybrid (keyword BM25 + embedded-query KNN) + RRF
    val kw = Fts.bm25Scores(index.post, index.docLen, index.stats, keywords)
      .orderBy(col("score").desc, col("doc_id").asc).limit(20)
      .select(col("doc_id").as("id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)).as("rank"))
    val qv = embedder.embed(question)
    import spark.implicits._
    val qdf = Seq(Tuple1(qv)).toDF("qv")
      .select(Vectors.intVector(col("qv")).as("qv"))
    val vec = Vectors.knnDot(index.vecs, "vec_id", qdf, 20)
      .select(col("vec_id").as("id"),
        row_number().over(Window.orderBy(col("dot").desc, col("vec_id").asc)).as("rank"))
    val fusedIds = Fts.rrfFuse(kw, vec)
      .orderBy(col("rrf").desc, col("id").asc).limit(k)
    val topDocs = fusedIds.join(index.docs, fusedIds("id") === index.docs("doc_id"))
      .orderBy(col("rrf").desc, col("id").asc)
      .select("text").collect().map(_.getString(0))
    val vectorAnswer = llm.answer(question, topDocs.mkString("\n---\n"))

    // graph path: template retrieval over the pruned schema's graph
    val graphRows = graphRetriever(graph, keywords).limit(10).collect()
    val graphAnswer = llm.answer(question,
      graphRows.map(_.toSeq.mkString(", ")).mkString("\n"))

    RagResult(question, keywords, pruned, graphAnswer, vectorAnswer,
      llm.synthesize(question, vectorAnswer, graphAnswer))
  }

  /** Batch hybrid answering — N questions through ONE retrieval plan
    * (the eval-harness fan-in; the reference's rag_obs_eval loop runs
    * questions serially, src/rag_obs_eval.py): keyword and vector
    * ranks for ALL questions compute in a single fused job
    * (bm25ScoresMany ⊕ knnDotMany ⊕ RRF — the batch scorer is the
    * same BM25 arithmetic as [[answer]]'s, so batch serving and the
    * one-off path rank identically), the bounded N·k fused
    * context rows collect once, and the per-question LLM steps run
    * driver-side over them. The graph path stays per-question (its
    * retrievals are template-sized); the corpus-sized work is what
    * batches. Results align with [[answer]] question-for-question.
    */
  def answerMany(
      spark: SparkSession, questions: Seq[String], graph: PropertyGraph,
      index: CorpusIndex, embedder: Embedder,
      graphRetriever: (PropertyGraph, Seq[String]) => DataFrame,
      llm: LlmClient = DeterministicLlm, k: Int = 2): Seq[RagResult] = {
    require(questions.nonEmpty, "empty question batch")
    val schemaXml = graph.schemaXml // built once per batch, not per question
    val pruned = questions.map(q => llm.pruneSchema(schemaXml, q))
    val kws = questions.zip(pruned).map { case (q, p) => llm.entityKeywords(q, p) }
    val ctx = fusedContexts(spark, questions, kws, index, embedder, k)

    questions.zipWithIndex.map { case (question, i) =>
      val vectorAnswer = llm.answer(question,
        ctx.getOrElse(i, Seq.empty).mkString("\n---\n"))
      val graphRows = graphRetriever(graph, kws(i)).limit(10).collect()
      val graphAnswer = llm.answer(question,
        graphRows.map(_.toSeq.mkString(", ")).mkString("\n"))
      RagResult(question, kws(i), pruned(i), graphAnswer, vectorAnswer,
        llm.synthesize(question, vectorAnswer, graphAnswer))
    }
  }

  /** The corpus arm of [[answerMany]], factored out: ONE fused plan
    * scoring every question (bm25ScoresMany ⊕ knnDotMany ⊕ RRF), one
    * bounded N·k collect → per-question context strings.
    */
  private def fusedContexts(
      spark: SparkSession, questions: Seq[String], kws: Seq[Seq[String]],
      index: CorpusIndex, embedder: Embedder, k: Int): Map[Int, Seq[String]] = {
    import spark.implicits._
    val qdf = kws.zipWithIndex
      .flatMap { case (ts, i) => ts.map(t => (i, t)) }.toDF("qid", "term")
    val kw = Fts.bm25ScoresMany(index.post, index.docLen, index.stats, qdf)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rank") <= 20)
      .select(col("qid"), col("doc_id").as("id"), col("rank"))
    val qvs = questions.zipWithIndex
      .map { case (q, i) => (i, embedder.embed(q).toSeq) }.toDF("qid", "qv")
      .select(col("qid"), Vectors.intVector(col("qv")).as("qv"))
    val vec = Vectors.knnDotMany(index.vecs, "vec_id", qvs, 20)
      .select(col("qid"), col("vec_id").as("id"), col("rank"))
    val fused = Fts.rrfFuseMany(kw, vec)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("rrf").desc, col("id").asc)))
      .filter(col("rank") <= k)
    fused
      .join(index.docs, fused("id") === index.docs("doc_id"))
      .select(col("qid"), col("rank"), col("text"))
      .collect()
      .groupBy(_.getAs[Int]("qid"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[String]("text")).toSeq)
      .toMap
  }

  /** [[answerMany]] with the GRAPH arm batched too — the serving
    * shape for large batches, closing the bottleneck the round-11
    * RagBench measurement exposed: `answerMany`'s graph arm is one
    * blocking driver round-trip PER QUESTION (the reference's serving
    * loop, rag_obs_eval.py), so batch wall-clock grows linearly in N
    * even though its corpus arm is batch-constant. Here the caller
    * supplies a BATCH retriever: all questions' keyword bindings at
    * once → ONE DataFrame with a `qid` column and a per-qid `rank`
    * column (1-based; rows with rank > `graphRowsPerQuestion` are
    * dropped). Two Spark collects total per batch — one corpus, one
    * graph — regardless of N.
    *
    * The per-question [[answerMany]] stays the Text2Cypher-faithful
    * route (each question compiles its own Cypher text); this entry
    * trades that literalness for the O(1)-jobs batch plan — the same
    * trade `bm25ScoresMany` makes against per-question `bm25Scores`.
    * Results align with [[answerMany]] question-for-question when the
    * batch retriever computes the same rows (ExtractRagSpec pins it).
    */
  def answerManyGraphBatched(
      spark: SparkSession, questions: Seq[String], graph: PropertyGraph,
      index: CorpusIndex, embedder: Embedder,
      batchGraphRetriever: (PropertyGraph, Seq[(Int, Seq[String])]) => DataFrame,
      llm: LlmClient = DeterministicLlm, k: Int = 2,
      graphRowsPerQuestion: Int = 10): Seq[RagResult] = {
    require(questions.nonEmpty, "empty question batch")
    val schemaXml = graph.schemaXml
    val pruned = questions.map(q => llm.pruneSchema(schemaXml, q))
    val kws = questions.zip(pruned).map { case (q, p) => llm.entityKeywords(q, p) }
    val ctx = fusedContexts(spark, questions, kws, index, embedder, k)

    val gdf = batchGraphRetriever(graph, kws.zipWithIndex.map(_.swap))
    require(gdf.columns.contains("qid") && gdf.columns.contains("rank"),
      "batch graph retriever must return qid and rank columns " +
        s"(got ${gdf.columns.mkString(", ")})")
    val payload = gdf.columns.filter(c => c != "qid" && c != "rank")
    val graphRows: Map[Int, Seq[String]] = gdf
      .filter(col("rank") <= graphRowsPerQuestion)
      .collect()
      .groupBy(_.getAs[Int]("qid"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(r => payload.map(c => String.valueOf(r.getAs[Any](c))).mkString(", "))
        .toSeq)
      .toMap

    questions.zipWithIndex.map { case (question, i) =>
      val vectorAnswer = llm.answer(question,
        ctx.getOrElse(i, Seq.empty).mkString("\n---\n"))
      val graphAnswer = llm.answer(question,
        graphRows.getOrElse(i, Seq.empty).mkString("\n"))
      RagResult(question, kws(i), pruned(i), graphAnswer, vectorAnswer,
        llm.synthesize(question, vectorAnswer, graphAnswer))
    }
  }
}
