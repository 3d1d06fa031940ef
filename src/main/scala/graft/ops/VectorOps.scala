package graft.ops

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.search.Vectors

/** Similarity-search operator inventory over `embeddings` (SURVEY §2.7
  * V2; training-data-pipeline ANN surface). Ranking uses exact integer
  * dot products (1e7-scaled) so the DuckDB oracle is bit-identical;
  * Vectors.cosine provides the float scoring variant for library use.
  */
object VectorOps {

  private val K = 10
  private val QueryId = 0   // deterministic query: vector of vec_id 0
  private val QueryIdIvf = 7
  private val NBatchQueries = 5
  private val BatchK = 5

  private val sqlIv =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT))"

  val defs: Seq[QueryDef] = Seq(
    // V1 brute-force KNN: exact top-k over every vector. The baseline
    // every ANN variant is measured against.
    QueryDef(
      "v1_knn_bruteforce",
      (s, d) => {
        val iv = Tables.embeddings(s, d)
          .select(col("vec_id"), Vectors.intVector(col("embedding")).as("iv"))
        val q = iv.filter(col("vec_id") === QueryId).select(col("iv").as("qv"))
        Vectors.knnDot(iv, "vec_id", q, K)
      },
      Some(
        s"""WITH iv AS (SELECT vec_id, $sqlIv AS iv FROM embeddings),
           |q AS (SELECT iv AS qv FROM iv WHERE vec_id = $QueryId)
           |SELECT vec_id,
           |       CAST(list_sum(list_transform(range(1, len(iv) + 1, 1),
           |                                    i -> iv[i] * qv[i])) AS BIGINT) AS dot
           |FROM iv, q
           |ORDER BY dot DESC, vec_id ASC LIMIT $K""".stripMargin)
    ),
    // V1b brute-force KNN by true cosine through the native Catalyst
    // expression (graft.functions.CosineSimilarity — codegen'd fused
    // loop). Output ids only: the scores are IEEE doubles computed by
    // the same ascending-index loop DuckDB's list_cosine_similarity
    // uses, and the id set is stable because no near-ties straddle
    // the k boundary in this corpus.
    QueryDef(
      "v3_knn_cosine_expr",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === QueryId).select(col("embedding").as("qv"))
        e.crossJoin(broadcast(q))
          .select(col("vec_id"), expr("cosine_sim(embedding, qv)").as("c"))
          .orderBy(col("c").desc, col("vec_id").asc)
          .limit(K)
          .select("vec_id")
      },
      Some(
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryId)
           |SELECT vec_id FROM embeddings, q
           |ORDER BY list_cosine_similarity(embedding, qv) DESC, vec_id ASC
           |LIMIT $K""".stripMargin)
    ),
    // V2 IVF-style blocked KNN (nprobe=1): scan only the query's
    // cluster — at 100 TB this is partition pruning on the cell id.
    QueryDef(
      "v2_knn_ivf",
      (s, d) => {
        val iv = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").as("blk"),
            Vectors.intVector(col("embedding")).as("iv"))
        val q = iv.filter(col("vec_id") === QueryIdIvf)
          .select(col("blk").as("qblk"), col("iv").as("qv"))
        Vectors.knnDotBlocked(iv, "vec_id", q, K)
      },
      Some(
        s"""WITH iv AS (SELECT vec_id, label AS blk, $sqlIv AS iv FROM embeddings),
           |q AS (SELECT blk AS qblk, iv AS qv FROM iv WHERE vec_id = $QueryIdIvf)
           |SELECT vec_id,
           |       CAST(list_sum(list_transform(range(1, len(iv) + 1, 1),
           |                                    i -> iv[i] * qv[i])) AS BIGINT) AS dot
           |FROM iv JOIN q ON blk = qblk
           |ORDER BY dot DESC, vec_id ASC LIMIT $K""".stripMargin)
    ),
    // V2c batch KNN: top-k per query for a query SET (the
    // training-pipeline shape — score an incoming batch against a
    // reference corpus in one pass). Salted two-phase rank keeps any
    // single reducer's load at k·nSalts rows per query, independent
    // of corpus size; the oracle is the plain per-query window the
    // salted plan must reproduce exactly.
    QueryDef(
      "v4_knn_batch",
      (s, d) => {
        val iv = Tables.embeddings(s, d)
          .select(col("vec_id"), Vectors.intVector(col("embedding")).as("iv"))
        val qs = iv.filter(col("vec_id") < NBatchQueries)
          .select(col("vec_id").as("qid"), col("iv").as("qv"))
        Tables.orderedByAll(
          Vectors.knnDotMany(iv, "vec_id", qs, BatchK))
      },
      Some(
        s"""WITH iv AS (SELECT vec_id, $sqlIv AS iv FROM embeddings),
           |q AS (SELECT vec_id AS qid, iv AS qv FROM iv WHERE vec_id < $NBatchQueries),
           |scored AS (
           |  SELECT q.qid, iv.vec_id,
           |         CAST(list_sum(list_transform(range(1, len(iv.iv) + 1, 1),
           |                                      i -> iv.iv[i] * q.qv[i])) AS BIGINT) AS dot
           |  FROM iv, q),
           |ranked AS (
           |  SELECT qid, vec_id, dot,
           |         row_number() OVER (PARTITION BY qid
           |                            ORDER BY dot DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT qid, vec_id, dot, rank FROM ranked WHERE rank <= $BatchK
           |ORDER BY ALL""".stripMargin)
    )
  )
}
