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
  private val RerankK = 50  // quantized-phase candidates kept for exact re-rank
  private val NCellsLearned = 4
  private val LloydIters = 2
  private val NProbeLearned = 2

  private val sqlIv =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT))"

  /** The learned-IVF oracle prelude shared by v9/v10: replay
    * Ivf.fitExact's two Lloyd rounds over the q7 lattice (init = the
    * NCellsLearned smallest-id vectors, argmin with ties to the lower
    * cell, exact integer sums, empty-cell carry, (Σq/n)/1e7 final
    * scale-down), then assign the corpus (`af`) and each query's
    * NProbeLearned nearest cells (`probes`) in float space — the
    * exact arithmetic NearestCells runs.
    */
  private def sqlLearnedCtes: String = {
    def round(prev: String, r: String, cur: String) =
      s"""d$r AS (SELECT ivd.vec_id, $prev.cell,
         |  list_sum(list_transform(range(1, len(ivd.v) + 1, 1),
         |    i -> (ivd.v[i] - $prev.c[i]) * (ivd.v[i] - $prev.c[i]))) AS d
         |  FROM ivd, $prev),
         |a$r AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS r
         |  FROM d$r) WHERE r = 1),
         |e$r AS (SELECT a$r.cell, u.pos, u.q
         |  FROM (SELECT vec_id, unnest(generate_series(1, len(iv))) AS pos,
         |               unnest(iv) AS q FROM iv) u
         |  JOIN a$r USING (vec_id)),
         |s$r AS (SELECT cell, pos, CAST(sum(q) AS BIGINT) AS s, count(*) AS n
         |  FROM e$r GROUP BY 1, 2),
         |$cur AS (
         |  SELECT cell, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY pos) AS c
         |  FROM s$r GROUP BY cell
         |  UNION ALL
         |  SELECT $prev.cell, $prev.c FROM $prev
         |  WHERE $prev.cell NOT IN (SELECT cell FROM s$r))""".stripMargin
    s"""iv AS (SELECT vec_id, $sqlIv AS iv FROM embeddings),
       |ivd AS (SELECT vec_id, list_transform(iv, x -> CAST(x AS DOUBLE)) AS v FROM iv),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INTEGER) AS cell,
       |              v AS c
       |       FROM (SELECT * FROM ivd ORDER BY vec_id ASC LIMIT $NCellsLearned)),
       |${round("c0", "1", "c1")},
       |${round("c1", "2", "c2")},
       |cf AS (SELECT cell, list_transform(c, x -> x / 10000000.0) AS c FROM c2),
       |embd AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |         FROM embeddings),
       |df AS (SELECT embd.vec_id, cf.cell,
       |  list_sum(list_transform(range(1, len(embd.v) + 1, 1),
       |    i -> (embd.v[i] - cf.c[i]) * (embd.v[i] - cf.c[i]))) AS d
       |  FROM embd, cf),
       |af AS (SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS r
       |  FROM df) WHERE r = 1),
       |probes AS (SELECT vec_id AS qid, cell FROM (
       |  SELECT vec_id, cell,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS r
       |  FROM df WHERE vec_id < $NBatchQueries) WHERE r <= $NProbeLearned)""".stripMargin
  }

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
    // V5 int8-quantized two-phase KNN: phase 1 ranks the TINYINT
    // index by rescaled quantized dot and keeps RerankK candidates,
    // phase 2 fetches only those from the full-precision store and
    // re-ranks exactly — the compression shape for a corpus whose
    // float vectors exceed the scan budget (4× smaller index; same
    // output schema as v1, and identical content when the quantized
    // recall@RerankK holds, which the oracle verifies end-to-end).
    QueryDef(
      "v5_knn_quantized",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        // scale materialized first, THEN referenced by the quantize
        // lambda — inline q8Scale would re-derive the max per element
        val q8 = e.select(col("vec_id"), col("embedding"),
            Vectors.q8Scale(col("embedding")).as("scale"))
          .select(col("vec_id"),
            Vectors.q8Vector(col("embedding"), col("scale")).as("q8"),
            col("scale"))
        val full = e.select(col("vec_id"),
          Vectors.intVector(col("embedding")).as("iv"))
        val q = e.filter(col("vec_id") === QueryId)
          .select(col("embedding"), Vectors.q8Scale(col("embedding")).as("qscale"),
            Vectors.intVector(col("embedding")).as("qv"))
          .select(
            Vectors.q8Vector(col("embedding"), col("qscale"))
              .cast("array<bigint>").as("qq8"),
            col("qscale"), col("qv"))
        Vectors.knnQuantized(q8, full, "vec_id", q, K, RerankK)
      },
      Some(
        s"""WITH q8 AS (
           |  SELECT vec_id,
           |         list_transform(embedding, x -> CASE WHEN mx > 0
           |             THEN CAST(floor(CAST(x AS DOUBLE) / mx * 127) AS BIGINT) ELSE 0 END) AS q8,
           |         mx AS scale
           |  FROM (SELECT vec_id, embedding,
           |               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
           |        FROM embeddings)),
           |qq AS (SELECT q8, scale FROM q8 WHERE vec_id = $QueryId),
           |cand AS (
           |  SELECT vec_id FROM (
           |    SELECT q8.vec_id,
           |           CAST(list_sum(list_transform(range(1, len(q8.q8) + 1, 1),
           |                                        i -> q8.q8[i] * qq.q8[i])) AS DOUBLE)
           |             * q8.scale * qq.scale AS qscore
           |    FROM q8, qq)
           |  ORDER BY qscore DESC, vec_id ASC LIMIT $RerankK),
           |iv AS (SELECT vec_id, $sqlIv AS iv FROM embeddings),
           |qv AS (SELECT iv AS qv FROM iv WHERE vec_id = $QueryId)
           |SELECT iv.vec_id,
           |       CAST(list_sum(list_transform(range(1, len(iv.iv) + 1, 1),
           |                                    i -> iv.iv[i] * qv.qv[i])) AS BIGINT) AS dot
           |FROM iv JOIN cand USING (vec_id), qv
           |ORDER BY dot DESC, vec_id ASC LIMIT $K""".stripMargin)
    ),
    // V6 batch quantized KNN: the compressed index serving a whole
    // query set — quantized scan + salted per-query rank keeps
    // rerankK candidates per query, then an exact re-rank over only
    // the fetched candidates. Oracle = plain windows over the same
    // two-phase arithmetic.
    QueryDef(
      "v6_knn_quantized_batch",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q8 = e.select(col("vec_id"), col("embedding"),
            Vectors.q8Scale(col("embedding")).as("scale"))
          .select(col("vec_id"),
            Vectors.q8Vector(col("embedding"), col("scale")).as("q8"),
            col("scale"))
        val full = e.select(col("vec_id"),
          Vectors.intVector(col("embedding")).as("iv"))
        val qs = e.filter(col("vec_id") < NBatchQueries)
          .select(col("vec_id"), col("embedding"),
            Vectors.q8Scale(col("embedding")).as("qscale"),
            Vectors.intVector(col("embedding")).as("qv"))
          .select(col("vec_id").as("qid"),
            Vectors.q8Vector(col("embedding"), col("qscale"))
              .cast("array<bigint>").as("qq8"),
            col("qscale"), col("qv"))
        Tables.orderedByAll(
          Vectors.knnQuantizedMany(q8, full, "vec_id", qs, BatchK, RerankK))
      },
      Some(
        s"""WITH q8 AS (
           |  SELECT vec_id,
           |         list_transform(embedding, x -> CASE WHEN mx > 0
           |             THEN CAST(floor(CAST(x AS DOUBLE) / mx * 127) AS BIGINT) ELSE 0 END) AS q8,
           |         mx AS scale
           |  FROM (SELECT vec_id, embedding,
           |               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
           |        FROM embeddings)),
           |qs AS (SELECT vec_id AS qid, q8, scale FROM q8 WHERE vec_id < $NBatchQueries),
           |scored AS (
           |  SELECT qs.qid, q8.vec_id,
           |         CAST(list_sum(list_transform(range(1, len(q8.q8) + 1, 1),
           |                                      i -> q8.q8[i] * qs.q8[i])) AS DOUBLE)
           |           * q8.scale * qs.scale AS qscore
           |  FROM q8, qs),
           |cand AS (SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id,
           |           row_number() OVER (PARTITION BY qid
           |                              ORDER BY qscore DESC, vec_id ASC) AS r
           |    FROM scored) WHERE r <= $RerankK),
           |iv AS (SELECT vec_id, $sqlIv AS iv FROM embeddings),
           |qv AS (SELECT vec_id AS qid, iv AS qv FROM iv WHERE vec_id < $NBatchQueries),
           |rer AS (
           |  SELECT c.qid, iv.vec_id,
           |         CAST(list_sum(list_transform(range(1, len(iv.iv) + 1, 1),
           |                                      i -> iv.iv[i] * qv.qv[i])) AS BIGINT) AS dot
           |  FROM cand c JOIN iv ON c.vec_id = iv.vec_id JOIN qv ON c.qid = qv.qid),
           |ranked AS (
           |  SELECT qid, vec_id, dot,
           |         row_number() OVER (PARTITION BY qid
           |                            ORDER BY dot DESC, vec_id ASC) AS rank
           |  FROM rer)
           |SELECT qid, vec_id, dot, rank FROM ranked WHERE rank <= $BatchK
           |ORDER BY ALL""".stripMargin)
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
    ),
    // V9 LEARNED-IVF batch search, oracle-checked end to end: the
    // quantizer TRAINS inside the query (Ivf.fitExact — 2 Lloyd
    // rounds over the q7 lattice, exact integer component sums, so
    // training is bit-stable under any partitioning and replayable),
    // the corpus indexes through the NearestCells broadcast
    // expression, and each query scans only its nprobe=2 nearest
    // cells with the salted two-phase rank. The oracle unrolls the
    // SAME two rounds as CTEs (init = 4 smallest-id vectors, argmin
    // with ties to the lower cell, empty-cell carry, (Σq/n)/1e7
    // float-space scale-down) and replays assignment, probing, and
    // the exact int-dot re-rank — the first oracle to cover the
    // LEARNED path, not just label-blocked IVF (v2).
    QueryDef(
      "v9_knn_ivf_learned",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val model = graft.search.Ivf.fitExact(e, "vec_id", "embedding",
          nCells = NCellsLearned, iters = LloydIters)
        val index = graft.search.Ivf.index(e, "vec_id", "embedding", model)
        val qs = e.filter(col("vec_id") < NBatchQueries)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        Tables.orderedByAll(
          graft.search.Ivf.searchMany(index, "vec_id", model, qs, BatchK,
            nprobe = NProbeLearned))
      },
      Some(
        s"""WITH $sqlLearnedCtes,
           |qv AS (SELECT vec_id AS qid, iv AS qv FROM iv WHERE vec_id < $NBatchQueries),
           |cand AS (SELECT p.qid, af.vec_id FROM probes p JOIN af USING (cell)),
           |scored AS (SELECT c.qid, c.vec_id,
           |  CAST(list_sum(list_transform(range(1, len(iv.iv) + 1, 1),
           |    i -> iv.iv[i] * qv.qv[i])) AS BIGINT) AS dot
           |  FROM cand c JOIN iv ON c.vec_id = iv.vec_id JOIN qv ON c.qid = qv.qid),
           |ranked AS (SELECT qid, vec_id, dot,
           |  row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT qid, vec_id, dot, rank FROM ranked
           |WHERE rank <= $BatchK ORDER BY ALL""".stripMargin)
    ),
    // V10 batch QUANTIZED IVF — the full production ANN stack,
    // oracle-checked: v9's learned quantizer prunes to nprobe=2 cells
    // (round 7's quantized batch scanned the whole int8 index), the
    // pruned candidates rank by rescaled int8 dot keeping RerankK per
    // query, and only those fetch from the full-precision store for
    // the exact re-rank. Oracle = the shared learned-IVF CTEs + v6's
    // quantization arithmetic over the pruned candidate set.
    QueryDef(
      "v10_knn_quantized_ivf",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val model = graft.search.Ivf.fitExact(e, "vec_id", "embedding",
          nCells = NCellsLearned, iters = LloydIters)
        val ixQ8 = graft.search.Ivf.indexQuantized(e, "vec_id", "embedding", model)
        val full = e.select(col("vec_id"),
          Vectors.intVector(col("embedding")).as("iv"))
        val qs = e.filter(col("vec_id") < NBatchQueries)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        Tables.orderedByAll(
          graft.search.Ivf.searchManyQuantized(ixQ8, full, "vec_id", model,
            qs, BatchK, RerankK, nprobe = NProbeLearned))
      },
      Some(
        s"""WITH $sqlLearnedCtes,
           |q8 AS (
           |  SELECT vec_id,
           |         list_transform(embedding, x -> CASE WHEN mx > 0
           |             THEN CAST(floor(CAST(x AS DOUBLE) / mx * 127) AS BIGINT) ELSE 0 END) AS q8,
           |         mx AS scale
           |  FROM (SELECT vec_id, embedding,
           |               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
           |        FROM embeddings)),
           |qs AS (SELECT vec_id AS qid, q8, scale FROM q8 WHERE vec_id < $NBatchQueries),
           |pruned AS (SELECT p.qid, af.vec_id FROM probes p JOIN af USING (cell)),
           |qscored AS (
           |  SELECT pr.qid, q8.vec_id,
           |         CAST(list_sum(list_transform(range(1, len(q8.q8) + 1, 1),
           |                                      i -> q8.q8[i] * qs.q8[i])) AS DOUBLE)
           |           * q8.scale * qs.scale AS qscore
           |  FROM pruned pr JOIN q8 ON pr.vec_id = q8.vec_id
           |  JOIN qs ON pr.qid = qs.qid),
           |candq AS (SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id,
           |           row_number() OVER (PARTITION BY qid
           |                              ORDER BY qscore DESC, vec_id ASC) AS r
           |    FROM qscored) WHERE r <= $RerankK),
           |qv AS (SELECT vec_id AS qid, iv AS qv FROM iv WHERE vec_id < $NBatchQueries),
           |rer AS (
           |  SELECT c.qid, iv.vec_id,
           |         CAST(list_sum(list_transform(range(1, len(iv.iv) + 1, 1),
           |                                      i -> iv.iv[i] * qv.qv[i])) AS BIGINT) AS dot
           |  FROM candq c JOIN iv ON c.vec_id = iv.vec_id JOIN qv ON c.qid = qv.qid),
           |ranked AS (
           |  SELECT qid, vec_id, dot,
           |         row_number() OVER (PARTITION BY qid
           |                            ORDER BY dot DESC, vec_id ASC) AS rank
           |  FROM rer)
           |SELECT qid, vec_id, dot, rank FROM ranked WHERE rank <= $BatchK
           |ORDER BY ALL""".stripMargin)
    ),
    // V7 per-label centroids — the embedding-analytics rollup (cluster
    // quality, drift monitoring, IVF seeding). Component sums ride the
    // same q7 integer quantization as every other vector oracle, so
    // the mean is shuffle-order exact: posexplode → one agg keyed on
    // (label, pos) with map-side partial combine, ONE division at the
    // end. Never collects a vector to the driver; at 100 TB the
    // (label, pos) key space is tiny (labels × dim) so the reduce side
    // is trivially balanced.
    QueryDef(
      "v7_label_centroids",
      (s, d) => Tables.orderedByAll(
        Tables.embeddings(s, d)
          .select(col("label"),
            posexplode(Vectors.intVector(col("embedding"))).as(Seq("pos", "q")))
          .groupBy("label", "pos")
          .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
          .select(col("label"), col("pos"), col("n"),
            (col("sq").cast("double") / col("n").cast("double")).as("centroid_q7"))),
      Some(s"""WITH e AS (SELECT label,
              |  unnest(generate_series(0, len(embedding) - 1)) AS pos,
              |  unnest($sqlIv) AS q
              |FROM embeddings)
              |SELECT label, pos, count(*) AS n,
              |       CAST(CAST(sum(q) AS BIGINT) AS DOUBLE)
              |         / CAST(count(*) AS DOUBLE) AS centroid_q7
              |FROM e GROUP BY 1, 2 ORDER BY ALL""".stripMargin)
    ),
    // V8 per-label spread — population variance per (label,
    // dimension), the drift/cluster-quality monitor next to v7's
    // centroids. Variance stays EXACT until one final division:
    // Var = (n·Σq² − (Σq)²) / n² over the q7-quantized longs, every
    // term exact integer arithmetic (at these magnitudes all fit
    // BIGINT; at larger per-label counts promote the two products to
    // DECIMAL(38) — same plan shape). Shuffle-order-free by
    // construction, unlike a naive Welford-over-doubles.
    QueryDef(
      "v8_label_spread",
      (s, d) => Tables.orderedByAll(
        Tables.embeddings(s, d)
          .select(col("label"),
            posexplode(Vectors.intVector(col("embedding"))).as(Seq("pos", "q")))
          .groupBy("label", "pos")
          .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"),
            sum(col("q") * col("q")).as("sqq"))
          .select(col("label"), col("pos"), col("n"),
            ((col("n") * col("sqq") - col("sq") * col("sq")).cast("double") /
              (col("n") * col("n")).cast("double")).as("var_q7"))),
      Some(s"""WITH e AS (SELECT label,
              |  unnest(generate_series(0, len(embedding) - 1)) AS pos,
              |  unnest($sqlIv) AS q
              |FROM embeddings),
              |g AS (SELECT label, pos, count(*) AS n,
              |        CAST(sum(q) AS BIGINT) AS sq,
              |        CAST(sum(q * q) AS BIGINT) AS sqq
              |      FROM e GROUP BY 1, 2)
              |SELECT label, pos, n,
              |       CAST(n * sqq - sq * sq AS DOUBLE)
              |         / CAST(n * n AS DOUBLE) AS var_q7
              |FROM g ORDER BY ALL""".stripMargin)
    )
  )
}
