package graft.search

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned IVF (inverted-file) ANN index over an embedding column —
  * the trained form of the blocked scan `Vectors.knnDotBlocked`
  * demonstrates with a pre-existing label column.
  *
  * Structure (the standard IVF recipe):
  *  - `fit`: a coarse quantizer — k-means over the corpus (Spark ML,
  *    distributed Lloyd iterations, fixed seed ⇒ deterministic).
  *    The centroid table is tiny (nCells × dim doubles) and lives on
  *    the driver, like a broadcast dictionary.
  *  - `index`: assign every vector to its nearest centroid cell and
  *    carry the exact 1e7-scaled int vector. At 100 TB this is the
  *    partition/bucket key — write the index parquet partitioned by
  *    `cell` and a query scans only its probed cells' files.
  *  - `search`: pick the `nprobe` nearest cells to the query ON THE
  *    DRIVER (nCells-sized math), then scan only those cells with the
  *    same broadcast-query + TakeOrderedAndProject plan as the
  *    brute-force path. nprobe = nCells degrades gracefully to exact
  *    brute force; IvfSpec pins that equivalence and the recall
  *    monotonicity in nprobe.
  */
object Ivf {

  /** Driver-held coarse quantizer: (cell id, centroid). */
  final case class Model(centroids: Array[(Int, Array[Double])]) {
    require(centroids.nonEmpty)

    /** The nprobe cells nearest to `q` (squared L2, driver math). */
    def probeCells(q: Seq[Float], nprobe: Int): Seq[Int] =
      centroids
        .map { case (cell, c) =>
          val d = c.indices.map(i => { val t = c(i) - q(i); t * t }).sum
          (d, cell)
        }
        .sortBy { case (d, cell) => (d, cell) }
        .take(nprobe).map(_._2).toSeq

    /** The centroid matrix as a TorrentBroadcast — shipped to each
      * executor once and shared by every assignment expression built
      * from this model (memoized per model instance). Rows sorted by
      * cell id so scan order is the distance tie-break.
      */
    @transient private var bcCache: org.apache.spark.broadcast.Broadcast[
      graft.functions.NearestCells.Centroids] = _
    private[graft] def broadcastCentroids(
        spark: org.apache.spark.sql.SparkSession): org.apache.spark.broadcast.Broadcast[
        graft.functions.NearestCells.Centroids] = synchronized {
      if (bcCache == null) {
        val sorted = centroids.sortBy(_._1)
        bcCache = spark.sparkContext.broadcast(
          graft.functions.NearestCells.Centroids(sorted.map(_._1), sorted.map(_._2)))
      }
      bcCache
    }
  }

  /** Train the coarse quantizer. One pass of distributed k-means;
    * nCells ~ sqrt(corpus) is the usual sizing at scale.
    */
  def fit(emb: DataFrame, vecCol: String, nCells: Int,
      seed: Long = 42L, maxIter: Int = 20): Model = {
    val feats = emb.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val km = new KMeans()
      .setK(nCells).setSeed(seed).setMaxIter(maxIter).setFeaturesCol("features")
    Model(km.fit(feats).clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) })
  }

  /** Deterministic, ENGINE-PORTABLE quantizer training: `iters` Lloyd
    * rounds over the q7 lattice (1e7-scaled integer vectors), seeded
    * from the `nCells` smallest-id vectors. Each round assigns every
    * vector to its nearest centroid (the same [[cellOf]] broadcast
    * expression indexing uses, fed the q7 vector as doubles) and
    * recomputes centroids from EXACT integer component sums — one
    * double division per component — so the trained artifact is
    * BIT-STABLE under any partitioning, executor count, or run order.
    * Spark ML's k-means|| ([[fit]]) is seeded but its sampling rides
    * the data partitioning, so a re-partitioned 100-TB corpus trains a
    * (slightly) different quantizer run to run; this trainer is the
    * reproducible-artifact path, and an oracle engine can replay it
    * round for round (v9_knn_ivf_learned does, in DuckDB SQL). A cell
    * that loses all members keeps its previous centroid. The returned
    * centroids are scaled back to float space — (Σq/n)/1e7, exactly
    * that op order — so the model drops into [[index]]/[[searchMany]]
    * unchanged. Per round: one fused-loop assignment scan + one
    * (cell, pos)-keyed exact aggregate (nCells·dim rows to the
    * driver) — the standard distributed-Lloyd shape.
    */
  def fitExact(emb: DataFrame, idCol: String, vecCol: String, nCells: Int,
      iters: Int = 2): Model = graft.core.Tuning.withCachedPlanAqe(emb.sparkSession) {
    require(nCells >= 1 && iters >= 0)
    // persisted for the training loop (r19): the seed collect plus
    // EACH Lloyd round re-scanned the corpus and re-ran the 1e7
    // scaling otherwise — iters+1 full passes for a frame that Lloyd
    // by definition re-reads; released before returning (guide §5)
    val iv = emb.select(col(idCol).as("__id"),
      Vectors.intVector(col(vecCol)).as("__iv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init: Array[(Int, Array[Double])] = iv.orderBy(col("__id").asc)
      .limit(nCells).collect()
      .map(_.getSeq[Long](1).toArray.map(_.toDouble))
      .zipWithIndex.map { case (v, i) => (i, v) }
    require(init.length == nCells, s"corpus smaller than nCells=$nCells")
    var q7Model = Model(init)
    for (_ <- 1 to iters) {
      val sums = iv
        .select(cellOf(col("__iv").cast("array<double>"), q7Model).as("cell"),
          posexplode(col("__iv")).as(Seq("pos", "q")))
        .groupBy("cell", "pos")
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getAs[Int]("cell"))
      q7Model = Model(q7Model.centroids.map { case (cell, prev) =>
        cell -> sums.get(cell).map { rows =>
          val c = prev.clone()
          rows.foreach(r => c(r.getAs[Int]("pos")) =
            r.getAs[Long]("s").toDouble / r.getAs[Long]("n").toDouble)
          c
        }.getOrElse(prev) // empty cell keeps its previous centroid
      })
    }
    iv.unpersist(false)
    Model(q7Model.centroids.map { case (cell, c) =>
      cell -> c.map(_ / 1e7)
    })
  }

  /** Nearest-cell id for a vector column — the native
    * [[graft.functions.NearestCells]] expression over the model's
    * broadcast centroid matrix: a map-side fused-loop projection, no
    * shuffle, no UDF, nothing model-sized in the plan. (The round-4
    * Column-composition form embedded every centroid as plan literals
    * and ran nCells interpreted HOF lambdas per row — it hit a
    * plan-size/CPU wall at realistic nCells ≈ √corpus.)
    */
  def cellOf(vec: org.apache.spark.sql.Column, model: Model): org.apache.spark.sql.Column =
    element_at(cellsOf(vec, model, 1), 1)

  /** The `n` nearest cell ids for a vector column, nearest first —
    * multi-probe assignment (soft blocking): a vector near a cell
    * boundary lands in both cells, so boundary-straddling neighbors
    * still meet. One codegen'd top-n selection pass per row.
    */
  def cellsOf(vec: org.apache.spark.sql.Column, model: Model,
      n: Int): org.apache.spark.sql.Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.NearestCells(
        org.apache.spark.sql.GraftExpressionBridge.expression(vec),
        org.apache.spark.sql.catalyst.expressions.Literal(n),
        model.broadcastCentroids(spark)))
  }

  /** Assign each row to its nearest cell: (idCol, cell, iv). */
  def index(emb: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    emb.select(
      col(idCol),
      cellOf(col(vecCol), model).as("cell"),
      Vectors.intVector(col(vecCol)).as("iv"))

  /** Top-k by exact integer dot over the `nprobe` cells nearest to
    * the query. `index` is the (idCol, cell, iv) frame from [[index]].
    */
  def search(index: DataFrame, idCol: String, model: Model,
      q: Seq[Float], k: Int, nprobe: Int): DataFrame = {
    val cells = model.probeCells(q, nprobe)
    val query = index.sparkSession.range(1).select(
      Vectors.intVector(array(q.map(lit): _*)).as("qv"))
    Vectors.knnDot(
      index.filter(col("cell").isin(cells: _*)), idCol, query, k)
  }

  /** Batch IVF search — the 100-TB ANN query shape: top-k for EACH
    * query in `queries` (qid, qv: ARRAY<FLOAT>) over only that
    * query's `nprobe` nearest cells. Query assignment runs through
    * the SAME native expression as indexing ([[cellsOf]], map-side
    * over the broadcast centroid matrix), candidates come from an
    * equi-join of the (small, broadcast) probed query set against the
    * index on `cell` — partition-pruned when the index parquet is
    * written partitionBy(cell) — and the per-query top-k is the
    * salted two-phase rank, so no reducer ever holds a query's whole
    * candidate set. An index row carries ONE cell, so a (row, query)
    * pair joins at most once — no dedup needed.
    * Returns (qid, idCol, dot, rank), rank 1..k by (dot desc, id asc).
    */
  def searchMany(index: DataFrame, idCol: String, model: Model,
      queries: DataFrame, k: Int, nprobe: Int, nSalts: Int = 16): DataFrame = {
    val probed = queries.select(
      col("qid"), Vectors.intVector(col("qv")).as("qv"),
      explode(cellsOf(col("qv"), model, nprobe)).as("cell"))
    Vectors.topKPerQuery(
      pruneToCells(index, probed).join(broadcast(probed), Seq("cell"))
        .select(col("qid"), col(idCol), Vectors.intDot(col("iv"), col("qv")).as("dot")),
      idCol, k, nSalts)
  }

  /** Restrict `index` to the DISTINCT cells the probed query set
    * touches, as a STATIC `isin` filter. A broadcast equi-join on
    * `cell` alone does NOT prune a `partitionBy(cell)` index's file
    * listing (no static predicate reaches the scan, and dynamic
    * partition pruning declines a filterless local build side) — the
    * executed plan read every cell's files. Collecting the probed
    * cell set is bounded by nCells (the quantizer's size, driver-held
    * anyway), and the literal In predicate lands in the scan's
    * PartitionFilters, so only the probed cells' files are listed and
    * read. IvfSpec pins the pruned file count.
    */
  private def pruneToCells(index: DataFrame, probed: DataFrame): DataFrame = {
    val cells = probed.select("cell").distinct().collect()
      .map(r => Integer.valueOf(r.getInt(0))).toSeq // ≤ nCells rows
    index.filter(col("cell").isin(cells: _*))
  }

  /** Quantized IVF index: (idCol, cell, q8 TINYINT[], scale) — the
    * two-tier 100-TB layout in one table: cell is the partition/
    * bucket key (a probe scans only its cells' files), the int8
    * payload is 4× smaller than float32. Scale materializes BEFORE
    * the quantize lambda references it (the q8Vector contract — an
    * inline q8Scale re-derives the max per element).
    */
  def indexQuantized(emb: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    emb.select(col(idCol), cellOf(col(vecCol), model).as("cell"),
        col(vecCol), Vectors.q8Scale(col(vecCol)).as("scale"))
      .select(col(idCol), col("cell"),
        Vectors.q8Vector(col(vecCol), col("scale")).as("q8"), col("scale"))

  /** Batch quantized IVF search — the full production ANN stack in
    * one plan, closing the round-7 gap where the quantized batch path
    * (`Vectors.knnQuantizedMany`) scanned the ENTIRE int8 index:
    * phase 0 prunes to each query's `nprobe` nearest cells (the same
    * broadcast `nearest_cells` assignment as [[searchMany]] —
    * partition pruning when the index is written partitionBy(cell)),
    * phase 1 ranks the pruned int8 candidates by rescaled quantized
    * dot and keeps `rerankK` per query (salted two-phase rank — no
    * corpus-sized reducer), phase 2 fetches ONLY those candidates
    * from the full-precision store and re-ranks exactly. `queries`
    * carries raw (qid, qv: ARRAY<FLOAT|DOUBLE>); the q8/iv query
    * forms derive inside. Returns (qid, idCol, dot, rank) like
    * [[searchMany]]; at nprobe = nCells it equals the unpruned
    * knnQuantizedMany (IvfSpec pins it).
    */
  def searchManyQuantized(indexQ8: DataFrame, embFull: DataFrame,
      idCol: String, model: Model, queries: DataFrame, k: Int, rerankK: Int,
      nprobe: Int, nSalts: Int = 16): DataFrame = {
    require(rerankK >= k, s"rerankK $rerankK < k $k")
    val probed = broadcast(
      queries.select(col("qid"), col("qv"),
          Vectors.q8Scale(col("qv")).as("qscale"))
        .select(col("qid"),
          Vectors.q8Vector(col("qv"), col("qscale")).cast("array<bigint>").as("qq8"),
          col("qscale"),
          explode(cellsOf(col("qv"), model, nprobe)).as("cell")))
    val cand = Vectors.topKPerQuery(
      pruneToCells(indexQ8, probed).join(probed, Seq("cell"))
        .select(col("qid"), col(idCol),
          (Vectors.intDot(col("q8").cast("array<bigint>"), col("qq8")).cast("double") *
            col("scale") * col("qscale")).as("dot")),
      idCol, rerankK, nSalts)
      .select(col("qid"), col(idCol))
    val qiv = queries.select(col("qid"), Vectors.intVector(col("qv")).as("qiv"))
    Vectors.topKPerQuery(
      embFull.join(broadcast(cand), Seq(idCol))
        .join(broadcast(qiv), Seq("qid"))
        .select(col("qid"), col(idCol),
          Vectors.intDot(col("iv"), col("qiv")).as("dot")),
      idCol, k, nSalts)
  }
}
