package graft

import org.apache.spark.sql.functions._

import graft.search.{Ivf, Vectors}

/** Learned IVF index: coarse-quantizer fit, cell assignment, and
  * nprobe search semantics against the brute-force baseline.
  */
class IvfSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private val NCells = 8
  private lazy val emb = graft.core.Tables.embeddings(spark, sf)
  private lazy val model = Ivf.fit(emb, "embedding", NCells)
  private lazy val idx = Ivf.index(emb, "vec_id", "embedding", model)
    .persist()
  private lazy val q: Seq[Float] = emb.orderBy("vec_id")
    .select("embedding").as[Seq[Float]].head()

  private def brute(k: Int): Seq[(Long, Long)] = {
    val query = spark.range(1)
      .select(Vectors.intVector(array(q.map(lit): _*)).as("qv"))
    Vectors.knnDot(
      emb.select(col("vec_id"), Vectors.intVector(col("embedding")).as("iv")),
      "vec_id", query, k).as[(Long, Long)].collect().toSeq
  }

  test("index covers the corpus; every cell id is a trained centroid") {
    assert(idx.count() === emb.count())
    val cells = idx.select("cell").distinct().as[Int].collect().toSet
    assert(cells.subsetOf(model.centroids.map(_._1).toSet))
    assert(cells.size >= 2, "a degenerate one-cell quantizer prunes nothing")
  }

  test("nprobe = nCells degrades to exact brute force") {
    val full = Ivf.search(idx, "vec_id", model, q, 10, NCells)
      .as[(Long, Long)].collect().toSeq
    assert(full === brute(10))
  }

  test("recall is monotone in nprobe; probed search returns only probed cells") {
    val gold = brute(10).map(_._1).toSet
    def recall(nprobe: Int): Double = {
      val got = Ivf.search(idx, "vec_id", model, q, 10, nprobe)
        .as[(Long, Long)].collect().map(_._1).toSet
      got.intersect(gold).size.toDouble / gold.size
    }
    val r1 = recall(1); val r4 = recall(4); val r8 = recall(NCells)
    assert(r1 <= r4 && r4 <= r8, s"recall must grow with nprobe: $r1 $r4 $r8")
    assert(r8 === 1.0)
    // pruning actually prunes: nprobe=1 scans exactly one cell
    val probed = model.probeCells(q, 1).toSet
    val scanned = Ivf.search(idx.withColumn("c2", col("cell")), "vec_id", model, q, 10, 1)
    assert(probed.size === 1)
    val cellsInIdx = idx.filter(col("cell").isin(probed.toSeq: _*)).count()
    assert(cellsInIdx < emb.count(), "probing one cell must scan a strict subset")
    assert(scanned.count() <= math.min(10, cellsInIdx))
  }

  test("index written partitionBy(cell) gives partition-pruned probes") {
    // the 100-TB layout: one directory per cell; an nprobe search
    // reads only its probed cells' files, enforced by the planner
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    try {
      idx.write.mode("overwrite").partitionBy("cell").parquet(dir)
      val back = spark.read.parquet(dir)
      val probed = model.probeCells(q, 1)
      val plan = back.filter(col("cell").isin(probed: _*))
        .queryExecution.executedPlan.toString
      val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
        .getOrElse(fail(s"no PartitionFilters in:\n$plan"))
      assert(pf.contains("cell"), s"cell predicate must prune partitions: $pf")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("searchManyQuantized on a partitionBy(cell) index prunes the file " +
      "listing to the probed cells — the executed-plan proof") {
    // the round-8 claim, now enforced in the operator: a broadcast
    // equi-join on cell alone never pruned (PartitionFilters was just
    // isnotnull) — the static probed-cell isin must land in the scan
    val dir = java.nio.file.Files.createTempDirectory("ivf_q8_idx").toString
    try {
      Ivf.indexQuantized(emb, "vec_id", "embedding", model)
        .write.mode("overwrite").partitionBy("cell").parquet(dir)
      val back = spark.read.parquet(dir)
      val queries = Seq((1L, q)).toDF("qid", "qv")
      val res = Ivf.searchManyQuantized(back, idx, "vec_id", model,
        queries, k = 5, rerankK = 10, nprobe = 2)
      res.collect()
      val scanLine = res.queryExecution.executedPlan.toString.linesIterator
        .find(l => l.contains("FileScan") && l.contains("ivf_q8_idx"))
        .getOrElse(fail("no FileScan over the quantized index in the executed plan"))
      assert(scanLine.contains("cell") && scanLine.contains(" IN "),
        s"probed-cell IN predicate must reach PartitionFilters: $scanLine")
      // and the pruned result is still the right one: equals the
      // unpruned search restricted to the probed cells
      val probedCells = model.probeCells(q, 2).toSet
      val cellsRead = back
        .filter(col("cell").isin(probedCells.toSeq: _*))
        .select("cell").distinct().as[Int].collect().toSet
      assert(cellsRead === probedCells.intersect(
        back.select("cell").distinct().as[Int].collect().toSet))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("probeCells is deterministic and distance-ordered") {
    val all = model.probeCells(q, NCells)
    assert(all.distinct.size === all.size)
    assert(model.probeCells(q, 2) === all.take(2))
  }

  test("cellsOf (native expression) matches the driver-side quantizer math") {
    val rows = emb.limit(64)
      .select(col("vec_id"), col("embedding"),
        Ivf.cellsOf(col("embedding"), model, 3).as("cells"))
      .as[(Long, Seq[Float], Seq[Int])].collect()
    assert(rows.nonEmpty)
    for ((id, v, cells) <- rows)
      assert(cells === model.probeCells(v, 3), s"vec $id")
    // cellOf = first probe
    val firsts = emb.limit(64)
      .select(col("embedding"), Ivf.cellOf(col("embedding"), model).as("c"))
      .as[(Seq[Float], Int)].collect()
    for ((v, c) <- firsts) assert(c === model.probeCells(v, 1).head)
  }

  test("knnDotMany (salted two-phase) equals per-query knnDot exactly") {
    val iv = emb.select(col("vec_id"), Vectors.intVector(col("embedding")).as("iv"))
      .persist()
    try {
      val qs = iv.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("iv").as("qv"))
      val batch = Vectors.knnDotMany(iv, "vec_id", qs, 7, nSalts = 4)
        .select("qid", "vec_id", "dot", "rank")
        .as[(Long, Long, Long, Int)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(t => (t._2, t._3)).toSeq).toMap
      for (q <- 0L until 3L) {
        val single = Vectors.knnDot(
          iv, "vec_id",
          iv.filter(col("vec_id") === q).select(col("iv").as("qv")), 7)
          .as[(Long, Long)].collect().toSeq
        assert(batch(q) === single, s"query $q diverges from the unsalted baseline")
      }
    } finally iv.unpersist()
  }

  test("searchMany at nprobe=nCells equals the exact batch KNN") {
    val fq = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val full = Ivf.searchMany(idx, "vec_id", model, fq, 5, NCells)
      .as[(Long, Long, Long, Int)].collect().sorted.toSeq
    val iv = emb.select(col("vec_id"), Vectors.intVector(col("embedding")).as("iv"))
    val ivq = iv.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("iv").as("qv"))
    val exact = Vectors.knnDotMany(iv, "vec_id", ivq, 5)
      .as[(Long, Long, Long, Int)].collect().sorted.toSeq
    assert(full === exact)
  }

  test("searchMany nprobe=1 returns only each query's probed cell") {
    val fq = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = Ivf.searchMany(idx, "vec_id", model, fq, 5, 1)
      .select("qid", "vec_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    val cellOfId = idx.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val qVecs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    for ((qid, id) <- got)
      assert(cellOfId(id) === model.probeCells(qVecs(qid), 1).head,
        s"result $id outside query $qid's probed cell")
  }

  test("a NaN vector assigns to NO cell (empty array), never duplicates") {
    val bad = Seq((1L, Seq(Float.NaN, 1.0f)), (2L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val m = Ivf.Model(Array(
      (0, Array(0.0, 0.0)), (1, Array(1.0, 1.0))))
    val got = bad.select(col("vec_id"),
      Ivf.cellsOf(col("embedding"), m, 2).as("cells"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got(1L) === Seq.empty, "all-NaN distances must yield no cells")
    assert(got(2L).length === 2 && got(2L).distinct.length === 2)
  }

  test("fitExact: bit-identical model under different partitionings") {
    // the property Spark ML's sampled k-means|| cannot give: exact
    // integer component sums make training independent of partition
    // count and row order — the reproducible-artifact contract
    val m1 = Ivf.fitExact(emb, "vec_id", "embedding", nCells = 4, iters = 2)
    val m8 = Ivf.fitExact(emb.repartition(8), "vec_id", "embedding",
      nCells = 4, iters = 2)
    assert(m1.centroids.map(_._1).toSeq === m8.centroids.map(_._1).toSeq)
    for (((_, a), (_, b)) <- m1.centroids.zip(m8.centroids))
      assert(a.toSeq === b.toSeq, "centroids must be bit-identical")
  }

  test("fitExact + searchMany at nprobe=nCells equals the exact batch KNN") {
    val m = Ivf.fitExact(emb, "vec_id", "embedding", nCells = 4, iters = 2)
    val ix = Ivf.index(emb, "vec_id", "embedding", m)
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = Ivf.searchMany(ix, "vec_id", m, qs, k = 5, nprobe = 4)
      .select("qid", "vec_id", "dot", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val iv = emb.select(col("vec_id"), Vectors.intVector(col("embedding")).as("iv"))
    val exact = Vectors.knnDotMany(iv, "vec_id",
        iv.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("iv").as("qv")),
        k = 5)
      .select("qid", "vec_id", "dot", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got === exact)
  }

  test("searchManyQuantized at nprobe=nCells equals the unpruned quantized batch") {
    val m = Ivf.fitExact(emb, "vec_id", "embedding", nCells = 4, iters = 2)
    val ixQ8 = Ivf.indexQuantized(emb, "vec_id", "embedding", m)
    val full = emb.select(col("vec_id"), Vectors.intVector(col("embedding")).as("iv"))
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = Ivf.searchManyQuantized(ixQ8, full, "vec_id", m, qs,
        k = 5, rerankK = 20, nprobe = 4)
      .select("qid", "vec_id", "dot", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    // unpruned reference: Vectors.knnQuantizedMany over the same index
    // content (cell column dropped) and the same derived query forms
    val q8idx = ixQ8.select(col("vec_id"), col("q8"), col("scale"))
    val qForms = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"),
        Vectors.q8Scale(col("embedding")).as("qscale"),
        Vectors.intVector(col("embedding")).as("qv"))
      .select(col("vec_id").as("qid"),
        Vectors.q8Vector(col("embedding"), col("qscale"))
          .cast("array<bigint>").as("qq8"),
        col("qscale"), col("qv"))
    val unpruned = Vectors.knnQuantizedMany(q8idx, full, "vec_id", qForms,
        k = 5, rerankK = 20)
      .select("qid", "vec_id", "dot", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got === unpruned)
  }

  test("assignment plan is O(1) in nCells — the model rides a broadcast") {
    // the round-4 literal-centroid form grew the plan by
    // O(nCells · dim) literal nodes; the native expression keeps the
    // plan constant-size no matter how fine the quantizer is
    def planLen(n: Int): Int = {
      val m = Ivf.Model(Array.tabulate(n)(i =>
        (i, Array.tabulate(16)(d => (i * 16 + d).toDouble))))
      emb.select(Ivf.cellsOf(col("embedding"), m, 2).as("c"))
        .queryExecution.optimizedPlan.toString.length
    }
    val l16 = planLen(16)
    val l256 = planLen(256)
    assert(math.abs(l16 - l256) < 64,
      s"plan size must not grow with nCells: $l16 vs $l256")
  }
}
