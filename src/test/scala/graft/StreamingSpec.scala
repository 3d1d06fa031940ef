package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Incremental

class StreamingSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed counts with watermark aggregate a streamed batch") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = Incremental.windowedCounts(
      in.toDF().toDF("ts", "event_type", "value"))
    val q = agg.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    in.addData(
      (ts("2026-01-01 10:05:00"), "click", 1.0),
      (ts("2026-01-01 10:45:00"), "click", 2.0),
      (ts("2026-01-01 11:05:00"), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("wc")
      .select(col("event_type"), col("n"), col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(rows === Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("streaming dedup drops duplicate content within the watermark horizon") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val deduped = Incremental.dedupStream(
      in.toDF().toDF("doc_id", "ts", "text"))
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    in.addData(
      (1L, ts("2026-01-01 10:00:00"), "the quick brown fox"),
      (2L, ts("2026-01-01 10:01:00"), "THE  quick   Brown FOX"), // normalized dup of 1
      (3L, ts("2026-01-01 10:02:00"), "something else"))
    q.processAllAvailable()
    in.addData((4L, ts("2026-01-01 10:03:00"), "the quick brown fox")) // dup again
    q.processAllAvailable()
    val ids = spark.table("dd").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(ids.intersect(Set(1L, 2L)).size === 1, "one survivor of the in-batch dup pair")
    assert(ids.contains(3L))
    assert(!ids.contains(4L), "cross-batch re-ingest inside the watermark must drop")
  }

  test("incremental postings delta matches the batch index for the same docs") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val delta = Incremental.postingsDelta(in.toDF().toDF("doc_id", "text"))
    val q = delta.writeStream.format("memory").queryName("post")
      .outputMode("complete").start()
    in.addData((1L, "spark spark join"), (2L, "join window"))
    q.processAllAvailable()
    val streamed = spark.table("post").as[(String, Long, Long)].collect().toSet
    q.stop()
    val batch = graft.search.Fts.postings(
      Seq((1L, "spark spark join"), (2L, "join window")).toDF("doc_id", "text"),
      "doc_id", "text").as[(String, Long, Long)].collect().toSet
    assert(streamed === batch, "stream delta and batch index must agree")
    assert(streamed.contains(("spark", 1L, 2L)))
  }

  test("positional postings delta matches the batch phrase index, append-mode") {
    implicit val sq = spark.sqlContext
    val docs = Seq((1L, "big data big data"), (2L, "data big"))
    val in = MemoryStream[(Long, String)]
    val delta = Incremental.positionalPostingsDelta(in.toDF().toDF("doc_id", "text"))
    // stateless per-row transform ⇒ append mode works (no agg state)
    val q = delta.writeStream.format("memory").queryName("ppost")
      .outputMode("append").start()
    in.addData(docs.head)
    q.processAllAvailable()
    in.addData(docs(1))
    q.processAllAvailable()
    val streamed = spark.table("ppost").as[(Long, Int, String)].collect().toSet
    q.stop()
    val batch = graft.search.Fts.positionalPostings(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "pos", "term").as[(Long, Int, String)].collect().toSet
    assert(streamed === batch)
    // the appended index serves phrase queries identically to batch
    // (rebuilt as a plain frame: memory-sink views cannot self-join)
    val ppost = streamed.toSeq.toDF("doc_id", "pos", "term")
    val phrase = graft.search.Fts.phraseMatch(ppost, Seq("big", "data"))
      .as[(Long, Long)].collect().toMap
    assert(phrase === Map(1L -> 2L))
  }

  test("streaming graph ingest: micro-batches upsert into the stored graph") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_graph").toString
    val edgeMeta = Map.empty[String, (String, String)]
    val toGraph = (batch: org.apache.spark.sql.DataFrame) =>
      graft.graph.PropertyGraph(
        nodes = Map("Person" -> batch.toDF("id", "name")), edges = Map.empty)
    val in = MemoryStream[(String, String)]
    val q = in.toDF().writeStream
      .foreachBatch(Incremental.graphUpsertBatch(dir, edgeMeta, toGraph) _)
      .start()
    in.addData(("p1", "Ann"), ("p2", "Bo"))
    q.processAllAvailable()
    // second batch: p2 re-arrives with a contested name (survivor
    // keeps the stored one), p3 is new
    in.addData(("p2", "Robert"), ("p3", "Cyd"))
    q.processAllAvailable()
    q.stop()
    val people = graft.fhir.FhirPipeline.readGraph(spark, dir, edgeMeta)
      .nodes("Person").orderBy("id").as[(String, String)].collect().toSeq
    assert(people === Seq("p1" -> "Ann", "p2" -> "Bo", "p3" -> "Cyd"))
  }

  test("streaming CDC apply: delta batches accumulate into the snapshot; replay is a no-op") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_cdc").toString
    // delta rows: (k, v_old, v_new, change)
    val in = MemoryStream[(Long, Option[Double], Option[Double], String)]
    val q = in.toDF().toDF("k", "v_old", "v_new", "change").writeStream
      .foreachBatch(Incremental.cdcApplyBatch(dir, "k", "v") _)
      .start()
    // batch 1: initial load = adds
    in.addData((1L, None, Some(10.0), "added"), (2L, None, Some(20.0), "added"))
    q.processAllAvailable()
    // batch 2: change 1, remove 2, add 3
    in.addData((1L, Some(10.0), Some(11.0), "changed"),
      (2L, Some(20.0), None, "removed"),
      (3L, None, Some(30.0), "added"))
    q.processAllAvailable()
    q.stop()
    def snap() = spark.read.parquet(s"$dir/snapshot")
      .select("k", "v").as[(Long, Double)].collect().toSet
    assert(snap() === Set(1L -> 11.0, 3L -> 30.0))
    // REPLAY batch 2 (at-least-once): applying the same delta onto the
    // already-applied store must change nothing
    val replay = Seq((1L, Some(10.0), Some(11.0), "changed"),
      (2L, Some(20.0), None, "removed"),
      (3L, None, Some(30.0), "added"))
      .toDF("k", "v_old", "v_new", "change")
    Incremental.cdcApplyBatch(dir, "k", "v")(replay, 99L)
    assert(snap() === Set(1L -> 11.0, 3L -> 30.0), "replayed delta is a no-op")
  }

  test("streaming CDC apply: a one-key delta rewrites exactly its bucket, nothing else") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_bucket").toString
    val nB = 8
    // initial load: 32 keys spread across the 8 buckets
    val init = (0L until 32L).map(k =>
        (k, None: Option[Double], Some(k.toDouble): Option[Double], "added"))
      .toDF("k", "v_old", "v_new", "change")
    Incremental.cdcApplyBatch(dir, "k", "v", nB)(init, 0L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // bucket dir -> its exact part-file names (randomized per write, so
    // an untouched bucket keeps them verbatim; a rewritten one cannot)
    def bucketFiles(): Map[String, Set[String]] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/snapshot"))
        .filter(_.getPath.getName.startsWith("bucket="))
        .map(st => st.getPath.getName ->
          fs.listStatus(st.getPath).map(_.getPath.getName)
            .filter(_.startsWith("part-")).toSet)
        .toMap
    val before = bucketFiles()
    assert(before.size > 1, "test needs keys in more than one bucket")
    val delta = Seq((5L, Some(5.0): Option[Double], Some(99.0): Option[Double], "changed"))
      .toDF("k", "v_old", "v_new", "change")
    Incremental.cdcApplyBatch(dir, "k", "v", nB)(delta, 1L)
    val after = bucketFiles()
    val touched = (before.keySet ++ after.keySet)
      .filter(b => before.get(b) != after.get(b))
    assert(touched.size === 1,
      s"one-key delta must rewrite exactly one bucket, touched: $touched")
    assert(spark.read.parquet(s"$dir/snapshot").select("k", "v")
      .as[(Long, Double)].collect().toSet.contains(5L -> 99.0))
    // the bucket count is pinned at bootstrap: drifting it would strand
    // keys in buckets the pruned read never scans — loud reject
    val e = intercept[IllegalArgumentException] {
      Incremental.cdcApplyBatch(dir, "k", "v", 16)(delta, 2L)
    }
    assert(e.getMessage.contains("nBuckets"))
  }

  test("streaming CDC apply: an empty/unparsable .nbuckets marker re-pins " +
      "instead of wedging the store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_marker").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // crash-mid-create artifact: marker exists but is empty
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/.nbuckets"), true).close()
    val init = Seq((1L, None: Option[Double], Some(1.0): Option[Double], "added"))
      .toDF("k", "v_old", "v_new", "change")
    Incremental.cdcApplyBatch(dir, "k", "v", 8)(init, 0L)
    assert(spark.read.parquet(s"$dir/snapshot").select("k", "v")
      .as[(Long, Double)].collect().toSeq === Seq(1L -> 1.0))
    // and the re-pinned marker now enforces the bucket count
    val e = intercept[IllegalArgumentException] {
      Incremental.cdcApplyBatch(dir, "k", "v", 16)(init, 1L)
    }
    assert(e.getMessage.contains("nBuckets"))
  }

  test("bucketed keyed upsert: survivors keep rows, one-key batch touches one " +
      "bucket, replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_bucket").toString
    val nB = 8
    val init = (0L until 32L).map(k => (k, s"name$k")).toDF("id", "name")
    Incremental.upsertKeyedBatch(dir, Seq("id"), nB)(init, 0L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def bucketFiles(): Map[String, Set[String]] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/snapshot"))
        .filter(_.getPath.getName.startsWith("bucket="))
        .map(st => st.getPath.getName ->
          fs.listStatus(st.getPath).map(_.getPath.getName)
            .filter(_.startsWith("part-")).toSet)
        .toMap
    def snap() = spark.read.parquet(s"$dir/snapshot").select("id", "name")
      .as[(Long, String)].collect().toMap
    val before = bucketFiles()
    // batch 2: key 5 re-arrives CONTESTED (survivor keeps the stored
    // row — first-write), key 100 is new, and 100 appears twice in
    // the batch (intra-batch dedup keeps the first under row order)
    val delta = Seq((5L, "OVERWRITE"), (100L, "aaa"), (100L, "zzz"))
      .toDF("id", "name")
    Incremental.upsertKeyedBatch(dir, Seq("id"), nB)(delta, 1L)
    val after = bucketFiles()
    val touched = (before.keySet ++ after.keySet)
      .filter(b => before.get(b) != after.get(b))
    val expectedBuckets = delta.select(
        pmod(hash(col("id")), lit(nB)).cast("int")).distinct()
      .as[Int].collect().toSet
    assert(touched.size === expectedBuckets.size && touched.size <= 2,
      s"only the delta keys' buckets rewrite, touched: $touched")
    val s = snap()
    assert(s.size === 33)
    assert(s(5L) === "name5", "survivor keeps its stored row (first-write)")
    assert(s(100L) === "aaa", "intra-batch duplicate collapses to the first row")
    // replay batch 2: all keys are survivors now — nothing changes
    Incremental.upsertKeyedBatch(dir, Seq("id"), nB)(delta, 2L)
    assert(snap() === s, "replayed upsert is a no-op")
  }

  test("streaming CDC apply: crash mid-swap recovers — retired buckets restore " +
      "before the replayed batch applies") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_crash").toString
    val nB = 8
    val init = (0L until 32L).map(k =>
        (k, None: Option[Double], Some(k.toDouble): Option[Double], "added"))
      .toDF("k", "v_old", "v_new", "change")
    Incremental.cdcApplyBatch(dir, "k", "v", nB)(init, 0L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // simulate the crash window: bucket retired to .prev, replacement
    // never promoted (the exact state a failure between the two
    // renames leaves behind)
    val buckets = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/snapshot"))
      .map(_.getPath.getName).filter(_.startsWith("bucket=")).sorted
    val victim = buckets.head
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/.prev"))
    require(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/snapshot/$victim"),
      new org.apache.hadoop.fs.Path(s"$dir/.prev/$victim")))
    // replayed batch (at-least-once): touches ONE key; recovery must
    // first restore the victim bucket or its keys would vanish
    val delta = Seq((3L, Some(3.0): Option[Double], Some(99.0): Option[Double], "changed"))
      .toDF("k", "v_old", "v_new", "change")
    Incremental.cdcApplyBatch(dir, "k", "v", nB)(delta, 1L)
    val snap = spark.read.parquet(s"$dir/snapshot").select("k", "v")
      .as[(Long, Double)].collect().toMap
    assert(snap.size === 32, "no keys lost through the crash window")
    assert(snap(3L) === 99.0, "the replayed delta still applied")
    // retired copies are RETAINED until the next apply (they are the
    // mid-swap fallback for swap-safe readers) — but never as holes:
    // every retained .prev bucket must also be live in the snapshot
    val prevP = new org.apache.hadoop.fs.Path(s"$dir/.prev")
    if (fs.exists(prevP))
      for (st <- fs.listStatus(prevP) if st.getPath.getName.startsWith("bucket="))
        assert(fs.exists(new org.apache.hadoop.fs.Path(
          s"$dir/snapshot/${st.getPath.getName}")),
          s"${st.getPath.getName} retained without a live copy")
    // …and the NEXT apply drops the previous batch's retained copies
    // before retiring its own
    val delta2 = Seq((3L, Some(99.0): Option[Double], Some(7.0): Option[Double], "changed"))
      .toDF("k", "v_old", "v_new", "change")
    Incremental.cdcApplyBatch(dir, "k", "v", nB)(delta2, 2L)
    val snap2 = spark.read.parquet(s"$dir/snapshot").select("k", "v")
      .as[(Long, Double)].collect().toMap
    assert(snap2.size === 32 && snap2(3L) === 7.0)
  }

  test("stream-stream interval join matches within the lookback and bounds state") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = Incremental.intervalJoin(
      clicks.toDF().toDF("user_id", "ts", "page"),
      purchases.toDF().toDF("user_id", "ts", "amount"),
      "user_id", lookback = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    purchases.addData(
      (1L, ts("2026-01-01 09:30:00"), 10.0), // 40 min before click — in window
      (1L, ts("2026-01-01 08:00:00"), 99.0), // 2h10m before — outside
      (2L, ts("2026-01-01 09:50:00"), 5.0))  // other user
    clicks.addData((1L, ts("2026-01-01 10:10:00"), "home"))
    q.processAllAvailable()
    val rows = spark.table("ij")
      .select(col("user_id"), col("page"), col("amount_r"))
      .as[(Long, String, Double)].collect().toSeq
    q.stop()
    assert(rows === Seq((1L, "home", 10.0)),
      "only the same-user purchase inside [click - 1h, click] joins")
  }

  test("native session_window streams: the batch sessionize expression runs under a watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val sess = graft.temporal.Sessions.sessionize(
      in.toDF().toDF("user_id", "ts", "value").withWatermark("ts", "1 hour"),
      col("user_id"), col("ts"), "30 minutes")
    val q = sess.writeStream.format("memory").queryName("sw")
      .outputMode("complete").start()
    in.addData(
      (1L, ts("2026-01-01 10:00:00"), 1.0),
      (1L, ts("2026-01-01 10:10:00"), 2.0),
      (2L, ts("2026-01-01 10:00:00"), 8.0))
    q.processAllAvailable()
    in.addData((1L, ts("2026-01-01 11:30:00"), 4.0)) // new session for user 1
    q.processAllAvailable()
    val rows = spark.table("sw")
      .select(col("user_id"), col("session_start"), col("n_events"))
      .as[(Long, Timestamp, Long)].collect().toSet
    q.stop()
    assert(rows === Set(
      (1L, ts("2026-01-01 10:00:00"), 2L),
      (1L, ts("2026-01-01 11:30:00"), 1L),
      (2L, ts("2026-01-01 10:00:00"), 1L)),
      "same Sessions.sessionize expression, streamed — batch/stream unification")
  }

  test("streaming vector ingest: IVF-assigned appends match the batch index under search") {
    implicit val sq = spark.sqlContext
    val emb = graft.core.Tables.embeddings(spark, TestSession.sf0001)
    val model = graft.search.Ivf.fit(emb, "embedding", nCells = 4)
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_vec_ingest").toString
    val in = MemoryStream[(Long, Seq[Float])]
    val q = in.toDF().toDF("id", "vector").writeStream
      .foreachBatch(Incremental.vectorIngestBatch(dir, model, "id", "vector") _)
      .start()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    q.stop()
    // foreachBatch is at-least-once: replaying a batch id must
    // REPLACE its previous attempt, not append duplicates
    Incremental.vectorIngestBatch(dir, model, "id", "vector")(
      b1.toDF("id", "vector"), 0L)
    val store = spark.read.parquet(dir)
    assert(store.count() === rows.length,
      "both micro-batches landed; batch-0 replay did not duplicate")
    // the streamed store answers searches exactly like a batch-built
    // index over the same vectors (same model, same native assignment)
    val qv = rows.head._2
    val viaStream = graft.search.Ivf.search(store, "id", model, qv, 5, nprobe = 2)
      .select("id").as[Long].collect().toSeq
    val batchIdx = graft.search.Ivf.index(emb, "vec_id", "embedding", model)
    val viaBatch = graft.search.Ivf.search(batchIdx, "vec_id", model, qv, 5, nprobe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(viaStream === viaBatch && viaStream.head === rows.head._1)
  }

  test("stateful sessionization folds events per user across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Incremental.Event]
    val sess = Incremental.sessionize(in.toDS(), idleTimeout = None)
    val q = sess.writeStream.format("memory").queryName("sess")
      .outputMode("update").start()
    in.addData(
      Incremental.Event(1L, ts("2026-01-01 10:00:00"), 1.0),
      Incremental.Event(1L, ts("2026-01-01 10:01:00"), 2.0),
      Incremental.Event(2L, ts("2026-01-01 10:00:30"), 10.0))
    q.processAllAvailable()
    in.addData(Incremental.Event(1L, ts("2026-01-01 10:02:00"), 4.0))
    q.processAllAvailable()
    val byUser = spark.table("sess")
      .as[Incremental.SessionUpdate].collect()
      .groupBy(_.user_id).map { case (u, xs) => u -> xs.maxBy(_.nEvents) }
    q.stop()
    assert(byUser(1L).nEvents === 3L && byUser(1L).total === 7.0)
    assert(byUser(2L).nEvents === 1L && byUser(2L).total === 10.0)
    assert(!byUser(1L).closed)
  }

  test("streaming SCD2 closed intervals ≡ batch scd2, across micro-batches") {
    implicit val sq = spark.sqlContext
    val evs = Seq(
      Incremental.AttrEvent(1L, 10L, 1L, "A"),
      Incremental.AttrEvent(1L, 20L, 2L, "A"),
      Incremental.AttrEvent(1L, 30L, 3L, "B"),  // closes A@[10,30)
      Incremental.AttrEvent(2L, 10L, 4L, "X"),
      // second micro-batch (per-key time-ordered feed)
      Incremental.AttrEvent(1L, 40L, 5L, "A"),  // closes B@[30,40)
      Incremental.AttrEvent(2L, 50L, 6L, "Y"))  // closes X@[10,50)
    val in = MemoryStream[Incremental.AttrEvent]
    val q = Incremental.scd2Stream(in.toDS())
      .writeStream.format("memory").queryName("scd2s")
      .outputMode("append").start()
    in.addData(evs.take(4)); q.processAllAvailable()
    in.addData(evs.drop(4)); q.processAllAvailable()
    val streamed = spark.table("scd2s").as[Incremental.Scd2Row]
      .collect().map(r => (r.key, r.attr, r.valid_from, r.valid_to, r.n_events))
      .toSet
    q.stop()
    // the batch operator over the same log: its CLOSED intervals
    // (valid_to defined) must be exactly what the stream emitted
    val batchClosed = graft.temporal.Sessions.scd2(
        evs.toDF(), col("key"), col("ts_us"), col("event_id"), col("attr"))
      .where(col("valid_to").isNotNull)
      .as[(Long, Long, String, Long, Option[Long], Long)].collect()
      .map(r => (r._1, r._3, r._4, r._5, r._6)).toSet
    assert(streamed === batchClosed)
    assert(streamed === Set(
      (1L, "A", 10L, Some(30L), 2L),
      (1L, "B", 30L, Some(40L), 1L),
      (2L, "X", 10L, Some(50L), 1L)))
  }
}
