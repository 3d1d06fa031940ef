package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.TextFunctions

/** Structured Streaming surface. The reference pipeline is batch-only
  * (SURVEY §2.10) — its only concurrency is asyncio fan-out of LLM
  * calls — so nothing here is required for parity; it exists because
  * a 100 TB engine ingests continuously, and the batch operators in
  * this library are deliberately stream-shaped: the inverted index is
  * postings rows (append = union), dedup keys and embeddings are
  * per-row expressions, so the same expressions run under readStream
  * unchanged.
  *
  * Three canonical pieces, each spec-tested with MemoryStream:
  *  - windowed event aggregation with a watermark (late data bounded,
  *    state GC'd — the streaming analog of f7_date_ops);
  *  - incremental postings maintenance (new documents → postings
  *    delta appended to the index table — streaming S8);
  *  - stateful per-user sessionization via mapGroupsWithState (the
  *    KeyValueGroupedDataset custom-state path).
  */
object Incremental {

  /** Watermarked tumbling-window aggregation over an event stream
    * with columns (ts TIMESTAMP, event_type STRING, value DOUBLE).
    * Append-mode compatible: windows close once the watermark passes.
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))

  /** Incremental inverted-index delta: the SAME tokenize+explode+
    * count expressions as the batch Fts.postings, applied to a
    * micro-batch of new documents. Maintaining the index is appending
    * this delta (plus an optional compaction groupBy downstream).
    */
  def postingsDelta(newDocs: DataFrame): DataFrame =
    newDocs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Positional variant (streaming side of Fts.positionalPostings —
    * the phrase-search index): a pure per-row posexplode, so it is
    * stateless and append-mode by construction; maintaining the
    * positional index is appending this delta, same as the tf form.
    */
  def positionalPostingsDelta(newDocs: DataFrame): DataFrame =
    newDocs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))

  /** Stream-stream interval join: left events matched to right
    * events of the same `key` within `[ts - lookback, ts]` — the
    * click↔recent-purchase shape of j8_asof_join, streamed. Both
    * sides carry watermarks so the join state is BOUNDED: Spark
    * buffers only rows inside the watermark horizon and GC's the
    * rest (an unwatermarked stream-stream join grows state forever —
    * the operator the 100-TB continuous-ingest path must never ship).
    * Inner join + time-range condition ⇒ append-mode compatible.
    * Column contract: both frames have (`key`, ts TIMESTAMP) plus
    * payloads; right's columns arrive suffixed `_r`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      lookback: String = "1 hour", wmLeft: String = "1 hour",
      wmRight: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", wmLeft)
    val r0 = right.withWatermark("ts", wmRight)
    val r = r0.columns.foldLeft(r0)((d, c) => d.withColumnRenamed(c, s"${c}_r"))
    l.join(r,
      col(key) === col(s"${key}_r") &&
        col("ts_r") >= col("ts") - expr(s"INTERVAL $lookback") &&
        col("ts_r") <= col("ts"))
  }

  /** Streaming exact dedup (the streaming form of d1_exact_dedup):
    * one row per normalized-content key, duplicate re-ingests dropped.
    * `dropDuplicatesWithinWatermark` bounds the key state to the
    * watermark horizon — a plain dropDuplicates would accrete state
    * forever under continuous ingest, which is exactly the failure
    * mode a 100 TB/day pipeline cannot have. Exactly-once within the
    * horizon; re-ingests older than the watermark are the caller's
    * compaction problem (the batch d1 pass).
    */
  def dedupStream(newDocs: DataFrame, watermark: String = "1 hour"): DataFrame =
    newDocs
      .withColumn("content_key", TextFunctions.contentKey(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_key")

  /** Continuous graph ingest — the streaming face of the S6 store:
    * a `foreachBatch` body that upserts each micro-batch into the
    * stored graph (read → [[graft.fhir.FhirPipeline.upsertGraph]] →
    * staged-swap write). The batch operator IS the streaming
    * operator: survivors keep their properties, new keys append, and
    * a REPLAYED batch is a no-op — which is exactly the idempotence
    * foreachBatch's at-least-once delivery contract requires.
    * `toGraph` shapes a micro-batch into delta node/edge tables
    * (e.g. the FHIR staging transforms).
    *
    * SCALE NOTE: this operator rewrites each table WHOLE per
    * micro-batch — right for the reference-sized graph it serves; a
    * 100-TB continuously-ingested graph store instead runs one
    * [[upsertKeyedBatch]] per node/edge table (keys = id, or
    * src+dst), which rewrites only the key-hash buckets each batch
    * touches (the [[BucketStore]] layout, same first-write-wins
    * semantics).
    *
    * Usage: `stream.writeStream.foreachBatch(
    *   Incremental.graphUpsertBatch(dir, edgeMeta, toGraph) _)`.
    */
  def graphUpsertBatch(
      dir: String, edgeMeta: Map[String, (String, String)],
      toGraph: DataFrame => graft.graph.PropertyGraph)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = toGraph(batch)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val existing =
      if (fs.exists(p) && fs.listStatus(p).nonEmpty)
        graft.fhir.FhirPipeline.readGraph(spark, dir, edgeMeta)
      else graft.graph.PropertyGraph(Map.empty, Map.empty)
    // upsert against the empty graph still normalizes the delta, so
    // the very first batch gets the same intra-batch dedup
    graft.fhir.FhirPipeline.writeGraph(
      graft.fhir.FhirPipeline.upsertGraph(existing, delta), dir)
  }

  /** Streaming vector-store ingest (continuous S7): each micro-batch
    * of (id, vector ARRAY<FLOAT>) rows is IVF-assigned through the
    * SAME native cell expression as batch indexing and APPENDED to a
    * cell-partitioned parquet store — the coarse quantizer stays
    * fixed (re-fitting is an offline rebuild, the standard IVF
    * discipline), so ingest is embarrassingly append-only and
    * `Ivf.search`/`searchMany` over the accumulated store see new
    * vectors immediately with cell partition-pruning intact.
    * REPLAY-SAFE: foreachBatch is at-least-once, so each micro-batch
    * writes (overwrite) its own `batch=<id>` subdirectory — a
    * re-executed batch replaces its previous attempt instead of
    * appending duplicates (same idempotence contract as
    * graphUpsertBatch). Read the store at `dir`; `batch` surfaces as
    * a partition column and cell pruning still applies. Use via
    * `.writeStream.foreachBatch(Incremental.vectorIngestBatch(dir,
    * model, "id", "vector") _)`.
    */
  def vectorIngestBatch(dir: String, model: graft.search.Ivf.Model,
      idCol: String, vecCol: String)(
      batch: DataFrame, batchId: Long): Unit =
    graft.search.Ivf.index(batch, idCol, vecCol, model)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/batch=$batchId")

  /** Continuous CDC application — the streaming face of
    * [[graft.temporal.Cdc.applyDelta]]: each micro-batch of delta
    * rows (key, <value>_old, <value>_new, change) applies onto a
    * KEY-HASH-BUCKETED snapshot store at `dir/snapshot/bucket=N/`.
    * Only the buckets containing delta keys are read (partition-
    * pruned scan) and rewritten (per-bucket rename swap) — a
    * key-count-sized delta against a 100-TB snapshot touches
    * O(delta-buckets) of the store, never the full table, which is
    * the "ship deltas, never re-snapshot" contract of
    * [[graft.temporal.Cdc]] carried through to storage. REPLAY-SAFE
    * under foreachBatch's at-least-once contract because applyDelta
    * is IDEMPOTENT on an already-applied store: removed keys are
    * already absent (the anti join no-ops), added/changed keys upsert
    * the same value again. An empty/missing store bootstraps from the
    * delta's added rows — a CDC feed's initial load IS a batch of
    * adds.
    *
    * Crash safety is per bucket: affected-bucket output is staged to
    * `.staging` first (the write's input buckets are untouched — no
    * checkpoint needed), then each affected bucket is retired to
    * `.prev` and its staged replacement promoted by rename. On entry,
    * any `.prev` bucket missing from the snapshot (crash mid-swap) is
    * restored before applying, so a replayed batch re-applies onto
    * the pre-batch state instead of truncating it.
    *
    * `nBuckets` is FIXED at bootstrap (recorded in a `.nbuckets`
    * marker and validated every batch — a changed bucket count would
    * silently strand keys in unread buckets; a LOST marker is
    * re-pinned only after the layout+rehash probe passes). SINGLE
    * WRITER assumed (foreachBatch provides it); concurrent external
    * readers use [[readKeyedStore]] (manifest-resolved, never misses
    * a bucket mid-swap) — the direct `dir/snapshot` parquet read
    * stays valid between applies. Usage:
    * `deltas.writeStream.foreachBatch(
    * Incremental.cdcApplyBatch(dir, "k", "v") _)`; the accumulated
    * snapshot reads back as parquet with `bucket` as a partition
    * column, and the stored history feeds
    * [[graft.temporal.Sessions.scd2]] (the x9 interval shape).
    */
  def cdcApplyBatch(dir: String, key: String, value: String,
      nBuckets: Int = 256)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    BucketStore.applyKeyed(dir, Seq(key), nBuckets, batch,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(key,
            batch.schema(key).dataType),
          org.apache.spark.sql.types.StructField(value,
            batch.schema(s"${value}_new").dataType))))) {
      (base, delta) => graft.temporal.Cdc.applyDelta(base, delta, key, value)
    }
  }

  /** Continuous keyed-table upsert with BUCKETED rewrites — the
    * first-write-wins MERGE primitive ([[graft.fhir.FhirPipeline
    * .upsertGraph]]'s per-table semantics: survivors keep their
    * stored row, new keys append, intra-batch duplicates collapse
    * deterministically to the first row under whole-row order) on
    * the [[BucketStore]] layout, so each micro-batch rewrites only
    * the buckets containing its keys — the 100-TB shape of
    * [[graphUpsertBatch]], which rewrites every table whole per
    * batch: a bucketed graph store runs one of these per node/edge
    * table (keys = id, or src+dst). REPLAY-SAFE: an already-applied
    * key is a survivor, so the anti join drops its re-ingest.
    * Read the table back at `dir/snapshot` (bucket is a partition
    * column).
    */
  def upsertKeyedBatch(dir: String, keys: Seq[String], nBuckets: Int = 256)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    BucketStore.applyKeyed(dir, keys, nBuckets, batch,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)) {
      (base, delta) =>
        // deterministic intra-batch dedup: first row per key under
        // whole-row order (the upsertGraph norm discipline)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(delta.columns.map(col).toIndexedSeq: _*)
        val d = delta.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        base.unionByName(
          d.join(base.select(keys.map(col): _*), keys, "left_anti"))
    }
  }

  /** Swap-safe read of a [[BucketStore]]-backed table ([[cdcApplyBatch]]
    * / [[upsertKeyedBatch]] stores): resolves the atomically-published
    * manifest, falling back per bucket to the retained pre-swap copy,
    * so a reader concurrent with an apply always sees a COMPLETE
    * bucket set (the direct `dir/snapshot` read can transiently miss
    * a bucket mid-promotion). Returns rows without the `bucket`
    * partition column.
    */
  def readKeyedStore(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = BucketStore.read(spark, dir)

  /** One-time migration of a legacy FLAT keyed store (plain parquet
    * under `dir/snapshot`) into the bucketed [[BucketStore]] layout —
    * the rewrite the legacy-store reject in [[cdcApplyBatch]] /
    * [[upsertKeyedBatch]] asks for. Crash-safe (re-run on failure);
    * no-op but marker/manifest-healing on an already-bucketed store.
    */
  def migrateKeyedStore(spark: org.apache.spark.sql.SparkSession,
      dir: String, keys: Seq[String], nBuckets: Int = 256): Unit =
    BucketStore.migrate(spark, dir, keys, nBuckets)

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(nEvents: Long, total: Double)
  case class SessionUpdate(user_id: Long, nEvents: Long, total: Double, closed: Boolean)

  case class AttrEvent(key: Long, ts_us: Long, event_id: Long, attr: String)
  case class Scd2State(attr: String, validFrom: Long, nEvents: Long)
  case class Scd2Row(key: Long, attr: String, valid_from: Long,
      valid_to: Option[Long], n_events: Long)

  /** Streaming SCD2 — the continuous face of
    * [[graft.temporal.Sessions.scd2]]: per-key attr runs compacted to
    * validity intervals as events arrive. Each value CHANGE closes
    * the open run and emits its interval (valid_to = the new run's
    * start); the open run lives in per-key state, exactly one
    * `Scd2State` per key — state is O(keys), never O(events).
    * Emitted (closed) intervals are append-mode by construction.
    *
    * Within a micro-batch events sort by (ts_us, event_id) — arrival
    * order inside a batch is not time order. ACROSS batches the
    * contract is a per-key time-ordered feed (a CDC/changelog source,
    * the shape this operator exists for); an out-of-order straggler
    * that lands after its run closed would open a spurious run, which
    * the batch [[graft.temporal.Sessions.scd2]] pass over the stored
    * log is the compaction answer to (same division of labor as
    * dedupStream vs d1).
    */
  def scd2Stream(events: Dataset[AttrEvent]): Dataset[Scd2Row] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Scd2State, Scd2Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[AttrEvent], state: GroupState[Scd2State]) =>
          val evs = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val out = Seq.newBuilder[Scd2Row]
          var st = state.getOption.orNull
          for (e <- evs) {
            if (st == null)
              st = Scd2State(e.attr, e.ts_us, 1L)
            else if (st.attr == e.attr)
              st = st.copy(nEvents = st.nEvents + 1)
            else {
              out += Scd2Row(key, st.attr, st.validFrom, Some(e.ts_us), st.nEvents)
              st = Scd2State(e.attr, e.ts_us, 1L)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Per-user running session state via mapGroupsWithState: each
    * micro-batch folds new events into the state. With
    * `idleTimeout = Some(d)` an idle processing-time timeout emits
    * the session as closed and clears state (note: timeout-driven
    * batches fire on a timer, so `processAllAvailable` never drains —
    * production queries use a trigger; tests use `None`).
    */
  def sessionize(events: Dataset[Event],
      idleTimeout: Option[String] = Some("30 minutes")): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val mode = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](mode) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionUpdate(user, s.nEvents, s.total, closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
            val evs = batch.toSeq
            val next = SessionState(prev.nEvents + evs.size, prev.total + evs.map(_.value).sum)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            SessionUpdate(user, next.nEvents, next.total, closed = false)
          }
      }
  }
}
