package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-hash-bucketed keyed store: the shared machinery behind every
  * continuously-maintained table in this library (CDC snapshots,
  * keyed upsert stores). Layout: `dir/snapshot/bucket=N/…parquet`,
  * `bucket = pmod(hash(keys…), nBuckets)`. Per delta application
  * only the buckets CONTAINING delta keys are read (partition-pruned
  * scan) and rewritten (per-bucket rename swap) — a key-count-sized
  * delta against a 100-TB store touches O(delta-buckets), never the
  * full table.
  *
  * Durability contract (shared by every caller):
  *  - `nBuckets` is pinned at bootstrap in a `.nbuckets` marker
  *    (temp-then-rename) and validated every batch — drift would
  *    strand keys in buckets the pruned read never scans. A LOST or
  *    unparsable marker next to an existing bucketed snapshot does
  *    NOT silently re-pin the caller's count: the layout's bucket
  *    indices must fit it AND one existing bucket's keys must re-hash
  *    into their bucket under it (a real consistency probe — a
  *    256-vs-512 mismatch fails it loudly) before the marker is
  *    re-created.
  *  - Affected-bucket output stages under `.staging` (never the live
  *    tree) and must land ONLY in affected buckets — a merge that
  *    rewrites key columns would otherwise drop rows silently, so a
  *    staged bucket outside the affected set fails loudly.
  *  - Each affected bucket is retired to `.prev` and its staged
  *    replacement promoted by rename; a bucket emptied by the merge
  *    is simply retired. On entry any `.prev` bucket missing from the
  *    snapshot (crash mid-swap) is restored FIRST, so a replayed
  *    batch re-applies onto the pre-batch state. Retired copies are
  *    RETAINED until the next apply (not deleted at batch end): they
  *    are what keeps concurrent readers whole (below).
  *  - Replay safety is the MERGE's obligation: `merge(base, delta)`
  *    must be idempotent on an already-applied base (anti-join
  *    upserts and CDC deltas both are).
  *
  * SINGLE WRITER assumed (foreachBatch provides it). Concurrent
  * READERS have two surfaces:
  *  - `spark.read.parquet(dir/snapshot)` — the quiescent read (tests,
  *    batch jobs between applies). Mid-swap it can transiently miss a
  *    bucket being promoted.
  *  - [[read]] — the swap-safe read: resolves the atomically-renamed
  *    `.manifest` (written after every apply) and, per bucket,
  *    prefers the live `snapshot/bucket=N`, falling back to the
  *    retained `.prev/bucket=N` mid-swap — every instant resolves a
  *    COMPLETE bucket set (affected buckets may mix pre/post-batch
  *    content across buckets mid-swap, the same partial-progress a
  *    reader between micro-batches already observes; within a bucket
  *    the view is always a whole pre- or post-batch copy).
  */
private[streaming] object BucketStore {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Atomic small-file publication: write tmp, rename over. */
  private def writeAtomic(fs: FileSystem, target: Path, text: String): Unit = {
    val tmp = new Path(target.getParent, target.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    fs.delete(target, false)
    require(fs.rename(tmp, target), s"rename $tmp -> $target failed")
  }

  private def readSmall(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in).mkString)
      finally in.close()
    }

  private def bucketDirs(fs: FileSystem, p: Path): Seq[String] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("bucket=")).toSeq.sorted

  /** Validate a caller-pinned `nBuckets` against an existing bucketed
    * snapshot whose `.nbuckets` marker was lost: every on-disk bucket
    * index must fit, and the keys of one existing bucket must re-hash
    * into their own bucket — a wrong count (e.g. a default after a
    * manual migration at another count) fails the probe loudly
    * instead of silently stranding keys in never-scanned buckets.
    */
  private def validateLayout(spark: SparkSession, fs: FileSystem,
      snap: Path, keys: Seq[String], nBuckets: Int): Unit = {
    val dirs = bucketDirs(fs, snap)
    if (dirs.isEmpty) return
    val idxs = dirs.map(_.stripPrefix("bucket=").toInt)
    require(idxs.max < nBuckets,
      s"store at $snap has bucket=${idxs.max} on disk but nBuckets=" +
        s"$nBuckets was given after its .nbuckets marker was lost — " +
        "restore the marker or pass the original bucket count")
    val probe = idxs.min
    val bad = spark.read.parquet(s"$snap/bucket=$probe")
      .where(pmod(hash(keys.map(col): _*), lit(nBuckets)).cast("int") =!= probe)
      .limit(1).count()
    require(bad == 0,
      s"store at $snap: keys in bucket=$probe do not re-hash into it " +
        s"under nBuckets=$nBuckets — the marker was lost and this count " +
        "is wrong; pass the original bucket count")
  }

  /** Apply one keyed delta onto the store at `dir`:
    * read affected buckets → `merge(base, delta)` → rewrite exactly
    * those buckets. `emptyBase` supplies the store schema when the
    * store does not exist yet (bootstrap). The delta must carry the
    * key columns; `merge`'s output must carry the full store row
    * (keys included, key VALUES unchanged — rows re-keyed into
    * unaffected buckets are rejected loudly, see the contract).
    */
  def applyKeyed(dir: String, keys: Seq[String], nBuckets: Int,
      delta: DataFrame, emptyBase: => DataFrame)(
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    require(keys.nonEmpty, "need at least one key column")
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val spark = delta.sparkSession
    val fs = fsOf(spark, dir)
    val snap = new Path(s"$dir/snapshot")
    val prev = new Path(s"$dir/.prev")
    val stage = new Path(s"$dir/.staging")
    val marker = new Path(s"$dir/.nbuckets")
    // pin the bucket count (atomic write; unparsable reads as absent —
    // but absent-with-existing-snapshot must pass the layout probe
    // before re-pinning: silently trusting the argument would strand
    // keys if it differs from the count the store was built with)
    readSmall(fs, marker).map(_.trim).flatMap(_.toIntOption) match {
      case Some(n) =>
        require(n == nBuckets,
          s"store at $dir was bucketed with nBuckets=$n, got $nBuckets")
      case None =>
        validateLayout(spark, fs, snap, keys, nBuckets)
        writeAtomic(fs, marker, nBuckets.toString)
    }
    // crash recovery: restore every .prev bucket the snapshot lacks
    // FIRST, or the replayed batch would apply onto a hole and
    // truncate those buckets to the delta's own keys. A .prev left by
    // a COMPLETED apply (retained for swap-safe readers) has every
    // bucket present in the snapshot, so nothing restores — it is
    // simply dropped here, at the start of the NEXT apply, after its
    // readers' inter-batch window has passed.
    if (fs.exists(prev)) {
      for (st <- fs.listStatus(prev) if st.getPath.getName.startsWith("bucket=")) {
        val dst = new Path(snap, st.getPath.getName)
        if (!fs.exists(dst)) {
          fs.mkdirs(snap)
          require(fs.rename(st.getPath, dst),
            s"recovery rename ${st.getPath} -> $dst failed")
        }
      }
      fs.delete(prev, true)
    }
    fs.delete(stage, true) // stale partial staging from a crashed write
    val bucketOf = pmod(hash(keys.map(col): _*), lit(nBuckets)).cast("int")
    val affected = delta.select(bucketOf.as("bucket"))
      .distinct().collect().map(_.getInt(0)).sorted // bounded by nBuckets
    if (affected.isEmpty) { publishManifest(fs, dir, snap, nBuckets); return }
    val base =
      if (fs.exists(snap) && fs.listStatus(snap).nonEmpty) {
        require(fs.listStatus(snap).exists(
            _.getPath.getName.startsWith("bucket=")),
          s"snapshot at $snap is not bucket-partitioned (legacy flat " +
            "store) — run BucketStore.migrate(dir, keys, nBuckets) once " +
            "before streaming resumes")
        spark.read.parquet(snap.toString)
          .where(col("bucket").isin(affected.map(Integer.valueOf).toSeq: _*))
          .drop("bucket") // partition-pruned: only affected buckets scan
      } else emptyBase
    merge(base, delta)
      .withColumn("bucket", bucketOf)
      .write.mode("overwrite").partitionBy("bucket").parquet(stage.toString)
    // the staged output must be a subset of the affected buckets: the
    // swap below promotes ONLY affected buckets, so a merge that
    // re-keyed rows into other buckets would stage them and then
    // silently drop them — fail loudly instead
    val staged = bucketDirs(fs, stage).map(_.stripPrefix("bucket=").toInt)
    val strays = staged.filterNot(affected.contains(_))
    require(strays.isEmpty,
      s"merge() emitted rows hashing into unaffected bucket(s) " +
        s"${strays.mkString(", ")} — merges must not rewrite key columns")
    // per-bucket swap: retire the live bucket to .prev (never delete-
    // then-rename — that window loses the bucket on a crash), promote
    // the staged replacement (absent when the merge emptied the
    // bucket). Retired copies are KEPT until the next apply: they are
    // the mid-swap fallback for [[read]].
    fs.mkdirs(prev); fs.mkdirs(snap)
    for (b <- affected) {
      val live = new Path(snap, s"bucket=$b")
      val stagedB = new Path(stage, s"bucket=$b")
      if (fs.exists(live))
        require(fs.rename(live, new Path(prev, s"bucket=$b")),
          s"rename $live -> $prev failed")
      if (fs.exists(stagedB))
        require(fs.rename(stagedB, live), s"rename $stagedB -> $live failed")
    }
    fs.delete(stage, true)
    publishManifest(fs, dir, snap, nBuckets)
  }

  /** Publish `.manifest` (atomic rename): the live bucket names, one
    * per line, after a header line with the bucket count. Written
    * after every apply; [[read]] resolves it.
    */
  private def publishManifest(fs: FileSystem, dir: String, snap: Path,
      nBuckets: Int): Unit =
    writeAtomic(fs, new Path(s"$dir/.manifest"),
      (s"nbuckets=$nBuckets" +: bucketDirs(fs, snap)).mkString("\n"))

  /** Swap-safe read of the store's current state: resolve the
    * atomically-published `.manifest`, then per listed bucket prefer
    * the live `snapshot/bucket=N`, falling back to the retained
    * `.prev/bucket=N` mid-swap — a complete bucket set at every
    * instant (the documented transient-miss window of the direct
    * `dir/snapshot` read does not exist on this path). Returns the
    * store rows WITHOUT the `bucket` partition column. Falls back to
    * the direct snapshot read when no manifest exists yet (store
    * written by a pre-manifest version — any apply publishes one).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val fs = fsOf(spark, dir)
    val snap = new Path(s"$dir/snapshot")
    readSmall(fs, new Path(s"$dir/.manifest")) match {
      case None => spark.read.parquet(snap.toString).drop("bucket")
      case Some(text) =>
        val names = text.split("\n").map(_.trim)
          .filter(_.startsWith("bucket=")).toSeq
        if (names.isEmpty) spark.read.parquet(snap.toString).drop("bucket")
        else {
          val paths = names.map { n =>
            val live = new Path(snap, n)
            if (fs.exists(live)) live.toString
            else {
              val retired = new Path(s"$dir/.prev/$n")
              require(fs.exists(retired),
                s"manifest lists $n but neither $live nor $retired exists")
              retired.toString
            }
          }
          spark.read.parquet(paths: _*)
        }
    }
  }

  /** One-time migration of a legacy FLAT store (plain parquet files
    * under `dir/snapshot`, the pre-bucketed layout) into the bucketed
    * layout this store requires: rewrite partitioned by
    * `pmod(hash(keys), nBuckets)`, pin the marker, publish the
    * manifest. Crash-safe: the flat snapshot is retired to `.legacy`
    * only after the bucketed rewrite staged completely, and a crash
    * between the two renames is recovered by re-running migrate (it
    * restores `.legacy` first). No-op (with a count check) if the
    * store is already bucketed.
    */
  def migrate(spark: SparkSession, dir: String, keys: Seq[String],
      nBuckets: Int): Unit = {
    require(keys.nonEmpty, "need at least one key column")
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val fs = fsOf(spark, dir)
    val snap = new Path(s"$dir/snapshot")
    val legacy = new Path(s"$dir/.legacy")
    val stage = new Path(s"$dir/.staging-migrate")
    // crash recovery: a previous migrate renamed the flat snapshot to
    // .legacy but died before promoting the staged rewrite — put the
    // flat store back and redo the rewrite from it
    if (fs.exists(legacy) && !fs.exists(snap))
      require(fs.rename(legacy, snap), s"recovery rename $legacy -> $snap failed")
    fs.delete(stage, true)
    require(fs.exists(snap) && fs.listStatus(snap).nonEmpty,
      s"no store to migrate at $snap")
    if (bucketDirs(fs, snap).nonEmpty) {
      // already bucketed: just make sure marker/manifest agree
      val marker = new Path(s"$dir/.nbuckets")
      readSmall(fs, marker).map(_.trim).flatMap(_.toIntOption) match {
        case Some(n) => require(n == nBuckets,
          s"store at $dir already bucketed with nBuckets=$n, got $nBuckets")
        case None =>
          validateLayout(spark, fs, snap, keys, nBuckets)
          writeAtomic(fs, marker, nBuckets.toString)
      }
      publishManifest(fs, dir, snap, nBuckets)
      return
    }
    val bucketOf = pmod(hash(keys.map(col): _*), lit(nBuckets)).cast("int")
    spark.read.parquet(snap.toString)
      .withColumn("bucket", bucketOf)
      .write.mode("overwrite").partitionBy("bucket").parquet(stage.toString)
    require(fs.rename(snap, legacy), s"rename $snap -> $legacy failed")
    require(fs.rename(stage, snap), s"rename $stage -> $snap failed")
    writeAtomic(fs, new Path(s"$dir/.nbuckets"), nBuckets.toString)
    publishManifest(fs, dir, snap, nBuckets)
    fs.delete(legacy, true)
  }
}
