package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
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
  *    (temp-then-rename; an empty/unparsable marker reads as absent
  *    and re-pins) and validated every batch — drift would strand
  *    keys in buckets the pruned read never scans.
  *  - Affected-bucket output stages under `.staging` (never the live
  *    tree), then each affected bucket is retired to `.prev` and its
  *    staged replacement promoted by rename; a bucket emptied by the
  *    merge is simply retired. On entry any `.prev` bucket missing
  *    from the snapshot (crash mid-swap) is restored FIRST, so a
  *    replayed batch re-applies onto the pre-batch state.
  *  - Replay safety is the MERGE's obligation: `merge(base, delta)`
  *    must be idempotent on an already-applied base (anti-join
  *    upserts and CDC deltas both are).
  *
  * SINGLE WRITER assumed (foreachBatch provides it); a concurrent
  * external reader may transiently miss an affected bucket
  * mid-promotion and should retry — unaffected buckets are never
  * disturbed.
  */
private[streaming] object BucketStore {

  /** Apply one keyed delta onto the store at `dir`:
    * read affected buckets → `merge(base, delta)` → rewrite exactly
    * those buckets. `emptyBase` supplies the store schema when the
    * store does not exist yet (bootstrap). The delta must carry the
    * key columns; `merge`'s output must carry the full store row
    * (keys included).
    */
  def applyKeyed(dir: String, keys: Seq[String], nBuckets: Int,
      delta: DataFrame, emptyBase: => DataFrame)(
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    require(keys.nonEmpty, "need at least one key column")
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val spark = delta.sparkSession
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val snap = new Path(s"$dir/snapshot")
    val prev = new Path(s"$dir/.prev")
    val stage = new Path(s"$dir/.staging")
    val marker = new Path(s"$dir/.nbuckets")
    // pin the bucket count (atomic write; unparsable reads as absent)
    val recorded: Option[Int] =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        val txt = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
        txt.toIntOption
      }
    recorded match {
      case Some(n) =>
        require(n == nBuckets,
          s"store at $dir was bucketed with nBuckets=$n, got $nBuckets")
      case None =>
        val tmp = new Path(s"$dir/.nbuckets.tmp")
        val out = fs.create(tmp, true)
        try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
        fs.delete(marker, false)
        require(fs.rename(tmp, marker), s"marker rename $tmp -> $marker failed")
    }
    // crash recovery: restore every .prev bucket the snapshot lacks
    // FIRST, or the replayed batch would apply onto a hole and
    // truncate those buckets to the delta's own keys
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
    if (affected.isEmpty) return
    val base =
      if (fs.exists(snap) && fs.listStatus(snap).nonEmpty) {
        require(fs.listStatus(snap).exists(
            _.getPath.getName.startsWith("bucket=")),
          s"snapshot at $snap is not bucket-partitioned (legacy flat " +
            "store) — migrate it once by rewriting with " +
            ".withColumn(\"bucket\", pmod(hash(keys), nBuckets))" +
            ".write.partitionBy(\"bucket\") before streaming resumes")
        spark.read.parquet(snap.toString)
          .where(col("bucket").isin(affected.map(Integer.valueOf).toSeq: _*))
          .drop("bucket") // partition-pruned: only affected buckets scan
      } else emptyBase
    merge(base, delta)
      .withColumn("bucket", bucketOf)
      .write.mode("overwrite").partitionBy("bucket").parquet(stage.toString)
    // per-bucket swap: retire the live bucket to .prev (never delete-
    // then-rename — that window loses the bucket on a crash), promote
    // the staged replacement (absent when the merge emptied the
    // bucket), then drop the retired copies
    fs.mkdirs(prev); fs.mkdirs(snap)
    for (b <- affected) {
      val live = new Path(snap, s"bucket=$b")
      val staged = new Path(stage, s"bucket=$b")
      if (fs.exists(live))
        require(fs.rename(live, new Path(prev, s"bucket=$b")),
          s"rename $live -> $prev failed")
      if (fs.exists(staged))
        require(fs.rename(staged, live), s"rename $staged -> $live failed")
    }
    fs.delete(prev, true)
    fs.delete(stage, true)
  }
}
