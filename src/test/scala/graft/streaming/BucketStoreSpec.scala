package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed keyed store's durability machinery, exercised at the
  * seam the public wrappers (cdcApplyBatch / upsertKeyedBatch) share:
  * swap-safe manifest reads, lost-marker validation, flat-store
  * migration, and the staged-subset guard. Lives in graft.streaming
  * to reach the package-private [[BucketStore]] directly — the public
  * behaviors are covered in StreamingSpec.
  */
class BucketStoreSpec extends SparkSpec {
  import graft.TestSession.spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fs(dir: String) = new Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def upsert(dir: String, rows: Seq[(Long, String)], nB: Int = 8): Unit =
    BucketStore.applyKeyed(dir, Seq("k"), nB, rows.toDF("k", "v"),
      Seq.empty[(Long, String)].toDF("k", "v")) { (base, delta) =>
      base.unionByName(delta.join(base.select("k"), Seq("k"), "left_anti"))
    }

  test("swap-safe read: manifest resolves retained .prev copies mid-swap") {
    val dir = tmp("graft_bstore_read")
    upsert(dir, (0L until 32L).map(k => (k, s"v$k")))
    // simulate the exact mid-swap instant: an affected bucket retired
    // to .prev, its replacement not yet promoted — the direct
    // snapshot read MISSES it, the manifest read must not
    val f = fs(dir)
    val buckets = f.listStatus(new Path(s"$dir/snapshot"))
      .map(_.getPath.getName).filter(_.startsWith("bucket=")).sorted
    val victim = buckets.head
    f.mkdirs(new Path(s"$dir/.prev"))
    require(f.rename(new Path(s"$dir/snapshot/$victim"),
      new Path(s"$dir/.prev/$victim")))
    val direct = spark.read.parquet(s"$dir/snapshot").count()
    assert(direct < 32, "the direct read observes the transient hole")
    val safe = BucketStore.read(spark, dir).as[(Long, String)].collect().toMap
    assert(safe.size === 32, "the manifest read resolves the retained copy")
    assert(safe(0L) === "v0")
    // restore and verify the post-swap state reads identically
    require(f.rename(new Path(s"$dir/.prev/$victim"),
      new Path(s"$dir/snapshot/$victim")))
    assert(BucketStore.read(spark, dir).count() === 32)
  }

  test("lost .nbuckets marker: a wrong count is rejected by the rehash probe, the right one re-pins") {
    val dir = tmp("graft_bstore_marker")
    upsert(dir, (0L until 64L).map(k => (k, s"v$k")), nB = 8)
    val f = fs(dir)
    f.delete(new Path(s"$dir/.nbuckets"), false)
    // smaller count than the on-disk layout: index check trips
    val eIdx = intercept[IllegalArgumentException] {
      upsert(dir, Seq((1L, "x")), nB = 4)
    }
    assert(eIdx.getMessage.contains("marker"), eIdx.getMessage)
    // plausible LARGER count: every index fits, but keys do not
    // re-hash into their buckets — the probe trips instead of
    // silently stranding keys
    val eHash = intercept[IllegalArgumentException] {
      upsert(dir, Seq((1L, "x")), nB = 16)
    }
    assert(eHash.getMessage.contains("re-hash"), eHash.getMessage)
    // the original count passes the probe, re-pins, and applies
    upsert(dir, Seq((100L, "new")), nB = 8)
    assert(BucketStore.read(spark, dir).count() === 65)
    assert(f.exists(new Path(s"$dir/.nbuckets")), "marker re-pinned")
  }

  test("migrate rewrites a legacy flat store into the bucketed layout; deltas then prune") {
    val dir = tmp("graft_bstore_migrate")
    // a legacy flat store: plain parquet under snapshot/, no buckets
    (0L until 40L).map(k => (k, s"old$k")).toDF("k", "v")
      .write.parquet(s"$dir/snapshot")
    // the loud reject names migrate as the remedy
    val e = intercept[IllegalArgumentException] {
      upsert(dir, Seq((1L, "x")), nB = 8)
    }
    assert(e.getMessage.contains("migrate"), e.getMessage)
    BucketStore.migrate(spark, dir, Seq("k"), nBuckets = 8)
    val f = fs(dir)
    val buckets = f.listStatus(new Path(s"$dir/snapshot"))
      .map(_.getPath.getName).filter(_.startsWith("bucket=")).toSeq
    assert(buckets.nonEmpty, "snapshot now bucket-partitioned")
    assert(f.exists(new Path(s"$dir/.nbuckets")))
    assert(f.exists(new Path(s"$dir/.manifest")))
    // migrated store accepts deltas; first-write-wins keeps old rows
    upsert(dir, Seq((0L, "dupe"), (100L, "new")), nB = 8)
    val rows = BucketStore.read(spark, dir).as[(Long, String)].collect().toMap
    assert(rows.size === 41)
    assert(rows(0L) === "old0", "survivor kept its stored row")
    assert(rows(100L) === "new")
    // migrate on an already-bucketed store is a no-op heal, and a
    // conflicting count is rejected
    BucketStore.migrate(spark, dir, Seq("k"), nBuckets = 8)
    intercept[IllegalArgumentException] {
      BucketStore.migrate(spark, dir, Seq("k"), nBuckets = 4)
    }
  }

  test("a merge that re-keys rows into unaffected buckets fails loudly") {
    val dir = tmp("graft_bstore_strays")
    upsert(dir, (0L until 32L).map(k => (k, s"v$k")))
    // delta touches ONE key; the broken merge rewrites the key column,
    // scattering output across buckets the swap would never promote —
    // the staged-subset guard must reject it instead of dropping rows
    val e = intercept[IllegalArgumentException] {
      BucketStore.applyKeyed(dir, Seq("k"), 8,
        Seq((3L, "x")).toDF("k", "v"),
        Seq.empty[(Long, String)].toDF("k", "v")) { (base, delta) =>
        base.unionByName(delta).withColumn("k", col("k") + lit(1000))
      }
    }
    assert(e.getMessage.contains("unaffected bucket"), e.getMessage)
    // the live store is untouched by the failed apply
    assert(BucketStore.read(spark, dir).count() === 32)
  }
}
