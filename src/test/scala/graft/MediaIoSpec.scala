package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.IO
import graft.multimodal.Media

class MediaIoSpec extends SparkSpec {

  test("media table from documents: payloads and stub metadata are deterministic") {
    val docs = graft.core.Tables.documents(spark, sf).limit(50)
    val m1 = Media.mediaFromDocuments(spark, docs).collect().sortBy(_.media_id)
    val m2 = Media.mediaFromDocuments(spark, docs).collect().sortBy(_.media_id)
    assert(m1.length === 50)
    assert(m1.map(_.meta) === m2.map(_.meta))
    assert(m1.forall(r => r.meta.width >= 16 && r.meta.height >= 16))
  }

  test("featurize: mapPartitions batch path yields 16 floats in [0,1] per record") {
    val docs = graft.core.Tables.documents(spark, sf).limit(20)
    val feats = Media.featurize(Media.mediaFromDocuments(spark, docs)).collect()
    assert(feats.length === 20)
    assert(feats.forall(_.features.length === 16))
    assert(feats.forall(_.features.forall(f => f >= 0.0f && f <= 1.0f)))
  }

  test("frame sampling: n frames of fixed width, stable order") {
    val docs = graft.core.Tables.documents(spark, sf).limit(5)
    val fr = Media.frames(Media.mediaFromDocuments(spark, docs), 4).collect()
    assert(fr.groupBy(_.media_id).forall(_._2.length === 4))
    assert(fr.forall(_.frame.length <= 16))
    val perDoc = fr.groupBy(_.media_id).values.head.sortBy(_.frame_no)
    assert(perDoc.map(_.frame_no).toSeq === Seq(0, 1, 2, 3))
  }

  test("resize stub: exact target size, deterministic") {
    val b = "abcdef".getBytes
    val r = Media.resizeStub(b, 4, 3)
    assert(r.length === 12)
    assert(r.take(6).toSeq === b.toSeq)
    assert(Media.resizeStub(b, 4, 3).toSeq === r.toSeq)
  }

  test("JSON array roundtrip: write small result, read back with declared schema") {
    val dir = Files.createTempDirectory("graft_io").toString
    val df = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").limit(10)
    IO.writeJsonArrayFile(df, s"$dir/out.json")
    val back = IO.readJsonArray(spark, s"$dir/out.json",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, lang STRING"))
    assert(back.count() === 10)
    assert(back.columns.toSeq === Seq("doc_id", "lang"))
  }

  test("JSON lines roundtrip: distributed sink and splittable source") {
    val dir = Files.createTempDirectory("graft_io").toString
    val df = graft.core.Tables.documents(spark, sf).select("doc_id", "n_chars")
    IO.writeJsonLines(df, s"$dir/lines")
    val back = IO.readJsonLines(spark, s"$dir/lines",
      org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, n_chars BIGINT"))
    assert(back.count() === df.count())
    assert(back.agg(sum("n_chars")).head().getLong(0) ===
      df.agg(sum("n_chars")).head().getLong(0))
  }

  test("writeJsonArrayFile refuses large results") {
    val df = graft.core.Tables.documents(spark, sf)
    intercept[IllegalArgumentException] {
      IO.writeJsonArrayFile(df, "/tmp/never.json", maxRows = 3)
    }
  }

  test("malformed-record policy: PERMISSIVE quarantines, FAILFAST aborts") {
    val dir = Files.createTempDirectory("graft_io").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/mixed.jsonl"),
      """{"doc_id": 1, "lang": "en"}
        |{"doc_id": oops not json
        |{"doc_id": 3, "lang": "fr"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("doc_id BIGINT, lang STRING")
    // Spark refuses corrupt-column-only queries straight off raw
    // files (the referenced data no longer exists at filter time) —
    // the documented pattern is to materialize first
    val perm = IO.readJsonLinesStrict(spark, s"$dir/mixed.jsonl",
      schema, failFast = false).cache()
    val good = perm.where(col("_corrupt_record").isNull)
    val bad = perm.where(col("_corrupt_record").isNotNull)
    assert(good.count() === 2 && bad.count() === 1,
      "good rows parse, the corrupt line lands in quarantine — nothing dropped")
    assert(bad.select("_corrupt_record").head().getString(0).contains("oops"),
      "quarantine keeps the raw line for replay")
    val failed = intercept[org.apache.spark.SparkException] {
      IO.readJsonLinesStrict(spark, s"$dir/mixed.jsonl",
        schema, failFast = true).count()
    }
    assert(failed.getMessage.toLowerCase.contains("malformed")
      || Option(failed.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
