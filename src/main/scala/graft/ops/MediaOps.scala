package graft.ops

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.core.Tables.orderedByAll

/** Multimodal binary-column operator inventory: opaque payloads
  * (documents.text bytes stand in for image blobs) manipulated with
  * codegen'd binary expressions — byte length, content hashes, head
  * slices. The batched decode/featurize path lives in
  * graft.multimodal.Media (mapPartitions; not SQL-expressible, so
  * it is spec-tested rather than oracle-checked).
  */
object MediaOps {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "m1_blob_ops",
      (s, d) => orderedByAll(
        Tables.documents(s, d).select(
          col("doc_id"),
          octet_length(col("text")).as("n_bytes"),
          md5(col("text").cast("binary")).as("content_md5"),
          sha2(col("text").cast("binary"), 256).as("content_sha256"),
          base64(substring(col("text"), 1, 12).cast("binary")).as("head_b64"))),
      Some("""SELECT doc_id,
             |       octet_length(encode(text)) AS n_bytes,
             |       md5(text) AS content_md5,
             |       sha256(text) AS content_sha256,
             |       to_base64(encode(substring(text, 1, 12))) AS head_b64
             |FROM documents ORDER BY ALL""".stripMargin)
    ),
    // M2 frame sampling through the TYPED Dataset path (video → n
    // evenly spaced byte windows, Media.frames flatMap — the 1→n
    // expansion a real decoder rides): n=4 frames of width 16. The
    // corpus is ASCII, so byte offsets == character offsets and the
    // oracle replays the exact slice arithmetic with substring.
    QueryDef(
      "m2_frame_sample",
      (s, d) => {
        val media = graft.multimodal.Media
          .mediaFromDocuments(s, Tables.documents(s, d))
        orderedByAll(graft.multimodal.Media.frames(media, 4).toDF()
          .select(col("media_id"), col("frame_no"),
            col("frame").cast("string").as("frame_txt")))
      },
      Some("""WITH t AS (SELECT doc_id, text, octet_length(encode(text)) AS len,
             |                  GREATEST(1, octet_length(encode(text)) // 4) AS step
             |           FROM documents)
             |SELECT t.doc_id AS media_id, g.i AS frame_no,
             |       substring(t.text, g.i * t.step + 1,
             |                 LEAST(16, t.len - g.i * t.step)) AS frame_txt
             |FROM t CROSS JOIN (SELECT unnest(range(0, 4)) AS i) g
             |WHERE g.i < LEAST(4, t.len) ORDER BY ALL""".stripMargin)
    )
  )
}
