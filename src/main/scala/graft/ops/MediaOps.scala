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
    )
  )
}
