package graft

import java.nio.file.Files

import graft.fhir.FhirPipeline
import graft.graph.{GraphMerge, PropertyGraph}

/** Textual MERGE…SET ingest (reference build_graph.py:209-224 shape):
  * the statement compiles to the SAME delta + merge
  * FhirPipeline.upsertGraph applies programmatically, and the batch
  * form round-trips through the bucketed store.
  */
class GraphMergeSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private val stmt =
    """LOAD FROM df_address
      |WHERE id IS NOT NULL
      |WITH DISTINCT id, street, city
      |MERGE (a:Address {id: id})
      |SET a.street = street,
      |    a.city = city
      |RETURN COUNT(*) AS num_addresses""".stripMargin

  private def src(rows: Seq[(java.lang.Long, String, String)]) =
    rows.toDF("id", "street", "city")

  test("text-MERGE ≡ upsertGraph on one node table (the verdict pin)") {
    val df = src(Seq(
      (1L: java.lang.Long, "a st", "ax"),
      (2L: java.lang.Long, "b st", "bx"),
      (null, "dropped", "dropped"),          // WHERE id IS NOT NULL
      (1L: java.lang.Long, "a st", "ax")))   // WITH DISTINCT collapses
    val existing = PropertyGraph(
      nodes = Map("Address" ->
        Seq((2L, "STORED st", "STORED")).toDF("id", "street", "city")),
      edges = Map.empty)
    val (merged, n) = GraphMerge.into(existing, df, stmt)
    // the equivalent programmatic path
    val delta = df.filter("id is not null")
      .select("id", "street", "city").distinct()
    val expect = FhirPipeline.upsertGraph(existing,
      PropertyGraph(nodes = Map("Address" -> delta), edges = Map.empty))
    assert(merged.nodes("Address").orderBy("id")
      .as[(Long, String, String)].collect().toSeq ===
      expect.nodes("Address").orderBy("id")
        .as[(Long, String, String)].collect().toSeq)
    // first-write-wins: id 2 keeps its STORED row; id 1 appends
    assert(merged.nodes("Address").orderBy("id")
      .as[(Long, String, String)].collect().toSeq ===
      Seq((1L, "a st", "ax"), (2L, "STORED st", "STORED")))
    assert(n === Some(2L))
  }

  test("batch form: replay-safe ingest over the bucketed store") {
    val dir = Files.createTempDirectory("graft_merge_store").toString
    val sink = GraphMerge.batch(dir, stmt, nBuckets = 4)
    sink(src(Seq((1L: java.lang.Long, "a st", "ax"),
      (2L: java.lang.Long, "b st", "bx"))), 0L)
    // replay the same batch plus a contested survivor and a new id
    sink(src(Seq((2L: java.lang.Long, "CHANGED", "CHANGED"),
      (3L: java.lang.Long, "c st", "cx"))), 1L)
    val back = graft.streaming.Incremental
      .readKeyedStore(spark, s"$dir/Address")
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(back === Seq((1L, "a st", "ax"), (2L, "b st", "bx"),
      (3L, "c st", "cx")))
  }

  test("pointed rejects: ON MATCH SET, non-id key, unknown columns") {
    val e1 = intercept[IllegalArgumentException] {
      GraphMerge.parse(
        "MERGE (a:X {id: id}) ON MATCH SET a.p = p")
    }
    assert(e1.getMessage.contains("first-write-wins"))
    val e2 = intercept[IllegalArgumentException] {
      GraphMerge.parse("MERGE (a:X {name: name}) SET a.p = p")
    }
    assert(e2.getMessage.contains("key on `id`"))
    val e3 = intercept[IllegalArgumentException] {
      GraphMerge.into(PropertyGraph(Map.empty, Map.empty),
        src(Seq((1L: java.lang.Long, "s", "c"))),
        "MERGE (a:X {id: id}) SET a.p = nope")
    }
    assert(e3.getMessage.contains("not in scope"))
    val e4 = intercept[IllegalArgumentException] {
      GraphMerge.parse("MERGE (a:X {id: id}) SET b.p = p")
    }
    assert(e4.getMessage.contains("not the merged alias"))
  }
}
