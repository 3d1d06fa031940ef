package graft

import java.nio.file.Files

import graft.fhir.FhirPipeline
import graft.graph.PropertyGraph

/** Incremental graph upsert (reference Kuzu MERGE, build_graph.py:
  * 209-224): batch-idempotent, survivor-preserving, over a real
  * writeGraph/readGraph store round-trip — including writing the
  * merged graph back OVER the directory it reads from (the
  * stage-then-swap contract).
  */
class UpsertGraphSpec extends SparkSpec {
  import TestSession.spark.implicits._

  private val edgeMeta = Map("KNOWS" -> (("Person", "Person")))

  private def graphOf(people: Seq[(String, String)],
      knows: Seq[(String, String)]): PropertyGraph =
    PropertyGraph(
      nodes = Map("Person" -> people.toDF("id", "name")),
      edges = Map("KNOWS" -> (("Person", "Person", knows.toDF("src", "dst")))))

  test("re-ingesting the same batch is a no-op (MERGE idempotence)") {
    val dir = Files.createTempDirectory("graft_upsert").toString
    val batch = graphOf(Seq("p1" -> "Ann", "p2" -> "Bo"), Seq("p1" -> "p2"))
    FhirPipeline.writeGraph(batch, dir)
    val stored = FhirPipeline.readGraph(spark, dir, edgeMeta)
    FhirPipeline.writeGraph(FhirPipeline.upsertGraph(stored, batch), dir)
    val again = FhirPipeline.readGraph(spark, dir, edgeMeta)
    assert(again.nodes("Person").orderBy("id").as[(String, String)].collect().toSeq ===
      Seq("p1" -> "Ann", "p2" -> "Bo"))
    assert(again.edges("KNOWS")._3.as[(String, String)].collect().toSeq ===
      Seq("p1" -> "p2"))
  }

  test("new batch adds nodes/edges; survivors keep stored properties") {
    val dir = Files.createTempDirectory("graft_upsert2").toString
    FhirPipeline.writeGraph(
      graphOf(Seq("p1" -> "Ann", "p2" -> "Bo"), Seq("p1" -> "p2")), dir)
    val stored = FhirPipeline.readGraph(spark, dir, edgeMeta)
    // p2 re-arrives with a DIFFERENT property (must NOT win — the
    // cross-batch first-write rule), p3/its edge are new
    val delta = graphOf(Seq("p2" -> "Robert", "p3" -> "Cyd"), Seq("p2" -> "p3"))
    FhirPipeline.writeGraph(FhirPipeline.upsertGraph(stored, delta), dir)
    val after = FhirPipeline.readGraph(spark, dir, edgeMeta)
    assert(after.nodes("Person").orderBy("id").as[(String, String)].collect().toSeq ===
      Seq("p1" -> "Ann", "p2" -> "Bo", "p3" -> "Cyd"))
    assert(after.edges("KNOWS")._3.orderBy("src", "dst")
      .as[(String, String)].collect().toSeq ===
      Seq("p1" -> "p2", "p2" -> "p3"))
  }

  test("intra-delta duplicate keys resolve deterministically (not both inserted)") {
    val existing = graphOf(Seq("p1" -> "Ann"), Seq.empty)
    // the golden-9 shape: one batch carries the same NEW key twice
    // with contested properties — Kuzu resolves by arbitrary visit
    // order; the engine must pick exactly one, deterministically
    val delta = graphOf(Seq("p3" -> "Cyd", "p3" -> "Cid"), Seq.empty)
    val merged = FhirPipeline.upsertGraph(existing, delta)
    val p3 = merged.nodes("Person").filter($"id" === "p3")
      .as[(String, String)].collect().toSeq
    assert(p3 === Seq("p3" -> "Cid"), "exactly one row, lexicographic-min winner")
  }

  test("a delta may introduce a new label; one-sided tables pass through") {
    val a = graphOf(Seq("p1" -> "Ann"), Seq.empty)
    val delta = PropertyGraph(
      nodes = Map("City" -> Seq(("c1", "Basel")).toDF("id", "name")),
      edges = Map.empty)
    val merged = FhirPipeline.upsertGraph(a, delta)
    assert(merged.nodes.keySet === Set("Person", "City"))
    assert(merged.nodes("City").count() === 1)
    assert(merged.edges("KNOWS")._3.count() === 0)
  }

  test("a NEW label's delta table normalizes too — no duplicate-key pass-through") {
    val a = graphOf(Seq("p1" -> "Ann"), Seq.empty)
    val delta = PropertyGraph(
      nodes = Map("City" -> Seq(("c1", "Basel"), ("c1", "Bern")).toDF("id", "name")),
      edges = Map("NEAR" -> (("City", "City",
        Seq(("c1", "c1"), ("c1", "c1")).toDF("src", "dst")))))
    val merged = FhirPipeline.upsertGraph(a, delta)
    assert(merged.nodes("City").as[(String, String)].collect().toSeq ===
      Seq("c1" -> "Basel"), "lexicographic-min winner even on a brand-new table")
    assert(merged.edges("NEAR")._3.count() === 1)
  }
}
