package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Property graph as a pair of DataFrame families — the Spark-first
  * re-expression of the reference's Kuzu node/rel tables
  * (build_graph.py:19-78): `nodes(label → df with "id" + props)` and
  * `edges(relType → (srcLabel, dstLabel, df(src, dst)))`.
  *
  * Queries compile to joins: a fixed-length pattern is a chain of
  * equi-joins over edge tables (dimension-sized node tables
  * broadcast); a variable-length pattern is a bounded BFS — a
  * driver-side loop of (join, distinct, anti-join) producing minimal
  * depths, the standard distributed frontier expansion.
  *
  * Scale notes: edge tables shuffle-partition on src; each BFS level
  * is one shuffle keyed on the frontier; `persistFrontiers` should be
  * used past ~5 hops to truncate lineage (localCheckpoint). At 100 TB
  * pre-bucket the edge table by src so frontier joins co-locate.
  */
final case class PropertyGraph(
    nodes: Map[String, DataFrame],
    edges: Map[String, (String, String, DataFrame)]) {
  import PropertyGraph.{Direction, Out, In}

  /** Single-hop expansion: follow `relType` forward from `ids("id")`. */
  def out(relType: String, ids: DataFrame): DataFrame = step(relType, Out, ids)

  /** Single-hop expansion AGAINST the edge direction (the Cypher
    * `<-[:REL]-` arrowhead, reference rag.baml:279): arrive at the
    * SOURCES of `relType` edges whose dst is in `ids("id")`.
    */
  def in(relType: String, ids: DataFrame): DataFrame = step(relType, In, ids)

  private def step(relType: String, dir: Direction, ids: DataFrame): DataFrame = {
    val (_, _, e) = edges(relType)
    val (from, to) = dir match { case Out => ("src", "dst"); case In => ("dst", "src") }
    e.join(ids, e(from) === ids("id")).select(e(to).as("id")).distinct()
  }

  /** Fixed pattern: start at `startLabel` rows passing `pred`, walk
    * the rel chain, return the terminal node table joined on arrival
    * ids. Node tables broadcast when dimension-sized (Catalyst/AQE
    * picks; hint via autoBroadcastJoinThreshold).
    */
  def matchPath(startLabel: String, pred: Column, rels: Seq[String]): DataFrame =
    matchPattern(startLabel, pred, rels.map(_ -> (Out: Direction)))

  /** Direction-aware fixed pattern — each step is (relType, Out|In),
    * so reversed arrowheads compose with forward ones:
    * `(s:Substance)-[:CAUSES]->(a:Allergy)<-[:EXPERIENCES]-(p:Patient)`
    * is `matchPattern("Substance", pred, Seq("CAUSES" -> Out,
    * "EXPERIENCES" -> In))`. The terminal label is the dst of the
    * last Out step / the src of the last In step.
    */
  def matchPattern(
      startLabel: String, pred: Column,
      steps: Seq[(String, Direction)]): DataFrame = {
    val start = nodes(startLabel).filter(pred).select(col("id"))
    val endIds = steps.foldLeft(start) { case (ids, (r, d)) => step(r, d, ids) }
    val endLabel = steps.last match {
      case (r, Out) => edges(r)._2
      case (r, In)  => edges(r)._1
    }
    nodes(endLabel).join(endIds, "id")
  }

  /** Bounded variable-length reachability (Cypher `*1..max` analog,
    * reference README.md:137): minimal depth per reached node.
    * Returns (id, depth), depth 0 = the start set itself.
    * `undirected = true` walks edges both ways (the README's
    * `-[r*1..4]-` pattern) by symmetrizing the edge set — a
    * projection-and-union, no extra shuffle: each BFS level still
    * shuffles once, on a frontier at most 2× the directed one.
    *
    * Each level's frontier is eagerly localCheckpoint'ed — the
    * standard iterative-algorithm discipline (GraphX/Pregel do the
    * same): without it, level h's anti-join against `visited`
    * re-derives every previous level from source, an O(maxHops²)
    * recompute that compounds with depth. Frontiers are node-id sets
    * — small next to the edge table — and their blocks are freed by
    * the ContextCleaner when the result is GC'd.
    */
  def bfs(edgeSet: DataFrame, start: DataFrame, maxHops: Int,
      undirected: Boolean = false): DataFrame = {
    val es =
      if (undirected)
        edgeSet.unionAll(edgeSet.select(col("dst").as("src"), col("src").as("dst")))
      else edgeSet
    var visited = start.select(col("id"), lit(0).as("depth"))
    var frontier = start.select("id")
    for (h <- 1 to maxHops if !frontier.isEmpty) {
      frontier = es.join(frontier, es("src") === frontier("id"))
        .select(es("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint(true)
      visited = visited.unionAll(frontier.select(col("id"), lit(h).as("depth")))
    }
    visited
  }

  /** Schema catalog as XML — the reference's get_schema_dict + XML
    * render (utils.py:37-105) used for LLM schema pruning; derived
    * from live DataFrame schemas, never hand-maintained.
    */
  def schemaXml: String = {
    val sb = new StringBuilder("<schema>\n")
    for ((label, df) <- nodes.toSeq.sortBy(_._1)) {
      sb.append(s"""  <node label="$label">\n""")
      for (f <- df.schema.fields)
        sb.append(s"""    <property name="${f.name}" type="${f.dataType.simpleString}"/>\n""")
      sb.append("  </node>\n")
    }
    for ((rel, (src, dst, _)) <- edges.toSeq.sortBy(_._1))
      sb.append(s"""  <rel label="$rel" from="$src" to="$dst"/>\n""")
    sb.append("</schema>").toString
  }
}

object PropertyGraph {

  /** Traversal direction of one pattern step: `Out` follows the edge
    * (src→dst), `In` walks against it (dst→src, the `<-[:REL]-`
    * arrowhead).
    */
  sealed trait Direction
  case object Out extends Direction
  case object In extends Direction

  /** Edge-build helper (reference MERGE ingest shape, SURVEY J2):
    * dedup staging rows, then inner-join both endpoint node tables so
    * dangling references drop — dedup BEFORE the join shrinks the
    * shuffle (the reference's WITH DISTINCT discipline).
    */
  def buildEdges(
      staging: DataFrame, srcCol: String, dstCol: String,
      srcNodes: DataFrame, dstNodes: DataFrame): DataFrame =
    staging
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .dropDuplicates("src", "dst")
      .join(srcNodes.select(col("id").as("src")), Seq("src"))
      .join(dstNodes.select(col("id").as("dst")), Seq("dst"))
}
