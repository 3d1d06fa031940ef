package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Textual single-table `MERGE … SET` — the WRITE subset of the
  * reference's graph-ingest Cypher (build_graph.py:209-224: `LOAD
  * FROM df WHERE id IS NOT NULL WITH DISTINCT id, street, …
  * MERGE (a:Address {id: id}) SET a.street = street, … RETURN
  * COUNT(*) AS n`), making ingest text-drivable like queries already
  * are through [[CypherLite.query]].
  *
  * The statement compiles to a NORMALIZED single-label node delta
  * (filter → project → optional distinct — all codegen'd column ops,
  * no UDFs) applied through the engine's upsert primitives:
  *
  *  - [[into]] — [[graft.fhir.FhirPipeline.upsertGraph]]: pure
  *    DataFrame merge for in-memory graphs,
  *  - [[batch]] — [[graft.streaming.Incremental.upsertKeyedBatch]]
  *    over the bucketed [[graft.streaming.BucketStore]] layout: the
  *    100-TB/continuous-ingest shape (each micro-batch rewrites only
  *    the buckets containing its keys), usable directly as a
  *    `foreachBatch` sink.
  *
  * MERGE semantics are the engine's upsert norm: FIRST-WRITE-WINS —
  * an existing id keeps its stored row, new ids append, intra-batch
  * duplicate ids collapse deterministically (lexicographic-min row).
  * This DIVERGES from Kuzu/Neo4j `MERGE … SET`, which re-SETs
  * matched rows on every run: the engine's ingest is replay-safe by
  * contract (re-ingesting a batch is a no-op), which an
  * unconditional SET cannot be. `ON CREATE SET`/`ON MATCH SET`
  * qualifiers are rejected pointedly rather than silently mapped.
  *
  * Grammar (single node table — relationship MERGE is the
  * edge-build path, [[PropertyGraph.buildEdges]]):
  * {{{
  * [LOAD FROM <name>]                      -- source is the df param
  * [WHERE col IS NOT NULL [AND …]]         -- null-key/row guards
  * [WITH [DISTINCT] col [, col …]]         -- projection
  * MERGE (a:Label {id: keyCol})            -- single key prop, `id`
  * [SET a.p = col [, a.p2 = col2 …]]       -- property mapping
  * [RETURN COUNT(*) AS name]               -- delta-row count
  * }}}
  */
object GraphMerge {

  /** Parsed statement: the delta-building recipe. `setProps` maps
    * node property → source column; `keyCol` feeds the node `id`.
    */
  final case class MergeSpec(
      label: String, alias: String, keyCol: String,
      notNullCols: Seq[String], withCols: Option[Seq[String]],
      distinct: Boolean, setProps: Seq[(String, String)],
      countAlias: Option[String])

  private val LoadRe = """(?is)^\s*LOAD\s+FROM\s+[A-Za-z_][A-Za-z0-9_]*\s+(.*)$""".r
  private val WhereRe = """(?is)^WHERE\s+(.*?)\s*(?=(?:WITH|MERGE)\b)(.*)$""".r
  private val WithRe = """(?is)^WITH\s+(DISTINCT\s+)?(.*?)\s*(?=MERGE\b)(.*)$""".r
  private val MergeRe =
    """(?is)^MERGE\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*:\s*([A-Za-z_][A-Za-z0-9_]*)\s*\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*:\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\s*\)\s*(.*)$""".r
  private val SetItemRe =
    """(?is)^([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)\s*=\s*([A-Za-z_][A-Za-z0-9_]*)$""".r
  private val ReturnRe =
    """(?is)^RETURN\s+COUNT\s*\(\s*\*\s*\)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)\s*$""".r
  private val NotNullRe =
    """(?is)^([A-Za-z_][A-Za-z0-9_]*)\s+IS\s+NOT\s+NULL$""".r

  private def fail(msg: String, rest: String): Nothing =
    throw new IllegalArgumentException(s"$msg at: '${rest.take(50)}'")

  def parse(stmt0raw: String): MergeSpec = {
    // same textual-entry normalization as CypherLite.query: strip
    // // comments (the reference's ingest statements carry them
    // inline) and trailing semicolons; pointed rejects for $params
    // and current-time constructors
    val stmt0 = CypherLite.preprocess(stmt0raw)
    require(!stmt0.matches("(?is).*\\bON\\s+(CREATE|MATCH)\\b.*"),
      "ON CREATE SET / ON MATCH SET are unsupported — this engine's " +
        "MERGE is first-write-wins (replay-safe upsert); plain SET " +
        "maps properties for NEW ids only")
    val s1 = stmt0.trim match {
      case LoadRe(rest) => rest.trim
      case other => other
    }
    val (notNull, s2) = s1 match {
      case WhereRe(conds, rest) =>
        val cs = conds.split("(?i)\\bAND\\b").map(_.trim).map {
          case NotNullRe(c) => c
          case other => fail("MERGE-ingest WHERE supports only " +
            "`col IS NOT NULL [AND …]`", other)
        }
        (cs.toSeq, rest.trim)
      case other => (Seq.empty[String], other)
    }
    val (withCols, dist, s3) = s2 match {
      case WithRe(d, cols, rest) =>
        val cs = cols.split(",").map(_.trim)
        for (c <- cs) require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"MERGE-ingest WITH items are bare source columns, got '$c' " +
            "(compute upstream in the DataFrame — that is what it is for)")
        (Some(cs.toSeq), d != null, rest.trim)
      case other => (None, false, other)
    }
    val (alias, label, keyProp, keyCol, s4) = s3 match {
      case MergeRe(a, l, kp, kc, rest) => (a, l, kp, kc, rest.trim)
      case other => fail("expected MERGE (a:Label {id: col})", other)
    }
    require(keyProp == "id",
      s"MERGE key must be the node id ({id: col}), got {$keyProp: …} — " +
        "this engine's node tables key on `id`")
    val (setProps, s5) =
      if (s4.matches("(?is)^SET\\b.*")) {
        val body = s4.replaceFirst("(?i)^SET\\b", "").trim
        val retIdx = "(?i)\\bRETURN\\b".r.findFirstMatchIn(body).map(_.start)
        val (items, rest) = retIdx match {
          case Some(i) => (body.substring(0, i).trim, body.substring(i).trim)
          case None    => (body, "")
        }
        val ps = items.split(",").map(_.trim).map {
          case SetItemRe(a, p, c) =>
            require(a == alias,
              s"SET $a.$p: '$a' is not the merged alias '$alias'")
            require(p != "id", "SET may not reassign the id key")
            (p, c)
          case other => fail("SET items are alias.prop = sourceCol", other)
        }
        require(ps.map(_._1).distinct.length == ps.length,
          s"duplicate SET properties: ${ps.map(_._1).toSeq}")
        (ps.toSeq, rest)
      } else (Seq.empty[(String, String)], s4)
    val countAlias = s5 match {
      case "" => None
      case ReturnRe(n) => Some(n)
      case other => fail(
        "MERGE-ingest RETURN supports only COUNT(*) AS name", other)
    }
    MergeSpec(label, alias, keyCol, notNull, withCols, dist, setProps,
      countAlias)
  }

  /** The normalized node-table delta for `spec` over `df`: WHERE
    * guards → WITH projection (+ DISTINCT) → rename to the node
    * schema (`id` + set properties). Pure narrow ops until the
    * optional distinct (one shuffle on the projected row).
    */
  def delta(df: DataFrame, spec: MergeSpec): DataFrame = {
    val cols = df.columns.toSet
    for (c <- spec.notNullCols)
      require(cols(c), s"WHERE $c IS NOT NULL: no column '$c' in the source")
    val filtered = spec.notNullCols.foldLeft(df)(
      (d, c) => d.filter(col(c).isNotNull))
    val projected = spec.withCols match {
      case Some(ws) =>
        for (c <- ws) require(cols(c), s"WITH $c: no column '$c' in the source")
        val p = filtered.select(ws.map(col): _*)
        if (spec.distinct) p.distinct() else p
      case None => filtered
    }
    val avail = projected.columns.toSet
    require(avail(spec.keyCol),
      s"MERGE key source '${spec.keyCol}' is not in scope " +
        s"(${projected.columns.mkString(", ")})")
    for ((_, c) <- spec.setProps)
      require(avail(c), s"SET source '$c' is not in scope " +
        s"(${projected.columns.mkString(", ")})")
    val outCols: Seq[Column] = col(spec.keyCol).as("id") +:
      spec.setProps.map { case (p, c) => col(c).as(p) }
    projected.select(outCols: _*)
  }

  /** Apply a MERGE-ingest statement to an in-memory graph: the delta
    * becomes a one-table [[PropertyGraph]] merged through
    * [[graft.fhir.FhirPipeline.upsertGraph]] (first-write-wins,
    * deterministic intra-batch dedup). Returns the updated graph and
    * the delta-row count when the statement RETURNs COUNT(*)
    * (Kuzu's num-merged output; counting forces one extra pass, so
    * it is computed only when asked for).
    */
  def into(g: PropertyGraph, df: DataFrame, stmt: String)
      : (PropertyGraph, Option[Long]) = {
    val spec = parse(stmt)
    val d = delta(df, spec)
    val merged = graft.fhir.FhirPipeline.upsertGraph(
      g, PropertyGraph(nodes = Map(spec.label -> d), edges = Map.empty))
    (merged, spec.countAlias.map(_ => d.count()))
  }

  /** The continuous-ingest form: compile the statement once, get a
    * `foreachBatch`-shaped sink applying each micro-batch's delta to
    * the label's bucketed store at `dir/<label>` through
    * [[graft.streaming.Incremental.upsertKeyedBatch]] — only the
    * buckets containing the batch's ids rewrite. Read back with
    * [[graft.streaming.Incremental.readKeyedStore]].
    */
  def batch(dir: String, stmt: String, nBuckets: Int = 256)
      : (DataFrame, Long) => Unit = {
    val spec = parse(stmt)
    (b: DataFrame, batchId: Long) =>
      graft.streaming.Incremental.upsertKeyedBatch(
        s"$dir/${spec.label}", Seq("id"), nBuckets)(delta(b, spec), batchId)
  }
}
