package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Textual `MERGE` ingest — the WRITE subset of the reference's
  * graph-build Cypher (build_graph.py:209-224 node shape, 255-299
  * relationship shape), making ingest text-drivable like queries
  * already are through [[CypherLite.query]]. Two statement forms:
  *
  * NODE (build_graph.py:209):
  * {{{
  * [LOAD FROM <name>]                      -- source is the df param
  * [WHERE col IS NOT NULL [AND …]]         -- null-key/row guards
  * [WITH [DISTINCT] src [AS name] [, …]]   -- projection; src may be
  *                                         -- a struct field (a.b)
  * MERGE (a:Label {id: keyCol})            -- single key prop, `id`
  * [SET a.p = col [, …]]                   -- property mapping
  * [RETURN COUNT(*) AS name]               -- delta-row count
  * }}}
  *
  * RELATIONSHIP (build_graph.py:255 — `ingest_lives_in`):
  * {{{
  * [LOAD FROM <name>] [WHERE …] [WITH …]
  * MATCH (a:L1 {keyProp: col1}), (b:L2 {keyProp: col2})
  * MERGE (a)-[:REL]->(b)
  * [RETURN COUNT(*) AS name]
  * }}}
  *
  * Both compile to NORMALIZED deltas (filter → project → optional
  * distinct — codegen'd column ops, no UDFs) applied through the
  * engine's upsert primitives:
  *  - [[into]] — [[graft.fhir.FhirPipeline.upsertGraph]]: pure
  *    DataFrame merge for in-memory graphs. Relationship endpoints
  *    MATCH by arbitrary key property (each side joins its
  *    dimension-sized node table on the key prop to resolve the
  *    engine id — unmatched keys DROP, Cypher MATCH semantics;
  *    `{id: col}` sides skip the join entirely).
  *  - [[batch]] — [[graft.streaming.Incremental.upsertKeyedBatch]]
  *    over the bucketed [[graft.streaming.BucketStore]] layout (the
  *    100-TB/continuous-ingest shape; only the buckets containing
  *    the batch's keys rewrite), usable as a `foreachBatch` sink.
  *    Tables land at `dir/nodes_<Label>` / `dir/edges_<REL>` — the
  *    [[graft.fhir.FhirPipeline.writeGraph]] naming. Relationship
  *    statements here need BOTH endpoints keyed `{id: col}` (there
  *    is no graph in hand to resolve arbitrary key props against —
  *    pointed reject).
  *
  * MERGE semantics are the engine's upsert norm: FIRST-WRITE-WINS —
  * an existing key keeps its stored row (nodes on id, relationships
  * on (src, dst)), new keys append, intra-batch duplicates collapse
  * deterministically (lexicographic-min row). This DIVERGES from
  * Kuzu/Neo4j `MERGE … SET`, which re-SETs matched rows on every
  * run: the engine's ingest is replay-safe by contract (re-ingesting
  * a batch is a no-op), which an unconditional SET cannot be.
  * `ON CREATE SET`/`ON MATCH SET` reject pointedly, as does SET on a
  * relationship MERGE (edge property ingest is the
  * [[PropertyGraph.buildEdges]] path).
  */
object GraphMerge {

  /** One projected WITH item: (source expression — a column or a
    * struct field `a.b` — and its output name).
    */
  final case class WithItem(src: String, as: String)

  sealed trait MergeSpec {
    def notNullCols: Seq[String]
    def withItems: Option[Seq[WithItem]]
    def distinct: Boolean
    def countAlias: Option[String]
  }

  /** Parsed node statement: the delta-building recipe. `setProps`
    * maps node property → projected source name; `keyCol` feeds the
    * node `id`.
    */
  final case class NodeMergeSpec(
      label: String, alias: String, keyCol: String,
      notNullCols: Seq[String], withItems: Option[Seq[WithItem]],
      distinct: Boolean, setProps: Seq[(String, String)],
      countAlias: Option[String]) extends MergeSpec

  /** Parsed relationship statement: endpoint (label, keyProp,
    * source-column) triples plus the relationship type.
    */
  final case class RelMergeSpec(
      relType: String,
      srcLabel: String, srcKeyProp: String, srcCol: String,
      dstLabel: String, dstKeyProp: String, dstCol: String,
      notNullCols: Seq[String], withItems: Option[Seq[WithItem]],
      distinct: Boolean, countAlias: Option[String]) extends MergeSpec

  private val LoadRe = """(?is)^\s*LOAD\s+FROM\s+[A-Za-z_][A-Za-z0-9_]*\s+(.*)$""".r
  private val WhereRe =
    """(?is)^WHERE\s+(.*?)\s*(?=(?:WITH|MERGE|CREATE|MATCH)\b)(.*)$""".r
  private val WithRe =
    """(?is)^WITH\s+(DISTINCT\s+)?(.*?)\s*(?=(?:MERGE|CREATE|MATCH)\b)(.*)$""".r
  private val NodeAtom =
    """\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*:\s*([A-Za-z_][A-Za-z0-9_]*)\s*\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*:\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\s*\)"""
  // CREATE accepts as a MERGE alias: in this engine's KEYED store a
  // row exists at most once per key, so CREATE's always-insert
  // semantics collapse to the same first-write-wins upsert (a
  // documented divergence — Neo4j CREATE can mint duplicate nodes,
  // which a keyed deterministic store cannot represent; ingest
  // pipelines emitting CREATE mean exactly this upsert)
  private val MergeNodeRe =
    s"""(?is)^(?:MERGE|CREATE)\\s*$NodeAtom\\s*(.*)$$""".r
  private val MatchPairRe =
    s"""(?is)^MATCH\\s*$NodeAtom\\s*,\\s*$NodeAtom\\s+(.*)$$""".r
  private val MergeRelRe =
    """(?is)^(?:MERGE|CREATE)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*-\s*\[\s*:\s*([A-Za-z_][A-Za-z0-9_]*)\s*\]\s*->\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*(.*)$""".r
  private val SetItemRe =
    """(?is)^([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)\s*=\s*([A-Za-z_][A-Za-z0-9_]*)$""".r
  private val ReturnRe =
    """(?is)^RETURN\s+COUNT\s*\(\s*\*\s*\)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)\s*$""".r
  private val NotNullRe =
    """(?is)^([A-Za-z_][A-Za-z0-9_]*)\s+IS\s+NOT\s+NULL$""".r
  private val WithItemRe =
    """(?is)^([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)?)(?:\s+AS\s+([A-Za-z_][A-Za-z0-9_]*))?$""".r

  private def fail(msg: String, rest: String): Nothing =
    throw new IllegalArgumentException(s"$msg at: '${rest.take(50)}'")

  def parse(stmt0raw: String): MergeSpec = {
    // same textual-entry normalization as CypherLite.query: strip
    // // comments (the reference's ingest statements carry them
    // inline) and trailing semicolons; pointed rejects for $params
    // and current-time constructors
    val stmt0 = CypherLite.preprocess(stmt0raw)
    // CREATE runs as a first-write-wins upsert here (see MergeNodeRe
    // note) — Neo4j CREATE can mint duplicates, this store cannot.
    // The reinterpretation is documented but was invisible at
    // runtime; log it so ingest pipelines that DEPEND on
    // duplicate-creating semantics notice (advisor round-13).
    if (stmt0.replaceAll("'[^']*'", "''")
        .matches("(?is).*\\bCREATE\\s*\\(.*"))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "CREATE statement executed with MERGE (upsert, first-write-" +
          "wins) semantics: this keyed store cannot represent " +
          "duplicate nodes/edges; rows whose key already exists are " +
          "left unchanged")
    require(!stmt0.matches("(?is).*\\bON\\s+(CREATE|MATCH)\\s+SET\\b.*"),
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
    val (withItems, dist, s3) = s2 match {
      case WithRe(d, cols, rest) =>
        val items = cols.split(",").map(_.trim).map {
          case WithItemRe(src, as) =>
            val name = Option(as).getOrElse {
              require(!src.contains("."),
                s"WITH $src: struct-field projections need an AS name")
              src
            }
            WithItem(src, name)
          case other => fail("MERGE-ingest WITH items are " +
            "col | struct.field [AS name]", other)
        }
        require(items.map(_.as).distinct.length == items.length,
          s"duplicate WITH output names: ${items.map(_.as).toSeq}")
        (Some(items.toSeq), d != null, rest.trim)
      case other => (None, false, other)
    }
    s3 match {
      case MergeNodeRe(alias, label, keyProp, keyCol, rest) =>
        require(keyProp == "id",
          s"MERGE key must be the node id ({id: col}), got " +
            s"{$keyProp: …} — this engine's node tables key on `id`")
        val (setProps, s5) =
          if (rest.trim.matches("(?is)^SET\\b.*")) {
            val body = rest.trim.replaceFirst("(?i)^SET\\b", "").trim
            val retIdx =
              "(?i)\\bRETURN\\b".r.findFirstMatchIn(body).map(_.start)
            val (items, r2) = retIdx match {
              case Some(i) => (body.substring(0, i).trim,
                body.substring(i).trim)
              case None => (body, "")
            }
            val ps = items.split(",").map(_.trim).map {
              case SetItemRe(a, p, c) =>
                require(a == alias,
                  s"SET $a.$p: '$a' is not the merged alias '$alias'")
                require(p != "id", "SET may not reassign the id key")
                (p, c)
              case other => fail("SET items are alias.prop = sourceCol",
                other)
            }
            require(ps.map(_._1).distinct.length == ps.length,
              s"duplicate SET properties: ${ps.map(_._1).toSeq}")
            (ps.toSeq, r2)
          } else (Seq.empty[(String, String)], rest.trim)
        NodeMergeSpec(label, alias, keyCol, notNull, withItems, dist,
          setProps, countAlias(s5))
      case MatchPairRe(a1, l1, kp1, kc1, a2, l2, kp2, kc2, rest) =>
        rest.trim match {
          case MergeRelRe(f, rel, t, r2) =>
            require(Set(f, t) == Set(a1, a2) && f != t,
              s"MERGE ($f)-[:$rel]->($t): endpoints must be the two " +
                s"MATCHed aliases ($a1, $a2)")
            require(!r2.trim.matches("(?is)^SET\\b.*"),
              "SET on a relationship MERGE is unsupported — edge " +
                "properties ingest through PropertyGraph.buildEdges")
            val (sl, sk, sc, dl, dk, dc) =
              if (f == a1) (l1, kp1, kc1, l2, kp2, kc2)
              else (l2, kp2, kc2, l1, kp1, kc1)
            RelMergeSpec(rel, sl, sk, sc, dl, dk, dc, notNull,
              withItems, dist, countAlias(r2.trim))
          case other => fail(
            "expected MERGE (a)-[:REL]->(b) after the MATCH pair " +
              "(left-pointing arrows: swap the atoms)", other)
        }
      case other => fail("expected MERGE (a:Label {id: col}) or " +
        "MATCH (a:L1 {k: c1}), (b:L2 {k: c2}) MERGE (a)-[:REL]->(b)",
        other)
    }
  }

  private def countAlias(s: String): Option[String] = s.trim match {
    case "" => None
    case ReturnRe(n) => Some(n)
    case other => fail(
      "MERGE-ingest RETURN supports only COUNT(*) AS name", other)
  }

  /** The filtered + projected source frame for `spec` over `df`:
    * WHERE guards → WITH projection (+ DISTINCT). Pure narrow ops
    * until the optional distinct (one shuffle on the projected row).
    */
  private def projected(df: DataFrame, spec: MergeSpec): DataFrame = {
    val cols = df.columns.toSet
    for (c <- spec.notNullCols)
      require(cols(c), s"WHERE $c IS NOT NULL: no column '$c' in the source")
    val filtered = spec.notNullCols.foldLeft(df)(
      (d, c) => d.filter(col(c).isNotNull))
    spec.withItems match {
      case Some(ws) =>
        for (w <- ws) require(cols(w.src.split("\\.").head),
          s"WITH ${w.src}: no column '${w.src.split("\\.").head}' " +
            "in the source")
        val p = filtered.select(ws.map(w => col(w.src).as(w.as)): _*)
        if (spec.distinct) p.distinct() else p
      case None => filtered
    }
  }

  /** The normalized single-table NODE delta (`id` + set properties)
    * for a node statement.
    */
  def delta(df: DataFrame, spec: NodeMergeSpec): DataFrame = {
    val proj = projected(df, spec)
    val avail = proj.columns.toSet
    require(avail(spec.keyCol),
      s"MERGE key source '${spec.keyCol}' is not in scope " +
        s"(${proj.columns.mkString(", ")})")
    for ((_, c) <- spec.setProps)
      require(avail(c), s"SET source '$c' is not in scope " +
        s"(${proj.columns.mkString(", ")})")
    val outCols: Seq[Column] = col(spec.keyCol).as("id") +:
      spec.setProps.map { case (p, c) => col(c).as(p) }
    proj.select(outCols: _*)
  }

  /** The (src, dst) EDGE delta for a relationship statement —
    * endpoint key columns resolved to engine ids against the graph's
    * node tables (a broadcast-shaped join per non-id side; unmatched
    * keys drop, Cypher MATCH semantics).
    */
  def relDelta(g: PropertyGraph, df: DataFrame, spec: RelMergeSpec)
      : DataFrame = {
    val proj = projected(df, spec)
    val avail = proj.columns.toSet
    for (c <- Seq(spec.srcCol, spec.dstCol))
      require(avail(c), s"MATCH key source '$c' is not in scope " +
        s"(${proj.columns.mkString(", ")})")
    for (l <- Seq(spec.srcLabel, spec.dstLabel))
      require(g.nodes.contains(l),
        s"MATCH (:$l …): no node table '$l' in the graph " +
          s"(${g.nodes.keys.mkString(", ")})")
    def resolve(d: DataFrame, label: String, keyProp: String,
        keyCol: String, out: String): DataFrame =
      if (keyProp == "id") d.withColumn(out, col(keyCol))
      else {
        val nt = g.nodes(label)
        require(nt.columns.contains(keyProp),
          s"MATCH (:$label {$keyProp: …}): node table has no " +
            s"'$keyProp' (${nt.columns.mkString(", ")})")
        d.join(nt.select(col(keyProp).as(s"__gm_$out"),
            col("id").as(out)),
          d(keyCol) === col(s"__gm_$out"), "inner")
          .drop(s"__gm_$out")
      }
    val withSrc = resolve(proj, spec.srcLabel, spec.srcKeyProp,
      spec.srcCol, "__gm_src")
    val withDst = resolve(withSrc, spec.dstLabel, spec.dstKeyProp,
      spec.dstCol, "__gm_dst")
    withDst.select(col("__gm_src").as("src"), col("__gm_dst").as("dst"))
  }

  /** Apply a MERGE-ingest statement to an in-memory graph (node or
    * relationship form) through
    * [[graft.fhir.FhirPipeline.upsertGraph]] (first-write-wins,
    * deterministic intra-batch dedup). Returns the updated graph and
    * the delta-row count when the statement RETURNs COUNT(*)
    * (Kuzu's num-merged output; counting forces one extra pass, so
    * it is computed only when asked for).
    */
  def into(g: PropertyGraph, df: DataFrame, stmt: String)
      : (PropertyGraph, Option[Long]) = parse(stmt) match {
    case spec: NodeMergeSpec =>
      val d = delta(df, spec)
      val merged = graft.fhir.FhirPipeline.upsertGraph(
        g, PropertyGraph(nodes = Map(spec.label -> d), edges = Map.empty))
      (merged, spec.countAlias.map(_ => d.count()))
    case spec: RelMergeSpec =>
      val d = relDelta(g, df, spec)
      val merged = graft.fhir.FhirPipeline.upsertGraph(
        g, PropertyGraph(nodes = Map.empty, edges =
          Map(spec.relType -> ((spec.srcLabel, spec.dstLabel, d)))))
      (merged, spec.countAlias.map(_ => d.count()))
  }

  /** The continuous-ingest form: compile the statement once, get a
    * `foreachBatch`-shaped sink applying each micro-batch's delta to
    * the bucketed store (`dir/nodes_<Label>` or `dir/edges_<REL>` —
    * the [[graft.fhir.FhirPipeline.writeGraph]] naming) through
    * [[graft.streaming.Incremental.upsertKeyedBatch]] — only the
    * buckets containing the batch's keys rewrite. Read back with
    * [[graft.streaming.Incremental.readKeyedStore]]. Relationship
    * statements need both endpoints keyed `{id: col}` — there is no
    * graph in hand to resolve other key props against.
    */
  def batch(dir: String, stmt: String, nBuckets: Int = 256)
      : (DataFrame, Long) => Unit = parse(stmt) match {
    case spec: NodeMergeSpec =>
      (b: DataFrame, batchId: Long) =>
        graft.streaming.Incremental.upsertKeyedBatch(
          s"$dir/nodes_${spec.label}", Seq("id"), nBuckets)(
          delta(b, spec), batchId)
    case spec: RelMergeSpec =>
      require(spec.srcKeyProp == "id" && spec.dstKeyProp == "id",
        "batch relationship MERGE needs both endpoints keyed " +
          "{id: col} — a non-id key prop needs the graph to resolve " +
          "against (use `into`)")
      (b: DataFrame, batchId: Long) => {
        val proj = projected(b, spec)
        val d = proj.select(col(spec.srcCol).as("src"),
          col(spec.dstCol).as("dst"))
        graft.streaming.Incremental.upsertKeyedBatch(
          s"$dir/edges_${spec.relType}", Seq("src", "dst"), nBuckets)(
          d, batchId)
      }
  }
}
