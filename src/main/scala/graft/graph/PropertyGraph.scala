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
  import PropertyGraph.{Direction, Out, In, Both, PatternNode, PatternStep}

  /** Node-table lookup with a POINTED unknown-label message — a raw
    * Map access surfaces as the bare `key not found: X` (round-17
    * probe: `MATCH (e:Encounter) …` on a graph without that label).
    */
  def nodeTable(label: String): DataFrame =
    nodes.getOrElse(label, throw new IllegalArgumentException(
      s"no node label '$label' — labels here: " +
        nodes.keys.toSeq.sorted.mkString(", ")))

  /** Single-hop expansion: follow `relType` forward from `ids("id")`.
    * Returns the distinct arrival SET (one exchange).
    */
  def out(relType: String, ids: DataFrame): DataFrame =
    step(relType, Out, ids).distinct()

  /** Single-hop expansion AGAINST the edge direction (the Cypher
    * `<-[:REL]-` arrowhead, reference rag.baml:279): arrive at the
    * SOURCES of `relType` edges whose dst is in `ids("id")`. Distinct.
    */
  def in(relType: String, ids: DataFrame): DataFrame =
    step(relType, In, ids).distinct()

  /** One hop WITHOUT dedup — one row per (incoming row, matching
    * edge). Multi-step chains dedup ONCE at pattern end instead of
    * paying an exchange per hop (the round-4 per-step distinct made
    * g2 6.8× slower than the joins it compiles to).
    */
  private def step(relType: String, dir: Direction, ids: DataFrame): DataFrame = {
    val (_, _, e) = edges(relType)
    val oriented = dir match {
      case Out => e.select(col("src").as("__f"), col("dst").as("__t"))
      case In  => e.select(col("dst").as("__f"), col("src").as("__t"))
      // undirected: both orientations — a projection-and-union, no
      // extra shuffle (same trick as bfs(undirected = true)). Only
      // reached for same-label edges (matchPattern's guard); the
      // reversed copy drops self-loops so each undirected self-loop
      // relationship matches once, Cypher-style
      case Both => e.select(col("src").as("__f"), col("dst").as("__t"))
        .unionAll(e.select(col("dst").as("__f"), col("src").as("__t"))
          .filter(col("__f") =!= col("__t")))
    }
    oriented.join(ids, oriented("__f") === ids("id")).select(col("__t").as("id"))
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
    // matchPattern's hop chain is label-blind between steps, so an
    // undirected hop is only unambiguous over a same-label edge —
    // use matchPaths (label-typed positions) for heterogeneous ones
    for ((r, d) <- steps if d == Both) {
      val (s, t, _) = edges(r)
      require(s == t, s"undirected step over heterogeneous edge '$r' " +
        s"($s→$t): use matchPaths, whose positions carry labels")
    }
    val start = nodeTable(startLabel).filter(pred).select(col("id"))
    // un-deduped hops, ONE distinct at pattern end: reachability
    // semantics at joins-only cost (fan-in rows are a skinny id
    // column until the single terminal exchange)
    val endIds = steps.foldLeft(start) { case (ids, (r, d)) => step(r, d, ids) }
      .distinct()
    val endLabel = steps.last match {
      case (r, Out) => edges(r)._2
      case (r, In)  => edges(r)._1
      // same-label by the guard loop above, so either endpoint works
      case (r, Both) => edges(r)._1
    }
    nodeTable(endLabel).join(endIds, "id")
  }

  // ---- path-preserving pattern DSL (the Text2Cypher compile target) --

  /** One row per PATH matching a pattern tree — Cypher `MATCH`
    * multiplicity, not reachability: a fan-out pattern (one patient,
    * many immunizations) yields one row per immunization, so
    * `count(*)` over the result agrees with Cypher (the reference's
    * own prompt works around the distinction with `COUNT(DISTINCT p)`,
    * rag.baml:279 — this surface makes both countable).
    *
    * `start` anchors the pattern; each [[PatternStep]] walks one edge
    * from a named earlier position (default: the previous step's
    * node), optionally filtering the arrived-at node MID-CHAIN via a
    * semi-join against the (dimension-sized, broadcastable) node
    * table. Branches — steps anchored `from` a non-terminal alias —
    * make tree patterns expressible, e.g. GoldenQueries.q8's
    * substance→allergy←patient→{address, practitioner} as ONE call.
    *
    * Output: one id column per position, named by alias. No dedup
    * anywhere — wrap with `.distinct()`/`dropDuplicates` for set
    * semantics, or aggregate directly for path counts. Fetch node
    * properties for selected positions with [[attach]].
    */
  def matchPaths(start: PatternNode, steps: Seq[PatternStep]): DataFrame = {
    // steps MAY be empty — `MATCH (n:Label)` alone is a node scan,
    // the anchor shape OPTIONAL MATCH clauses extend
    val aliases = (start +: steps.map(_.node)).map(_.as)
    require(aliases.distinct == aliases, s"duplicate position aliases: $aliases")
    val relVarNames = steps.flatMap(_.relVar)
    require(relVarNames.distinct == relVarNames,
      s"duplicate relationship variables: $relVarNames")
    require((relVarNames.toSet & aliases.toSet).isEmpty,
      s"relationship variables shadow node aliases: ${relVarNames.toSet & aliases.toSet}")
    val aliasLabel = (start +: steps.map(_.node)).map(n => n.as -> n.label).toMap
    // Whole-pattern relationship isomorphism (Cypher/Neo4j MATCH
    // semantics, PER CLAUSE): a relationship binds AT MOST ONCE across
    // one MATCH clause's pattern — `(b)<-[:R]-(a)-[:R]->(c)` must not
    // walk the same edge out and back. Steps carry a `clause` tag:
    // uniqueness is enforced only among steps of the SAME clause
    // (Neo4j semantics — `MATCH (a)-[:R]->(b) MATCH (a)-[:R]->(b)`
    // may rebind the same relationship), and only among steps that
    // share an edge table (same rel type, or untyped overlapping it):
    // steps over disjoint tables cannot bind the same relationship,
    // so the common heterogeneous chain keeps its skinny 2-column
    // joins with ZERO overhead — the path frame carries a per-clause
    // traversed-edge set (`__peids_<clause>`, ≤ one entry per pattern
    // step + var-length hops, a per-row constant) only when a
    // collision is possible. Var-length steps already enforce
    // uniqueness WITHIN their own chain; when colliding, their whole
    // traversed set joins the clause-wide one.
    val relNamesOf: PatternStep => Set[String] =
      st => if (st.rel.isEmpty) edges.keySet
        else st.rel.split('|').toSet
    val colliding: Set[Int] = steps.indices.filter { i =>
      steps.indices.exists(j =>
        j != i && steps(i).clause == steps(j).clause &&
          (relNamesOf(steps(i)) & relNamesOf(steps(j))).nonEmpty)
    }.toSet
    // relationship identity as a STRING (relType \0 src \0 dst) — the
    // id-type-agnostic form (long ids in TPC-H graphs, string ids in
    // FHIR), shared by both traversal orientations of one edge row
    def eidStr(c: Column): Column = concat_ws("\u0000",
      c.getField("r"), c.getField("s").cast("string"),
      c.getField("d").cast("string"))
    val emptyEids = array().cast("array<string>")
    // clauses with an accumulated traversed-edge column so far; the
    // isomorphism join only tests overlap against the STEP'S OWN
    // clause's set (`__peids_<clause>`)
    val peidClauses = scala.collection.mutable.Set.empty[Int]
    val s0 = nodeTable(start.label)
    var df = start.pred.foldLeft(s0)((d, p) =>
        filterPointed(d, start.label, start.as, p))
      .select(col("id").as(start.as))
    var prev = start.as
    for ((st, stepIdx) <- steps.zipWithIndex) {
      // zero-length hops get their own pointed reject: *0.. means
      // the arrival may BE the anchor (possibly under a different
      // label) — a union this join-chain engine does not model
      require(st.minHops >= 1,
        s"step ${st.rel}: zero-length hops (*0..) are unsupported — " +
          "the arrival would alias the anchor itself; UNION the " +
          "0-hop case (the anchor) with the *1.. form instead")
      require(st.maxHops >= st.minHops,
        s"step ${st.rel}: bad hop bounds *${st.minHops}..${st.maxHops}")
      val anchor = st.from.getOrElse(prev)
      require(df.columns.contains(anchor), s"unknown anchor alias '$anchor'")
      val anyRel = st.rel.isEmpty
      val multiHop = st.maxHops > 1

      /** The step's oriented edge relation. `withEid` (multi-hop only)
        * carries the relationship IDENTITY — the (relType, src, dst) of
        * the ORIGINAL row, shared by both traversal orientations — so
        * var-length chains can enforce Cypher's relationship-uniqueness
        * (no relationship reused within one path; parallel edges
        * collapsing to the same (src, dst) are one relationship in this
        * DataFrame edge model). Single-hop steps skip it: their plans
        * stay the skinny 2-column joins they always were.
        */
      def oriented(relName: String, sl: String, dl: String, e: DataFrame,
          withEid: Boolean): DataFrame = {
        val eidCols =
          if (withEid) Seq(struct(lit(relName).as("r"),
            col("src").as("s"), col("dst").as("d")).as("__eid"))
          else Seq.empty[Column]
        // requested edge PROPERTY columns ride the oriented relation
        // unchanged (orientation-independent); validated loudly here
        // rather than as a downstream unresolved-column error
        val extraCols = (st.relProps ++ st.relPredProps).distinct.map { p =>
          require(e.columns.contains(p),
            s"edge table '$relName' has no property '$p' " +
              s"(columns: ${e.columns.mkString(", ")})")
          col(p)
        } ++ eidCols
        def fwd = e.select(
          col("src").as("__from") +: col("dst").as("__to") +: extraCols: _*)
        def bwd = e.select(
          col("dst").as("__from") +: col("src").as("__to") +: extraCols: _*)
        // same-label edge, both orientations: a SELF-LOOP row would
        // appear in each — Cypher matches an undirected self-loop
        // once, so the reversed copy drops it
        def sym = fwd.unionAll(bwd.filter(col("__from") =!= col("__to")))
        st.dir match {
          case Out => fwd
          case In  => bwd
          // untyped (`-[r]-` / `-[r*1..4]-`, the README.md:137 shape):
          // label-blind symmetrization — sound ONLY under the untyped
          // contract of globally-unique node ids (matchPaths scaladoc)
          case Both if anyRel => sym
          case Both if multiHop =>
            // undirected var-length: intermediate positions carry no
            // label, so orientation-by-label has nothing to type
            // against mid-chain — sound only over a same-label edge
            require(sl == dl,
              s"undirected var-length '-[:$relName*…]-' over heterogeneous " +
                s"edge $sl→$dl is unsupported (intermediates are unlabeled); " +
                "use a same-label edge view or bfs(undirected = true)")
            // …and the ANCHOR and ARRIVAL labels must be that label
            // too (or unlabeled): per-label id spaces may overlap, so
            // joining a foreign-label anchor against this edge's key
            // space would silently traverse bogus rows — the same
            // leak the single-hop branch rejects below
            val al = aliasLabel(anchor)
            require(al.isEmpty || al == sl,
              s"undirected var-length anchor label '$al' does not match " +
                s"edge '$relName' ($sl→$dl)")
            require(st.node.label.isEmpty || st.node.label == sl,
              s"undirected var-length arrival label '${st.node.label}' does " +
                s"not match edge '$relName' ($sl→$dl)")
            sym
          case Both =>
            // undirected single-hop: only TYPE-COMPATIBLE orientations
            // — BOTH the anchor's label and the declared arrival label
            // must match the edge's endpoint labels for an orientation
            // to apply. Deciding by labels (not a post-hoc id
            // semi-join) matters because per-label id spaces may
            // overlap: an id existing in both tables would otherwise
            // leak through from the wrong side — and an anchor-side
            // mismatch would join the anchor ids against a foreign key
            // space.
            val al = aliasLabel(anchor)
            val fwdOk = sl == al && dl == st.node.label
            val bwdOk = dl == al && sl == st.node.label
            require(fwdOk || bwdOk,
              s"undirected step ($al)-[:$relName]-(${st.node.label}) fits " +
                s"neither orientation of edge $sl→$dl")
            if (fwdOk && bwdOk) sym
            else if (fwdOk) fwd else bwd
        }
      }
      def stepRel(withEid: Boolean): DataFrame =
        if (anyRel) {
          require(edges.nonEmpty, "untyped step needs at least one edge table")
          // id-TYPE soundness: the label-blind union coerces src/dst
          // columns to one type — a String/numeric mix would die in a
          // cryptic cast (or silently coerce) mid-union, so reject
          // pointedly naming the offenders. Numeric WIDTHS (int vs
          // bigint) widen losslessly and stay allowed.
          val idTypes = edges.toSeq.flatMap { case (rn, (_, _, e)) =>
            Seq(rn -> e.schema("src").dataType,
              rn -> e.schema("dst").dataType)
          }
          def family(t: org.apache.spark.sql.types.DataType): String =
            t match {
              case _: org.apache.spark.sql.types.NumericType => "numeric"
              case other => other.simpleString
            }
          require(idTypes.map(t => family(t._2)).distinct.size == 1,
            "untyped step unions edge tables with MIXED id types (" +
              idTypes.map { case (rn, t) => s"$rn:${t.simpleString}" }
                .distinct.mkString(", ") +
              ") — type the edge (`-[:REL]->`) or normalize ids to " +
              "one type")
          edges.toSeq.sortBy(_._1)
            .map { case (rn, (sl, dl, e)) => oriented(rn, sl, dl, e, withEid) }
            .reduce(_ unionAll _)
        } else if (st.rel.contains('|')) {
          // multi-type step (`-[:R1|R2]->`, the Cypher alternation):
          // the union of the named edge tables' oriented relations.
          // SOUNDNESS GATE: all alternatives must share the same
          // endpoint labels — per-label id spaces may overlap, so a
          // union across differently-labeled edges would silently
          // cross key spaces (the leak the untyped contract guards
          // with its global-id assertion; an untyped step over a
          // validated graph is the escape hatch).
          val alts0 = st.rel.split('|').toSeq
          for (rn <- alts0) require(edges.contains(rn),
            s"multi-type step: no edge table '$rn' " +
              s"(${edges.keys.toSeq.sorted.mkString(", ")})")
          // Neo4j parity: members whose endpoint labels CONTRADICT the
          // declared positions simply cannot match — they drop from
          // the union instead of poisoning the soundness gate
          // (`(a:A)-[:X|Y]->(b:B)` where Y runs B→A keeps only X; no
          // members left = a correct-EMPTY result, not an error).
          // Alternation position labels (`A|B`) admit their members.
          val alts = {
            val aL = aliasLabel(anchor); val nL = st.node.label
            def admits(pos: String, l: String): Boolean =
              pos.isEmpty || pos.split('|').contains(l)
            def fits(sl: String, dl: String): Boolean = st.dir match {
              case Out  => admits(aL, sl) && admits(nL, dl)
              case In   => admits(aL, dl) && admits(nL, sl)
              case Both => (admits(aL, sl) && admits(nL, dl)) ||
                (admits(aL, dl) && admits(nL, sl))
            }
            alts0.filter { rn =>
              val (sl, dl, _) = edges(rn); fits(sl, dl)
            }
          }
          if (alts.isEmpty) {
            // schema-correct empty relation (first member's shape)
            val (sl, dl, e) = edges(alts0.head)
            oriented(alts0.head, sl, dl, e, withEid).where(lit(false))
          } else {
          val shapes = alts.map { rn =>
            val (sl, dl, _) = edges(rn); (sl, dl)
          }.distinct
          if (shapes.size > 1) {
            // MIXED endpoint labels (`-[:EXPERIENCES|HAS_IMMUNIZATION]
            // ->` fans to Allergy AND Immunization): sound ONLY when
            // each mixed side is COVERED by its label-alternation
            // union view — mounted and id-disjointness-VALIDATED by
            // the query entry (CypherLite's endpoint inference fills
            // the position with exactly that label), so the union
            // cannot cross key spaces. Undirected/var-length keep the
            // same-shape requirement (orientation-by-label and
            // unlabeled intermediates have nothing to type against).
            require(st.dir != Both && !multiHop,
              s"multi-type step -[:${st.rel}]- over MIXED endpoint " +
                s"labels ($shapes) supports single-hop directed " +
                "steps only")
            val sSet = shapes.map(_._1).distinct.sorted
            val dSet = shapes.map(_._2).distinct.sorted
            val (anchorSet, nodeSet) =
              if (st.dir == Out) (sSet, dSet) else (dSet, sSet)
            def covered(pos: String, set: Seq[String],
                side: String): Unit =
              require(set.size == 1 || (pos.nonEmpty &&
                  set.toSet.subsetOf(pos.split('|').toSet)),
                s"multi-type step -[:${st.rel}]- unions edges with " +
                  s"different $side labels (${set.mkString(", ")}) — " +
                  s"the $side position must carry a label alternation " +
                  s"covering :${set.mkString("|")} so the union view " +
                  "can validate id disjointness")
            covered(aliasLabel(anchor), anchorSet, "source")
            covered(st.node.label, nodeSet, "arrival")
            // id-TYPE soundness per union side (same discipline as
            // the untyped branch: a string/numeric mix coerces or
            // dies mid-union)
            def fam(t: org.apache.spark.sql.types.DataType): String =
              t match {
                case _: org.apache.spark.sql.types.NumericType => "numeric"
                case other => other.simpleString
              }
            for (side <- Seq("src", "dst"))
              require(alts.map(rn =>
                  fam(edges(rn)._3.schema(side).dataType))
                .distinct.size == 1,
                s"multi-type step -[:${st.rel}]-: the $side ids mix " +
                  "string and numeric types across the alternation — " +
                  "normalize ids to one type")
          }
          alts.sorted.map { rn =>
            val (sl, dl, e) = edges(rn); oriented(rn, sl, dl, e, withEid)
          }.reduce(_ unionAll _)
          }
        } else {
          require(edges.contains(st.rel),
            s"no edge table '${st.rel}' " +
              s"(${edges.keys.toSeq.sorted.mkString(", ")})")
          val (sl, dl, e) = edges(st.rel)
          oriented(st.rel, sl, dl, e, withEid)
        }
      // var-length (*min..max): union-all of h-fold edge chains — one
      // row per PATH of each length (Cypher multiplicity; intermediate
      // positions are unaliased). The chains self-join the skinny
      // edge relation, never the path frame, so the fan-out is bounded
      // by real path counts, not pattern width. Each chain row carries
      // its traversed-relationship set and a hop extends it only with
      // an UNUSED relationship — Cypher's relationship-uniqueness
      // (without it an undirected walk would count trivial
      // back-and-forth repetitions; bounded hops keep the carried
      // array ≤ maxHops entries, a per-row constant).
      val collide = colliding(stepIdx)
      // a named relationship variable that a caller wants returned —
      // the step materializes its relationship identity (single-hop:
      // one eid string; var-length: the traversed eids in PATH order)
      // under the variable's name. Steps without a used variable keep
      // their skinny 2-column plans.
      val wantVar = st.relVar.isDefined
      // a nodes(p) walk additionally carries its arrival-node array —
      // only meaningful (and only built) on var-length steps; fixed
      // steps' arrivals are the aliased columns already in the frame
      val wantNodeArr = st.nodeArr.isDefined
      require(!wantNodeArr || multiHop,
        s"step ${st.rel}: nodeArr is a var-length payload (fixed steps " +
          "carry their arrival as the aliased column)")
      require(st.relLen.isEmpty || multiHop,
        s"step ${st.rel}: relLen is a var-length payload (a fixed step's " +
          "hop count is the constant 1)")
      require(st.relProps.isEmpty || (wantVar && !multiHop),
        s"step ${st.rel}: relationship properties need a named single-hop " +
          "variable (a var-length path has many relationships — aggregate " +
          "per hop with a chain of single-hop steps instead)")
      require(st.relPred.isEmpty || !multiHop,
        s"step ${st.rel}: relationship predicates over var-length steps " +
          "are unsupported (which of the path's relationships would they " +
          "constrain? — chain single-hop steps instead)")
      val ed0 =
        if (!multiHop) stepRel(withEid = collide || wantVar)
        else {
          val base = stepRel(withEid = true)
          // PLAN NOTE (r20, measured): the h-fold chain union below
          // textually duplicates each chain's prefix (chain h contains
          // chain h−1's subtree), but for the literal-anchored
          // patterns the engine compiles (`(a {id: 'x'})-[:R*1..k]->`)
          // Catalyst's constraint propagation infers `__from = 'x'`
          // through the path join and pushes it through the union into
          // EVERY chain branch's first-hop scan — the whole pipeline
          // stays one fused codegen pass over anchored frontiers
          // (plans/r20/g16_*_before.txt: the anchor equality sits in
          // the chain-side scan Filters). Two "obvious" rewrites were
          // built and REVERTED after measuring (r20): (1) a runtime
          // semi-join seed of hop 1 against the distinct anchor ids —
          // redundant with the pushed constant, +0.3–0.5 s of
          // broadcast/distinct machinery per query at sf0.1; (2) lazy
          // persistence of shared chain prefixes — the cache barrier
          // BLOCKS that pushdown (filters reach an InMemoryTableScan
          // but never the plan inside the cache), so without (1) it
          // would materialize UNPRUNED full-graph chains (180 M rows
          // at sf0.1 for 3 hops, measured in DuckDB), and with (1) it
          // still lost the codegen fusion for no local win. A
          // NON-literal anchor frame (no constant to propagate) would
          // re-enable full-graph enumeration — no registry query
          // compiles that shape; if one ever does, seed hop 1 with the
          // semi-join from (1) for exactly that step.
          // the arrival-node array rides the chain build only when a
          // nodes(p) item asked for it — otherwise the fold keeps the
          // (from, to, eids) shape it always had
          val nidsFirst =
            if (wantNodeArr) Seq(array(col("__to")).as("__nids"))
            else Seq.empty[Column]
          val first = base.select(col("__from") +: col("__to") +:
            array(col("__eid")).as("__eids") +: nidsFirst: _*)
          val hChains = (2 to st.maxHops).scanLeft(first) { (acc, _) =>
            val nxt = base.select(col("__from").as("__f2"),
              col("__to").as("__t2"), col("__eid").as("__eid2"))
            val nidsNext =
              if (wantNodeArr)
                Seq(concat(col("__nids"), array(col("__t2"))).as("__nids"))
              else Seq.empty[Column]
            acc.join(nxt, col("__to") === col("__f2") &&
                !array_contains(col("__eids"), col("__eid2")))
              .select(col("__from") +: col("__t2").as("__to") +:
                concat(col("__eids"), array(col("__eid2"))).as("__eids") +:
                nidsNext: _*)
          }
          // a colliding var-length step keeps its traversed set so the
          // clause-wide isomorphism join below can see it. A length-
          // only payload (relLen, no array consumer) rides as a
          // LITERAL per h-chain — the h-th chain's rows are exactly
          // h hops, so nothing array-sized leaves the build.
          hChains.slice(st.minHops - 1, st.maxHops).zipWithIndex
            .map { case (c, i) =>
              val keep = Seq(col("__from"), col("__to")) ++
                (if (collide || wantVar) Seq(col("__eids")) else Seq.empty) ++
                (if (wantNodeArr) Seq(col("__nids")) else Seq.empty) ++
                (if (st.relLen.isDefined)
                  Seq(lit(st.minHops + i).as("__hops")) else Seq.empty)
              c.select(keep: _*)
            }
            .reduce(_ unionAll _)
        }
      var ed = ed0
      // mid-chain node predicate: restrict the edge relation's arrival
      // side BEFORE it meets the path frame (dimension-sized filtered
      // id set → broadcast semi-join on the skinny edge table). Doing
      // it here rather than after the path join keeps optional-step
      // semantics right too: an arrival failing the predicate is NOT a
      // match, so the left join below keeps the row with a null.
      for (p <- st.node.pred) {
        val ids = filterPointed(nodeTable(st.node.label), st.node.label,
          st.node.as, p).select(col("id"))
        ed = ed.join(ids, ed("__to") === ids("id"), "left_semi")
      }
      // edge predicate: restrict the edge relation BEFORE it meets
      // the path frame — same discipline (and same optional-step
      // semantics) as the mid-chain node predicate above
      for (rp <- st.relPred) ed = ed.filter(rp)
      // the step's own relationship identities, as strings, when the
      // step can collide with another step's edge table
      val newEids: Option[Column] =
        if (!collide) None
        else if (multiHop) Some(transform(col("__eids"), eidStr(_)))
        else Some(array(eidStr(col("__eid"))))
      // the variable's materialized form: one eid string for a
      // single-hop step, the eids in path order for var-length
      val varCol: Seq[Column] = st.relVar.toSeq.map { v =>
        (if (multiHop) transform(col("__eids"), eidStr(_))
        else eidStr(col("__eid"))).as(v)
      }
      // edge properties arrive as `<var>_<prop>` — the same naming the
      // node-property attach uses, so downstream projection resolves
      // both the same way
      val relPropCols: Seq[Column] = st.relVar.toSeq.flatMap(v =>
        st.relProps.map(p => col(p).as(s"${v}_$p")))
      val nodeArrCol: Seq[Column] =
        st.nodeArr.toSeq.map(v => col("__nids").as(v))
      // hop count as a 4-byte int — the length(p) payload when the
      // eid array itself is unreferenced (the array still guarded
      // relationship-uniqueness inside the chain build above)
      val relLenCol: Seq[Column] =
        st.relLen.toSeq.map(v => col("__hops").as(v))
      val edr = ed.select(
        col("__from") +: col("__to").as(st.node.as) +:
          (newEids.map(_.as("__neids")).toSeq ++ varCol ++ relPropCols ++
            nodeArrCol ++ relLenCol): _*)
      // isomorphism join: a colliding step may not reuse a
      // relationship its OWN clause already traversed — the overlap
      // test rides the join condition, so an optional step failing it
      // keeps its outer row with nulls (a non-match), exactly like a
      // failed node match
      val peidCol = s"__peids_${st.clause}"
      val joinCond =
        if (collide && peidClauses(st.clause))
          df(anchor) === edr("__from") &&
            !arrays_overlap(df(peidCol), edr("__neids"))
        else df(anchor) === edr("__from")
      df = df.join(edr, joinCond,
        if (st.optional) "left_outer" else "inner").drop("__from")
      if (collide) {
        // null __neids (unmatched optional step) contributes nothing
        val add = coalesce(col("__neids"), emptyEids)
        df = (if (peidClauses(st.clause))
          df.withColumn(peidCol, concat(col(peidCol), add))
        else df.withColumn(peidCol, add)).drop("__neids")
        peidClauses += st.clause
      }
      prev = st.node.as
    }
    peidClauses.foldLeft(df)((d, c) => d.drop(s"__peids_$c"))
  }

  /** Join node properties onto a [[matchPaths]] result for position
    * `alias` (label `label`): each requested property arrives as
    * `prefix + name`. Node tables are dimension-sized next to the
    * path set, so Catalyst/AQE broadcasts this join.
    */
  /** Apply a node predicate with a POINTED unknown-property reject:
    * a WHERE referencing a property the label's table lacks would
    * otherwise die as a raw Spark UNRESOLVED_COLUMN
    * AnalysisException three plan layers from the user's typo. The
    * message names the label's columns and states the documented
    * divergence: Neo4j returns null for an unknown property, this
    * engine rejects to surface typos (same discipline relationship
    * properties already get).
    */
  private def filterPointed(df: DataFrame, label: String, as: String,
      p: Column): DataFrame =
    try df.filter(p)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if String.valueOf(e.getMessage).contains("RESOLVED_COLUMN") ||
            String.valueOf(e.getMessage).contains("cannot be resolved") =>
        throw new IllegalArgumentException(
          s"WHERE on '$as:$label' references a property its node " +
            s"table does not carry (columns: ${
              nodeTable(label).columns.filterNot(_ == "id").sorted
                .mkString(", ")}); Neo4j would return null for an " +
            "unknown property — this engine rejects to surface typos",
          e)
    }

  def attach(paths: DataFrame, alias: String, label: String,
      props: Seq[String], prefix: String = "",
      joinType: String = "inner"): DataFrame = {
    val tbl = nodeTable(label)
    // validate the TOP-LEVEL column only — a dotted prop reads a
    // struct field, whose existence the select below still checks
    val missing = props.filterNot(pr =>
      tbl.columns.contains(pr.split('.').head))
    require(missing.isEmpty,
      s"alias '$alias' (:$label): unknown propert${
        if (missing.size == 1) "y" else "ies"} ${
        missing.mkString(", ")} — the node table's columns are ${
        tbl.columns.filterNot(_ == "id").sorted.mkString(", ")}; " +
        "Neo4j would return null for an unknown property — this " +
        "engine rejects to surface typos")
    val n = tbl.select(
      col("id").as(alias) +: props.map(p => col(p).as(s"$prefix$p")): _*)
    paths.join(n, Seq(alias), joinType)
  }

  /** Bounded variable-length reachability (Cypher `*1..max` analog,
    * reference README.md:137): minimal depth per reached node.
    * Returns (id, depth), depth 0 = the start set itself.
    * `undirected = true` walks edges both ways (the README's
    * `-[r*1..4]-` pattern) by symmetrizing the edge set — a
    * projection-and-union, no extra shuffle: each BFS level still
    * shuffles once, on a frontier at most 2× the directed one.
    *
    * Frontiers checkpoint every `checkpointEvery` levels — the
    * iterative-algorithm lineage discipline (GraphX/Pregel do the
    * same): without truncation the plan tree doubles per level (the
    * frontier appears in both the next join and the visited
    * anti-join), an O(2^h) blow-up past ~5 hops. Checkpointing EVERY
    * level (round 4) over-corrected: each eager checkpoint is a
    * blocking job, so a 3-hop walk paid three serial materializations
    * to prevent a recompute that shallow depths make trivial. The
    * early-exit probe (empty frontier) rides the checkpoint
    * boundaries, where it scans cached blocks instead of re-deriving
    * the walk.
    *
    * `reliable = false` uses localCheckpoint: fastest, but its blocks
    * live on executors — unrecoverable on executor loss and unsafe
    * with dynamic allocation. For cluster runs set `reliable = true`
    * (plus `spark.sparkContext.setCheckpointDir`) to write frontiers
    * to the checkpoint store instead; the local bench keeps the fast
    * path. Frontier blocks are freed by the ContextCleaner when the
    * result is GC'd.
    */
  def bfs(edgeSet: DataFrame, start: DataFrame, maxHops: Int,
      undirected: Boolean = false, checkpointEvery: Int = 3,
      reliable: Boolean = false): DataFrame = {
    require(checkpointEvery >= 1)
    val es =
      if (undirected)
        edgeSet.unionAll(edgeSet.select(col("dst").as("src"), col("src").as("dst")))
      else edgeSet
    var visited = start.select(col("id"), lit(0).as("depth"))
    var frontier = start.select("id")
    var exhausted = false
    for (h <- 1 to maxHops if !exhausted) {
      frontier = es.join(frontier, es("src") === frontier("id"))
        .select(es("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
      if (h % checkpointEvery == 0 && h < maxHops) {
        frontier =
          if (reliable) frontier.checkpoint(true) else frontier.localCheckpoint(true)
        exhausted = frontier.isEmpty
      }
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

  /** Undirected (`-[:REL]-`): the step matches the edge in EITHER
    * orientation — compiled as a projection-and-union of the two
    * directions, no extra shuffle. Var-length undirected
    * (`-[:REL*1..4]-`, reference README.md:137) enforces Cypher's
    * relationship-uniqueness via eid-carrying chains (same-label
    * edges only — intermediates are unlabeled);
    * [[PropertyGraph.bfs]] with `undirected = true` remains the
    * minimal-depth REACHABILITY form.
    */
  case object Both extends Direction

  /** A pattern position: node `label`, output alias `as`, optional
    * node predicate (applied mid-chain via a semi-join — the Cypher
    * `(p:Patient {id: 45})` inline filter).
    */
  final case class PatternNode(label: String, as: String, pred: Option[Column] = None)

  /** One pattern edge: walk `rel` in `dir` arriving at `node`,
    * anchored at the position named `from` (default: the previous
    * step's node — a chain; naming an earlier alias makes a branch).
    * `optional = true` is Cypher OPTIONAL MATCH — a left join that
    * keeps the path row with a null position when no edge matches.
    * `minHops`/`maxHops` bound a var-length walk (`*1..3`): the step
    * matches any path of that length through `rel`, one output row
    * per path (relationship-uniqueness enforced WITHIN the step's
    * own walk AND — since round 10 — ACROSS steps: [[matchPaths]]
    * enforces Cypher's whole-pattern relationship isomorphism among
    * steps sharing an edge table, threading a traversed-edge set
    * through the joins only when a collision is possible),
    * intermediate nodes unaliased.
    * `rel = ""` is the UNTYPED step (Cypher `-[r]-` / `-[r*1..4]-`):
    * it walks EVERY edge table, label-blind — sound only when node
    * ids are globally unique across labels (prefix them if per-label
    * id spaces overlap).
    * `clause` groups steps for relationship isomorphism: uniqueness is
    * enforced only among steps sharing a clause tag (AND an edge
    * table) — a second `MATCH` clause gets a fresh tag, so it may
    * rebind a relationship the first clause traversed (Neo4j
    * semantics).
    * `relVar` names a relationship variable to MATERIALIZE: the output
    * frame carries a column of that name holding the step's
    * relationship identity — `relType NUL src NUL dst` for a
    * single-hop step, the array of those (in path order) for a
    * var-length one. Left as None (the default), the step's plan
    * stays the skinny 2-column join.
    * `relProps` lists EDGE PROPERTY columns to carry through (edge
    * tables may hold columns beyond src/dst — `(src, dst, weight)`);
    * each arrives as `<relVar>_<prop>`. Single-hop named steps only
    * (a var-length path has many relationships); unknown columns
    * reject loudly with the table's column list.
    * `relPred` filters the EDGE RELATION itself (a `WHERE r.prop OP …`
    * condition over raw edge columns, listed in `relPredProps`),
    * applied BEFORE the step joins the path frame — an edge failing
    * it is a non-match, so an optional step keeps its outer row with
    * nulls. Needs no named variable and no materialized columns:
    * a WHERE-only condition keeps the skinny plan plus one filter.
    * `nodeArr` (var-length steps only) names a column to MATERIALIZE
    * holding the walk's ARRIVAL node ids in path order (n1 … nk, the
    * last equal to the step's alias value) — the Cypher `nodes(p)`
    * payload. Direction-aware where the eid array is not: an
    * undirected walk's eids keep the original row's (src, dst), but
    * the node array records the ids as traversed. Left as None the
    * walk carries no node payload.
    * `relLen` (var-length steps only) names an INT column holding the
    * walk's hop count — the `length(p)` payload when nothing reads
    * the eids themselves: a 4-byte int rides the hop-union shuffle
    * and every downstream join/window instead of a maxHops-element
    * string array (the eid array still exists INSIDE the chain build
    * for relationship-uniqueness; it just doesn't leave it).
    */
  final case class PatternStep(rel: String, dir: Direction, node: PatternNode,
      from: Option[String] = None, optional: Boolean = false,
      minHops: Int = 1, maxHops: Int = 1,
      clause: Int = 0, relVar: Option[String] = None,
      relProps: Seq[String] = Seq.empty,
      relPred: Option[Column] = None,
      relPredProps: Seq[String] = Seq.empty,
      nodeArr: Option[String] = None,
      relLen: Option[String] = None)

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
