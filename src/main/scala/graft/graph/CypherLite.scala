package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A Cypher-pattern front end over [[PropertyGraph.matchPaths]] — the
  * textual entry a Text2Cypher client targets (the reference executes
  * LLM-generated Cypher verbatim, src/rag.py:48-76, with the prompt
  * contract constraining it to MATCH patterns over the pruned schema,
  * rag.baml:65-102). This parses that constrained shape plus the
  * clauses the reference's example corpus actually exercises
  * (rag.baml:228-289: WHERE, COUNT(DISTINCT …), OPTIONAL MATCH,
  * ORDER BY/LIMIT, var-length `*1..n`) and compiles them to the
  * join-based path DSL:
  *
  * {{{
  * MATCH (s:Substance {id: 'shellfish'})-[:CAUSES]->(a:Allergy)
  *       <-[:EXPERIENCES]-(p:Patient)
  * WHERE p.city = 'Boston'
  * RETURN a.category AS cat, count(DISTINCT p) AS n_patients
  * ORDER BY n_patients DESC LIMIT 10
  * }}}
  *
  * Supported surface:
  *  - chain patterns of `(alias:Label {prop: literal, …})` nodes
  *    joined by `-[:REL]->` / `<-[:REL]-` / undirected `-[:REL]-`
  *    edges; comma-separated parts branch off bound aliases; literals
  *    are single-quoted strings, integers, decimals, booleans.
  *  - var-length edges `-[:REL*1..3]->` / `-[:REL*2]->` (bounds
  *    required — unbounded `*` is rejected, the scale rule), in every
  *    direction INCLUDING undirected `-[:REL*1..4]-` (relationship-
  *    uniqueness enforced via eid-carrying chains WITHIN each
  *    var-length step — across separate steps Cypher's whole-pattern
  *    relationship isomorphism is not enforced, a documented
  *    divergence; same-label edges only — intermediates are
  *    unlabeled).
  *  - the reference README.md:137 demo shape verbatim:
  *    `MATCH (a)-[r*1..4]-(b) RETURN *` — unlabeled nodes scan the
  *    ANY-node view (union of all labels' ids — requires globally
  *    unique node ids), an untyped edge walks every edge table, a
  *    relationship variable parses but is not returnable (edge rows
  *    have no materialized identity — documented Kuzu divergence),
  *    and `RETURN *` yields every node alias's id in binding order.
  *  - `OPTIONAL MATCH` clauses (one chain each, anchored at a bound
  *    alias). A clause compiles to an INNER sub-pattern left-joined
  *    as a UNIT — Cypher all-or-nothing semantics: if any step of
  *    the clause fails, every alias it binds is null together (never
  *    partial bindings from per-step left joins).
  *  - per-clause `WHERE alias.prop OP literal [AND …]` with OP in
  *    `= <> < <= > >= CONTAINS STARTS WITH ENDS WITH IN [list]
  *    IS NULL IS NOT NULL`, in the standard order
  *    `MATCH … WHERE … OPTIONAL MATCH … WHERE …`. Each condition
  *    compiles to a node predicate at its pattern position
  *    (semi-join against the dimension-sized node table BEFORE the
  *    path join). A WHERE may only reference aliases ITS clause
  *    binds — plus, for OPTIONAL MATCH, the clause's anchor: on a
  *    required MATCH it filters the pattern; on an OPTIONAL MATCH it
  *    narrows that match (anchor conditions included — rows failing
  *    them keep nulls, Neo4j semantics); any other cross-clause
  *    reference is rejected loudly rather than silently changing
  *    required/optional semantics. Boolean structure: AND/OR with
  *    standard precedence (AND binds tighter) and PARENTHESIZED
  *    nesting to any depth — `(a OR b) AND c`, `x AND (y OR (z AND
  *    w))`. A single-alias conjunct compiles to a node predicate
  *    (semi-join BEFORE the path join — the fast path); a CROSS-ALIAS
  *    conjunct (`a.x = 1 OR b.y = 2`) compiles to a post-join row
  *    filter over attached property columns — required MATCH only
  *    (on an OPTIONAL MATCH it would silently change left-join
  *    semantics, so there it stays a loud reject).
  *  - `RETURN [DISTINCT] item, …` where item is `alias.prop`,
  *    bare `alias` (its id), `count(*)`, or
  *    `count|sum|min|max|avg([DISTINCT] alias[.prop])`; aggregates
  *    require `AS name` (plain items default to `alias_prop`).
  *    Mixing plain + aggregate items groups by the plain items —
  *    Cypher's implicit grouping. Without RETURN: the raw path frame
  *    (one id column per alias, one row per path).
  *  - `ORDER BY out_col [ASC|DESC], … LIMIT n` over the RETURN names.
  *
  * String literals may not contain commas, braces, or the word AND
  * (the splitter is regex-based, not a full lexer — fine for
  * generated key lookups, loud for anything else).
  */
object CypherLite {

  import PropertyGraph.{Direction, In, Out, Both, PatternNode, PatternStep}

  /** One RETURN item: `agg = None` → a plain (grouping) item; `prop =
    * None` → the alias's id column; `distinct` only with count.
    */
  final case class ReturnItem(
      agg: Option[String], distinct: Boolean,
      alias: String, prop: Option[String], as: String) {
    def isStar: Boolean = alias == "*"
  }

  /** One compiled OPTIONAL MATCH clause: a chain of (required) steps
    * anchored at `anchor`, left-joined as a UNIT — all-or-nothing,
    * Cypher clause semantics: if ANY step fails, every alias the
    * clause binds is null (per-step left joins would leak partial
    * bindings and inflate multiplicity). `anchorPred` holds WHERE
    * conditions on the anchor itself: they narrow the MATCH, not the
    * outer row set — an anchor failing the predicate keeps its outer
    * row with the clause aliases null (Neo4j OPTIONAL-MATCH-WHERE).
    */
  final case class OptClause(anchor: String, steps: Seq[PatternStep],
      anchorPred: Option[Column] = None)

  /** A cross-alias WHERE conjunct (`a.x = 1 OR b.y = 2`) compiled for
    * the JOINED path frame: `props` are the (alias, prop) columns the
    * filter reads — attached as `alias__w_prop` before filtering,
    * dropped after — and `cond` the boolean over them. Required-MATCH
    * only (on an OPTIONAL MATCH a row filter would silently change
    * left-join semantics).
    */
  final case class RowPred(props: Seq[(String, String)], cond: Column)

  final case class Parsed(
      start: PatternNode, steps: Seq[PatternStep],
      labels: Map[String, String], returns: Seq[ReturnItem],
      optionals: Seq[OptClause] = Seq.empty,
      optionalAliases: Set[String] = Set.empty,
      returnDistinct: Boolean = false,
      orderBy: Seq[(String, Boolean)] = Seq.empty,
      limit: Option[Int] = None,
      rowPreds: Seq[RowPred] = Seq.empty)

  private val NodeRe =
    """^\(\s*([A-Za-z_][A-Za-z0-9_]*)?\s*(?::\s*([A-Za-z_][A-Za-z0-9_]*))?\s*(\{[^}]*\})?\s*\)""".r
  // edge token: optional relationship VARIABLE, optional :TYPE (absent
  // = untyped, the README.md:137 `-[r*1..4]-` shape), optional
  // var-length star. Groups: 1 = variable, 2 = type, 3 = star.
  private val EdgeFwdRe =
    """^-\s*\[\s*([A-Za-z_][A-Za-z0-9_]*)?\s*(?::\s*([A-Za-z_][A-Za-z0-9_]*))?\s*(\*[0-9.\s]*)?\s*\]\s*->""".r
  private val EdgeBackRe =
    """^<-\s*\[\s*([A-Za-z_][A-Za-z0-9_]*)?\s*(?::\s*([A-Za-z_][A-Za-z0-9_]*))?\s*(\*[0-9.\s]*)?\s*\]\s*-""".r
  // undirected `-[:REL]-`: like Fwd but the trailing dash must NOT be
  // an arrowhead (tried after Fwd, which consumes `->`)
  private val EdgeUndirRe =
    """^-\s*\[\s*([A-Za-z_][A-Za-z0-9_]*)?\s*(?::\s*([A-Za-z_][A-Za-z0-9_]*))?\s*(\*[0-9.\s]*)?\s*\]\s*-(?!>)""".r
  private val PlainItemRe =
    """^([A-Za-z_][A-Za-z0-9_]*)(?:\.([A-Za-z_][A-Za-z0-9_]*))?(?:\s+(?i:AS)\s+([A-Za-z_][A-Za-z0-9_]*))?$""".r
  private val AggItemRe =
    """^(?i:(count|sum|min|max|avg))\s*\(\s*(?:((?i:DISTINCT))\s+)?(\*|[A-Za-z_][A-Za-z0-9_]*)(?:\.([A-Za-z_][A-Za-z0-9_]*))?\s*\)(?:\s+(?i:AS)\s+([A-Za-z_][A-Za-z0-9_]*))?$""".r
  private val WhereCondRe =
    """^([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)\s*(=|<>|<=|>=|<|>|(?i:CONTAINS)|(?i:IN)|(?i:STARTS\s+WITH)|(?i:ENDS\s+WITH))\s*(.+)$""".r
  // `alias.prop IS [NOT] NULL` — no literal operand, so its own form
  private val WhereNullRe =
    """^([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)\s+(?i:IS)\s+(?:((?i:NOT))\s+)?(?i:NULL)$""".r
  private val OrderItemRe =
    """^([A-Za-z_][A-Za-z0-9_]*)(?:\s+((?i:ASC|DESC)))?$""".r

  private def fail(msg: String, rest: String): Nothing =
    throw new IllegalArgumentException(s"$msg at: '${rest.take(40)}'")

  private def literal(v: String): Any = v.trim match {
    case q if q.startsWith("'") && q.endsWith("'") && q.length >= 2 =>
      q.substring(1, q.length - 1)
    case "true"  => true
    case "false" => false
    case n if n.matches("-?\\d+") => n.toLong
    case n if n.matches("-?\\d*\\.\\d+") => n.toDouble
    case other => throw new IllegalArgumentException(s"unsupported literal '$other'")
  }

  private def parseProps(s: String): Column = {
    val body = s.stripPrefix("{").stripSuffix("}").trim
    require(body.nonEmpty, "empty property map")
    val conds = body.split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2).map(_.trim)
      col(k) === lit(literal(v))
    }
    conds.reduce(_ && _)
  }

  /** `*`-suffix of an edge token → hop bounds. Bounds are mandatory:
    * an unbounded walk over 100 TB of edges is a plan nobody meant.
    */
  private def hopBounds(star: Option[String]): (Int, Int) = star match {
    case None => (1, 1)
    case Some(s) =>
      val body = s.trim.stripPrefix("*").replaceAll("\\s", "")
      body.split("\\.\\.", -1) match {
        case Array(n) if n.matches("\\d+") => (n.toInt, n.toInt)
        case Array("", n) if n.matches("\\d+") => (1, n.toInt)
        case Array(a, b) if a.matches("\\d+") && b.matches("\\d+") => (a.toInt, b.toInt)
        case _ => throw new IllegalArgumentException(
          s"var-length needs explicit bounds (*n, *..n, *a..b), got '*$body'")
      }
  }

  /** Parse a `[MATCH] pattern [OPTIONAL MATCH pattern]* [WHERE …]
    * [RETURN …]` statement. Anonymous nodes get positional aliases
    * `_0, _1, …`.
    */
  def parse(stmt: String): Parsed = {
    val (beforeReturn, returnPart) = stmt.split("(?i)\\bRETURN\\b", 2) match {
      case Array(p)    => (p, None)
      case Array(p, r) => (p, Some(r))
    }
    // clause split FIRST: the leading required MATCH, then OPTIONAL
    // MATCH clauses. Each clause segment may carry its own trailing
    // WHERE (the standard Cypher order `MATCH … WHERE … OPTIONAL
    // MATCH … WHERE …`), and a WHERE binds to ITS clause: conditions
    // on a required-MATCH WHERE filter the pattern; conditions on an
    // OPTIONAL MATCH's WHERE narrow that optional match (unmatched
    // rows keep nulls). No whitespace normalization — the token
    // regexes tolerate \s* themselves, and a global squeeze would
    // silently rewrite spaces INSIDE quoted literals.
    val clauses = beforeReturn.trim.split("(?i)\\bOPTIONAL\\s+MATCH\\b")
      .map { seg =>
        seg.split("(?i)\\bWHERE\\b", 2) match {
          case Array(p)    => (p.trim, None)
          case Array(p, w) => (p.trim, Some(w.trim))
        }
      }
    val matchBody = clauses.head._1.replaceFirst("(?i)^MATCH\\b", "").trim
    require(matchBody.nonEmpty, "empty pattern")

    var idx = 0
    val bound = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val relVars = scala.collection.mutable.Set.empty[String]
    val optionalAliases = scala.collection.mutable.Set.empty[String]
    val steps = scala.collection.mutable.ArrayBuffer.empty[PatternStep]
    val optClauses = scala.collection.mutable.ArrayBuffer.empty[OptClause]
    val rowPreds = scala.collection.mutable.ArrayBuffer.empty[RowPred]
    var start: PatternNode = null

    def parseChain(chain: String, ci: Int,
        into: scala.collection.mutable.ArrayBuffer[PatternStep],
        optional: Boolean): Unit = {
      var rest = chain
      def node(allowBare: Boolean): Either[String, PatternNode] =
        NodeRe.findFirstMatchIn(rest) match {
          case Some(m) =>
            rest = rest.substring(m.end).trim
            val alias = Option(m.group(1)).getOrElse { s"_$idx" }
            idx += 1
            (Option(m.group(2)), Option(m.group(3))) match {
              case (None, None) if allowBare && bound.contains(alias) => Left(alias)
              case (labelOpt, propsOpt) =>
                // no :Label = the ANY-node position (README.md:137
                // `MATCH (a)-[r*1..4]-(b)`), label "": query() mounts
                // a union-of-all-labels id view for it — sound only
                // under globally-unique node ids (the untyped
                // contract); properties beyond `id` don't exist there
                val label = labelOpt.getOrElse("")
                require(!bound.contains(alias), s"duplicate alias '$alias'")
                require(!relVars(alias),
                  s"alias '$alias' already names a relationship variable")
                bound += alias -> label
                if (optional) optionalAliases += alias
                Right(PatternNode(label, alias, propsOpt.map(parseProps)))
            }
          case None => fail("expected (alias:Label {…})", rest)
        }
      def edge(): (String, Direction, Int, Int) = {
        def consume(m: scala.util.matching.Regex.Match,
            dir: Direction): (String, Direction, Int, Int) = {
          rest = rest.substring(m.end).trim
          // a relationship VARIABLE parses and registers (so RETURN/
          // WHERE references to it reject with a precise message) but
          // is never materialized — edge rows have no identity column
          // to return
          for (v <- Option(m.group(1))) {
            require(!bound.contains(v) && !relVars(v),
              s"duplicate relationship variable '$v'")
            relVars += v
          }
          val (lo, hi) = hopBounds(Option(m.group(3)).map(_.trim).filter(_.nonEmpty))
          // type absent = untyped step (rel "" walks every edge table)
          (Option(m.group(2)).getOrElse(""), dir, lo, hi)
        }
        EdgeFwdRe.findFirstMatchIn(rest) match {
          case Some(m) => consume(m, Out)
          case None => EdgeBackRe.findFirstMatchIn(rest) match {
            case Some(m) => consume(m, In)
            case None => EdgeUndirRe.findFirstMatchIn(rest) match {
              case Some(m) => consume(m, Both)
              case None => fail("expected -[:REL]->, <-[:REL]- or -[:REL]-", rest)
            }
          }
        }
      }
      // chain anchor: the first chain introduces the start node;
      // later chains and OPTIONAL MATCH clauses re-enter at a bound
      // alias
      var anchor: Option[String] = node(allowBare = ci > 0) match {
        case Left(alias) => Some(alias)
        case Right(n) if ci == 0 => start = n; None
        case Right(n) =>
          fail(s"pattern part ${ci + 1} must start at a bound alias, got new node '${n.as}'", chain)
      }
      var any = false
      while (rest.nonEmpty) {
        val (rel, dir, lo, hi) = edge()
        val n = node(allowBare = false) match {
          case Right(nn) => nn
          case Left(a)   => fail(s"chain node '$a' must declare a :Label", rest)
        }
        into += PatternStep(rel, dir, n, from = anchor,
          minHops = lo, maxHops = hi)
        anchor = None // subsequent steps chain from the previous node
        any = true
      }
      // a zero-edge part is legal only as the whole required pattern:
      // `MATCH (n:Label)` is a node scan (the OPTIONAL MATCH anchor
      // shape); continuation parts and optional clauses need an edge
      require(any || (ci == 0 && rest.isEmpty),
        s"pattern part ${ci + 1} needs at least one edge")
    }

    /** WHERE conditions of one clause. Single-alias conjuncts merge
      * into that clause's node predicates (semi-joins BEFORE the path
      * join); cross-alias conjuncts — `a.x = 1 OR b.y = 2` — compile
      * to POST-JOIN row filters over attached property columns
      * (`allowRowPreds`, the required MATCH only: on an OPTIONAL
      * MATCH a row filter would silently change left-join semantics,
      * so there it stays a loud reject). `allowed` = aliases bound by
      * the clause (a WHERE may only constrain its own clause —
      * referencing another clause's alias is rejected loudly rather
      * than silently changing required/optional semantics).
      */
    def applyWhere(w: String, allowed: Set[String],
        nodes: Seq[PatternNode],
        allowRowPreds: Boolean): (Map[String, PatternNode], Seq[RowPred]) = {
      def checkAlias(a: String, p: String): Unit = {
        require(!relVars(a),
          s"'$a' is a relationship variable — relationships carry no " +
            "queryable properties in this engine (filter on node positions)")
        require(bound.contains(a), s"WHERE references unknown alias '$a'")
        require(allowed(a),
          s"WHERE references alias '$a' bound by a different clause — " +
            "attach the condition to the clause that binds it")
        // precise reject HERE, not a raw unresolved-column analysis
        // error later: the any-node view carries only `id`
        require(bound(a).nonEmpty || p == "id",
          s"WHERE $a.$p: alias '$a' is unlabeled — the any-node view has " +
            "no properties; declare a :Label to filter on them")
      }
      // an atom keeps its (alias, prop, builder) apart so the SAME
      // condition can compile against the node table (col(prop), the
      // pre-join semi-join form) or the joined path frame
      // (col(alias__w_prop), the row-filter form)
      def parseCond(cond: String): (String, String, Column => Column) =
        cond.trim match {
          case WhereNullRe(a, p, not) =>
            checkAlias(a, p)
            (a, p, c => if (not != null) c.isNotNull else c.isNull)
          case WhereCondRe(a, p, op, v) =>
            checkAlias(a, p)
            val mk: Column => Column = op.toUpperCase.replaceAll("\\s+", " ") match {
              case "="  => _ === lit(literal(v))
              case "<>" => _ =!= lit(literal(v))
              case "<"  => _ < lit(literal(v))
              case "<=" => _ <= lit(literal(v))
              case ">"  => _ > lit(literal(v))
              case ">=" => _ >= lit(literal(v))
              case "CONTAINS" => _.contains(lit(literal(v)))
              case "STARTS WITH" => _.startsWith(lit(literal(v).toString))
              case "ENDS WITH" => _.endsWith(lit(literal(v).toString))
              case "IN" =>
                val body = v.trim
                require(body.startsWith("[") && body.endsWith("]"),
                  s"IN needs a [list], got '$body'")
                val items = body.substring(1, body.length - 1).split(",").map(literal)
                _.isin(items.toIndexedSeq: _*)
            }
            (a, p, mk)
          case other => fail("WHERE conditions must be alias.prop OP literal", other)
        }
      // split on a connective keyword ONLY outside single-quoted
      // literals and ONLY at parenthesis depth 0 — a naive regex
      // split on \bAND\b/\bOR\b would cut a condition mid-literal for
      // values like 'black or white', and would cut THROUGH a
      // parenthesized group. '_' is a word char (as in \b):
      // `a.tag_or` / `x_and.p` must not split mid-identifier.
      def isWordChar(ch: Char): Boolean = ch.isLetterOrDigit || ch == '_'
      def splitTop(s: String, kw: String): Seq[String] = {
        val out = Seq.newBuilder[String]
        var inQ = false
        var depth = 0
        var start = 0
        var i = 0
        while (i < s.length) {
          val ch = s.charAt(i)
          if (ch == '\'') { inQ = !inQ; i += 1 }
          else if (!inQ && ch == '(') { depth += 1; i += 1 }
          else if (!inQ && ch == ')') {
            depth -= 1
            require(depth >= 0, s"unbalanced ')' in WHERE: '$s'")
            i += 1
          }
          else if (!inQ && depth == 0 &&
              s.regionMatches(true, i, kw, 0, kw.length) &&
              (i == 0 || !isWordChar(s.charAt(i - 1))) &&
              (i + kw.length >= s.length || !isWordChar(s.charAt(i + kw.length)))) {
            out += s.substring(start, i)
            i += kw.length
            start = i
          } else i += 1
        }
        out += s.substring(start)
        out.result().map(_.trim).filter(_.nonEmpty)
      }
      // "whole factor is one group" test: the leading '(' must close
      // exactly at the string's end (quote-aware) — `(a) AND (b)`
      // never reaches this because the connective splits run first
      def wrappedInParens(s: String): Boolean = {
        if (!(s.startsWith("(") && s.endsWith(")"))) false
        else {
          var inQ = false; var depth = 0; var i = 0
          var closesAtEnd = true
          while (i < s.length) {
            val ch = s.charAt(i)
            if (ch == '\'') inQ = !inQ
            else if (!inQ && ch == '(') depth += 1
            else if (!inQ && ch == ')') {
              depth -= 1
              if (depth == 0 && i < s.length - 1) closesAtEnd = false
            }
            i += 1
          }
          closesAtEnd && depth == 0
        }
      }
      // recursive descent with standard precedence (AND binds tighter
      // than OR; parentheses group arbitrarily): boolean AST over the
      // atomic `alias.prop OP literal` conditions
      sealed trait BoolExpr
      case class AtomE(alias: String, prop: String,
          mk: Column => Column) extends BoolExpr
      case class AndE(xs: Seq[BoolExpr]) extends BoolExpr
      case class OrE(xs: Seq[BoolExpr]) extends BoolExpr
      def parseFactor(s: String): BoolExpr = {
        val t = s.trim
        if (wrappedInParens(t)) parseExpr(t.substring(1, t.length - 1))
        else { val (a, pr, mk) = parseCond(t); AtomE(a, pr, mk) }
      }
      def parseTerm(s: String): BoolExpr = {
        val cs = splitTop(s, "AND")
        require(cs.nonEmpty, "empty WHERE")
        if (cs.length > 1) AndE(cs.map(parseFactor)) else parseFactor(cs.head)
      }
      def parseExpr(s: String): BoolExpr = {
        val ds = splitTop(s, "OR")
        require(ds.nonEmpty, "empty WHERE")
        if (ds.length > 1) OrE(ds.map(parseTerm)) else parseTerm(ds.head)
      }
      def exprAliases(e: BoolExpr): Set[String] = e match {
        case AtomE(a, _, _) => Set(a)
        case AndE(xs) => xs.flatMap(exprAliases).toSet
        case OrE(xs) => xs.flatMap(exprAliases).toSet
      }
      def exprProps(e: BoolExpr): Seq[(String, String)] = e match {
        case AtomE(a, pr, _) => Seq(a -> pr)
        case AndE(xs) => xs.flatMap(exprProps)
        case OrE(xs) => xs.flatMap(exprProps)
      }
      def toColumn(e: BoolExpr, resolve: (String, String) => Column): Column =
        e match {
          case AtomE(a, pr, mk) => mk(resolve(a, pr))
          case AndE(xs) => xs.map(toColumn(_, resolve)).reduce(_ && _)
          case OrE(xs) => xs.map(toColumn(_, resolve)).reduce(_ || _)
        }
      def flattenAnd(e: BoolExpr): Seq[BoolExpr] = e match {
        case AndE(xs) => xs.flatMap(flattenAnd)
        case other => Seq(other)
      }
      // each top-level conjunct compiles by its alias span: ONE alias
      // → a node predicate (semi-join at the pattern position, before
      // the path join — the fast path); SEVERAL aliases (`a.x = 1 OR
      // b.y = 2`) → a row-level filter over the joined path frame,
      // evaluated against attached property columns (required MATCH
      // only — on an OPTIONAL MATCH that would silently reclassify
      // left-join semantics, so it stays a loud reject there)
      val (single, crossAlias) = flattenAnd(parseExpr(w))
        .partition(e => exprAliases(e).size == 1)
      require(allowRowPreds || crossAlias.isEmpty, {
        val as = crossAlias.flatMap(exprAliases).distinct.sorted
        s"OR across aliases (${as.mkString(", ")}) is not a node " +
          "predicate — on OPTIONAL MATCH restrict each OR group to one " +
          "alias (or use IN)"
      })
      val rowPreds = crossAlias.map { e =>
        RowPred(exprProps(e).distinct,
          toColumn(e, (a, pr) => col(s"${a}__w_$pr")))
      }
      val byAlias: Map[String, Column] = single
        .map(e => exprAliases(e).head -> toColumn(e, (_, pr) => col(pr)))
        .groupBy(_._1)
        .map { case (a, cs) => a -> cs.map(_._2).reduce(_ && _) }
      (nodes.flatMap { n =>
        byAlias.get(n.as).map(c =>
          n.as -> n.copy(pred = Some(n.pred.map(_ && c).getOrElse(c))))
      }.toMap, rowPreds)
    }

    // top-level comma = a new pattern part (commas inside {…} are
    // property separators); each additional part must START at an
    // already-bound alias — the Cypher multi-pattern form rag.baml's
    // examples use for branches. OPTIONAL MATCH clauses are single
    // chains anchored at a bound alias, compiled as left-joined UNITS.
    var ci = 0
    for (((body0, whereOpt), oi) <- clauses.zipWithIndex) {
      val body = if (oi == 0) matchBody else body0
      val chains = body.split(",(?![^{]*})").map(_.trim).filter(_.nonEmpty)
      require(chains.nonEmpty, if (oi == 0) "empty pattern" else "empty OPTIONAL MATCH")
      if (oi == 0) {
        for (chain <- chains) { parseChain(chain, ci, steps, optional = false); ci += 1 }
        for (w <- whereOpt) {
          val ns = start +: steps.toSeq.map(_.node)
          val (upd, rps) = applyWhere(w, ns.map(_.as).toSet, ns,
            allowRowPreds = true)
          rowPreds ++= rps
          upd.get(start.as).foreach(start = _)
          for (i <- steps.indices; n <- upd.get(steps(i).node.as))
            steps(i) = steps(i).copy(node = n)
        }
      } else {
        require(chains.length == 1,
          "OPTIONAL MATCH supports a single chain per clause (use another OPTIONAL MATCH)")
        val clauseSteps = scala.collection.mutable.ArrayBuffer.empty[PatternStep]
        parseChain(chains.head, ci, clauseSteps, optional = true); ci += 1
        val anchor = clauseSteps.head.from.getOrElse(
          fail("OPTIONAL MATCH must start at a bound alias", chains.head))
        // the clause's WHERE may constrain its own nodes AND its
        // anchor — an anchor condition narrows the MATCH (Neo4j
        // semantics: rows failing it keep nulls), so it lands on the
        // sub-pattern's start, never on the outer row set
        var anchorPred: Option[Column] = None
        for (w <- whereOpt) {
          val ns = PatternNode(bound(anchor), anchor) +:
            clauseSteps.toSeq.map(_.node)
          val (upd, _) = applyWhere(w, ns.map(_.as).toSet, ns,
            allowRowPreds = false)
          anchorPred = upd.get(anchor).flatMap(_.pred)
          for (i <- clauseSteps.indices; n <- upd.get(clauseSteps(i).node.as))
            clauseSteps(i) = clauseSteps(i).copy(node = n)
        }
        optClauses += OptClause(anchor, clauseSteps.toSeq, anchorPred)
      }
    }

    val labels = bound.toMap

    // RETURN [DISTINCT] items [ORDER BY …] [LIMIT n]
    var returnDistinct = false
    var orderBy = Seq.empty[(String, Boolean)]
    var limit: Option[Int] = None
    val returns = returnPart.toSeq.flatMap { r0 =>
      var r = r0.trim
      val lim = "(?i)\\bLIMIT\\s+(\\d+)\\s*$".r
      lim.findFirstMatchIn(r).foreach { m =>
        limit = Some(m.group(1).toInt); r = r.substring(0, m.start).trim
      }
      r.split("(?i)\\bORDER\\s+BY\\b", 2) match {
        case Array(items, ob) =>
          r = items.trim
          orderBy = ob.split(",").map(_.trim).map {
            case OrderItemRe(n, dir) =>
              (n, dir == null || dir.equalsIgnoreCase("ASC"))
            case other => fail("ORDER BY items must be out_col [ASC|DESC]", other)
          }.toSeq
        case _ =>
      }
      if (r.matches("(?is)^DISTINCT\\b.*")) {
        returnDistinct = true; r = r.replaceFirst("(?i)^DISTINCT\\b", "").trim
      }
      // `RETURN *` (the README.md:137 demo shape): every node alias's
      // id, in binding order. Relationship variables are NOT expanded
      // — edge rows have no materialized identity (documented
      // divergence from Kuzu, which returns rel objects).
      if (r == "*")
        bound.keysIterator.map(a =>
          ReturnItem(None, distinct = false, a, None, a)).toSeq
      else r.split(",").map(_.trim).map {
        case AggItemRe(fn, dist, target, prop, as) =>
          val f = fn.toLowerCase
          val d = dist != null
          require(target == "*" || !relVars(target),
            s"relationship variable '$target' is not aggregable — " +
              "count(*) counts paths (= relationship tuples) already")
          require(target == "*" || labels.contains(target),
            s"$f() references unknown alias '$target'")
          require(!(target == "*") || (f == "count" && prop == null && !d),
            "only count(*) may aggregate '*'")
          require(!d || f == "count", s"DISTINCT only supported with count, not $f")
          require(f == "count" || prop != null,
            s"$f() needs alias.prop (bare aliases are ids — only count them)")
          require(as != null, s"aggregate $f(…) needs an AS name")
          ReturnItem(Some(f), d, target, Option(prop), as)
        case PlainItemRe(a, prop, as) =>
          require(!relVars(a),
            s"relationship variable '$a' is not returnable — edge rows " +
              "have no materialized identity (return node positions)")
          require(labels.contains(a), s"RETURN references unknown alias '$a'")
          val name = Option(as).getOrElse(
            Option(prop).map(p => s"${a}_$p").getOrElse(a))
          ReturnItem(None, distinct = false, a, Option(prop), name)
        case other => fail("RETURN items must be alias[.prop] [AS n] or agg(…) AS n", other)
      }
    }
    require(returns.map(_.as).distinct.size == returns.size,
      s"duplicate RETURN output names: ${returns.map(_.as)}")
    // fail-loud principle: DISTINCT alongside aggregates would be a
    // silent no-op (grouped output is already one row per group key) —
    // reject rather than parse-and-ignore
    require(!returnDistinct || returns.forall(_.agg.isEmpty),
      "RETURN DISTINCT with aggregates is unsupported (grouped output " +
        "is already distinct per group key — drop DISTINCT)")
    for ((n, _) <- orderBy)
      require(returns.exists(_.as == n), s"ORDER BY references unknown output '$n'")
    require(orderBy.isEmpty && limit.isEmpty || returns.nonEmpty,
      "ORDER BY/LIMIT need a RETURN clause")

    Parsed(start, steps.toSeq, labels, returns, optClauses.toSeq,
      optionalAliases.toSet, returnDistinct, orderBy, limit,
      rowPreds.toSeq)
  }

  /** Parse and execute against a graph. RETURN items arrive under
    * their AS names (plain items default to `alias_prop`); without
    * RETURN the result is the path frame (one id column per alias,
    * one row per path).
    */
  def query(g0: PropertyGraph, stmt: String): DataFrame = {
    val p = parse(stmt)
    // unlabeled positions (label "") scan the ANY-node view — the
    // union of every label's id column, deduped. Sound only when node
    // ids are globally unique across labels (the untyped contract —
    // prefix ids if per-label key spaces overlap); the view carries
    // ONLY `id`, so property access on an unlabeled alias rejects
    val g =
      if (!p.labels.valuesIterator.contains("")) g0
      else g0.copy(nodes = g0.nodes +
        ("" -> g0.nodes.values.map(_.select(col("id"))).reduce(_ unionAll _).distinct()))
    for (ri <- p.returns if ri.prop.isDefined && p.labels.get(ri.alias).contains(""))
      throw new IllegalArgumentException(
        s"RETURN ${ri.alias}.${ri.prop.get}: alias '${ri.alias}' is unlabeled " +
          "— the any-node view has no properties; declare a :Label to read them")
    val optionals = p.optionalAliases
    // cross-alias WHERE conjuncts filter the REQUIRED pattern's path
    // frame (before OPTIONAL MATCH extends it, standard clause order):
    // attach each referenced property under a reserved __w_ prefix,
    // filter, drop — the node tables are dimension-sized, so these are
    // broadcast joins on top of the already-joined paths
    val required0 = g.matchPaths(p.start, p.steps)
    val required =
      if (p.rowPreds.isEmpty) required0
      else {
        for (rp <- p.rowPreds; (a, pr) <- rp.props
             if p.labels.get(a).contains("") && pr != "id")
          throw new IllegalArgumentException(
            s"WHERE $a.$pr: alias '$a' is unlabeled — the any-node view " +
              "has no properties; declare a :Label to filter on them")
        val need = p.rowPreds.flatMap(_.props).distinct
        val attached = need.groupBy(_._1).toSeq.sortBy(_._1)
          .foldLeft(required0) { case (df, (alias, ps)) =>
            g.attach(df, alias, p.labels(alias), ps.map(_._2).distinct,
              s"${alias}__w_")
          }
        attached
          .filter(p.rowPreds.map(_.cond).reduce(_ && _))
          // a USING join fronts its key column — restore the path
          // frame's alias order (and drop the __w_ helpers)
          .select(required0.columns.map(col).toIndexedSeq: _*)
      }
    // each OPTIONAL MATCH clause compiles to an INNER sub-pattern
    // anchored at its bound alias, left-joined as one unit — if any
    // step fails, every alias the clause binds is null together
    val paths = p.optionals.foldLeft(required) {
      (df, cl) =>
        val sub = g.matchPaths(
          PatternNode(p.labels(cl.anchor), cl.anchor, cl.anchorPred), cl.steps)
        df.join(sub, Seq(cl.anchor), "left_outer")
    }
    if (p.returns.isEmpty) paths
    else {
      // attach the node properties the RETURN needs — left join for
      // positions bound by OPTIONAL MATCH so null path slots survive
      val needed = p.returns.filter(_.prop.isDefined)
      val attached = needed.map(_.alias).distinct.foldLeft(paths) { (df, alias) =>
        val props = needed.filter(_.alias == alias).map(_.prop.get).distinct
        g.attach(df, alias, p.labels(alias), props, s"${alias}_",
          if (optionals(alias)) "left_outer" else "inner")
      }
      def baseCol(ri: ReturnItem): Column =
        ri.prop.map(pr => col(s"${ri.alias}_$pr")).getOrElse(col(ri.alias))
      val (aggs, plains) = p.returns.partition(_.agg.isDefined)
      var out =
        if (aggs.isEmpty) {
          val sel = attached.select(plains.map(ri => baseCol(ri).as(ri.as)): _*)
          if (p.returnDistinct) sel.distinct() else sel
        } else {
          val aggCols = aggs.map { ri =>
            val c = (ri.agg.get, ri.distinct) match {
              case ("count", _) if ri.isStar => count(lit(1))
              case ("count", true)  => countDistinct(baseCol(ri))
              case ("count", false) => count(baseCol(ri))
              case ("sum", _) => sum(baseCol(ri))
              case ("min", _) => min(baseCol(ri))
              case ("max", _) => max(baseCol(ri))
              case ("avg", _) => avg(baseCol(ri))
            }
            c.as(ri.as)
          }
          if (plains.isEmpty) attached.agg(aggCols.head, aggCols.tail: _*)
          else attached
            .groupBy(plains.map(ri => baseCol(ri).as(ri.as)): _*)
            .agg(aggCols.head, aggCols.tail: _*)
            .select(p.returns.map(ri => col(ri.as)): _*)
        }
      if (p.orderBy.nonEmpty)
        out = out.orderBy(p.orderBy.map { case (n, asc) =>
          if (asc) col(n).asc else col(n).desc
        }: _*)
      p.limit.foldLeft(out)((d, n) => d.limit(n))
    }
  }

  /** Direction of each parsed step — the reversed-arrowhead contract
    * the reference's example corpus exercises (rag.baml:279).
    */
  private[graph] def directions(p: Parsed): Seq[Direction] = p.steps.map(_.dir)
}
