package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A minimal Cypher-pattern front end over [[PropertyGraph.matchPaths]]
  * — the textual entry a Text2Cypher client targets (the reference
  * executes LLM-generated Cypher verbatim, src/rag.py:48-76, with the
  * prompt contract constraining it to MATCH patterns over the pruned
  * schema, rag.baml:65-102). This parses exactly that constrained
  * shape and compiles it to the join-based path DSL:
  *
  * {{{
  * MATCH (s:Substance {id: 'shellfish'})-[:CAUSES]->(a:Allergy)
  *       <-[:EXPERIENCES]-(p:Patient {id: 45})
  * RETURN p.surname, a.category
  * }}}
  *
  * Supported: chain patterns of `(alias:Label {prop: literal, …})`
  * nodes joined by `-[:REL]->` / `<-[:REL]-` edges; literals are
  * single-quoted strings, integers, decimals, booleans; an optional
  * `RETURN alias.prop, …` clause (omitted ⇒ the path frame with one
  * id column per alias). Inline prop maps become mid-chain
  * predicates (semi-joins); RETURN compiles to broadcast property
  * attaches. One row per path — real Cypher MATCH multiplicity.
  * Deliberately NOT supported (the prompt contract doesn't emit
  * them): WHERE, aggregation, OPTIONAL MATCH, var-length `*..` —
  * aggregate over the returned DataFrame instead. String literals
  * may not contain commas or braces (the splitter is regex-based,
  * not a full lexer — fine for generated key lookups, loud for
  * anything else).
  */
object CypherLite {

  import PropertyGraph.{Direction, In, Out, PatternNode, PatternStep}

  final case class Parsed(
      start: PatternNode, steps: Seq[PatternStep],
      labels: Map[String, String], returns: Seq[(String, String)])

  private val NodeRe =
    """^\(\s*([A-Za-z_][A-Za-z0-9_]*)?\s*(?::\s*([A-Za-z_][A-Za-z0-9_]*))?\s*(\{[^}]*\})?\s*\)""".r
  private val EdgeFwdRe = """^-\s*\[\s*:\s*([A-Za-z_][A-Za-z0-9_]*)\s*\]\s*->""".r
  private val EdgeBackRe = """^<-\s*\[\s*:\s*([A-Za-z_][A-Za-z0-9_]*)\s*\]\s*-""".r
  private val ReturnItemRe = """^\s*([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)\s*$""".r

  private def fail(msg: String, rest: String): Nothing =
    throw new IllegalArgumentException(s"$msg at: '${rest.take(40)}'")

  private def parseProps(s: String): Column = {
    val body = s.stripPrefix("{").stripSuffix("}").trim
    require(body.nonEmpty, "empty property map")
    val conds = body.split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2).map(_.trim)
      val value: Any = v match {
        case q if q.startsWith("'") && q.endsWith("'") && q.length >= 2 =>
          q.substring(1, q.length - 1)
        case "true"  => true
        case "false" => false
        case n if n.matches("-?\\d+") => n.toLong
        case n if n.matches("-?\\d*\\.\\d+") => n.toDouble
        case other => throw new IllegalArgumentException(s"unsupported literal '$other'")
      }
      col(k) === lit(value)
    }
    conds.reduce(_ && _)
  }

  /** Parse a `MATCH … [RETURN …]` statement (the MATCH keyword is
    * optional). Anonymous nodes get positional aliases `_0, _1, …`.
    */
  def parse(stmt: String): Parsed = {
    val (patternPart, returnPart) = stmt.split("(?i)\\bRETURN\\b", 2) match {
      case Array(p)    => (p, None)
      case Array(p, r) => (p, Some(r))
    }
    // no whitespace normalization — the token regexes tolerate \s*
    // themselves, and a global squeeze would silently rewrite spaces
    // INSIDE quoted literals
    val matchBody = patternPart.trim.replaceFirst("(?i)^MATCH\\b", "").trim
    // top-level comma = a new pattern part (commas inside {…} are
    // property separators); each additional part must START at an
    // already-bound alias — the Cypher multi-pattern form rag.baml's
    // examples use for branches
    val chains = matchBody.split(",(?![^{]*})").map(_.trim).filter(_.nonEmpty)
    require(chains.nonEmpty, "empty pattern")
    var idx = 0
    val bound = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val steps = scala.collection.mutable.ArrayBuffer.empty[PatternStep]
    var start: PatternNode = null

    for ((chain, ci) <- chains.zipWithIndex) {
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
                val label = labelOpt.getOrElse(
                  fail(s"node '$alias' needs a :Label (or be a bound alias)", rest))
                require(!bound.contains(alias), s"duplicate alias '$alias'")
                bound += alias -> label
                Right(PatternNode(label, alias, propsOpt.map(parseProps)))
            }
          case None => fail("expected (alias:Label {…})", rest)
        }
      def edge(): (String, Direction) =
        EdgeFwdRe.findFirstMatchIn(rest) match {
          case Some(m) => rest = rest.substring(m.end).trim; (m.group(1), Out)
          case None => EdgeBackRe.findFirstMatchIn(rest) match {
            case Some(m) => rest = rest.substring(m.end).trim; (m.group(1), In)
            case None => fail("expected -[:REL]-> or <-[:REL]-", rest)
          }
        }
      // chain anchor: the first chain introduces the start node; later
      // chains re-enter at a bound alias
      var anchor: Option[String] = node(allowBare = ci > 0) match {
        case Left(alias) => Some(alias)
        case Right(n) if ci == 0 => start = n; None
        case Right(n) =>
          fail(s"pattern part ${ci + 1} must start at a bound alias, got new node '${n.as}'", chain)
      }
      var any = false
      while (rest.nonEmpty) {
        val (rel, dir) = edge()
        val n = node(allowBare = false) match {
          case Right(nn) => nn
          case Left(a)   => fail(s"chain node '$a' must declare a :Label", rest)
        }
        steps += PatternStep(rel, dir, n, from = anchor)
        anchor = None // subsequent steps chain from the previous node
        any = true
      }
      require(any, s"pattern part ${ci + 1} needs at least one edge")
    }
    val labels = bound.toMap
    val returns = returnPart.toSeq.flatMap(_.split(",")).map {
      case ReturnItemRe(a, p) =>
        require(labels.contains(a), s"RETURN references unknown alias '$a'")
        (a, p)
      case other => fail("RETURN items must be alias.prop", other)
    }
    Parsed(start, steps.toSeq, labels, returns)
  }

  /** Parse and execute against a graph. RETURN items arrive as
    * columns named `alias_prop`; without RETURN the result is the
    * path frame (one id column per alias, one row per path).
    */
  def query(g: PropertyGraph, stmt: String): DataFrame = {
    val p = parse(stmt)
    val paths = g.matchPaths(p.start, p.steps)
    if (p.returns.isEmpty) paths
    else {
      val attached = p.returns.map(_._1).distinct.foldLeft(paths) { (df, alias) =>
        val props = p.returns.filter(_._1 == alias).map(_._2).distinct
        g.attach(df, alias, p.labels(alias), props, s"${alias}_")
      }
      attached.select(p.returns.map { case (a, pr) => col(s"${a}_$pr") }: _*)
    }
  }

  /** Direction of each parsed step — the reversed-arrowhead contract
    * the reference's example corpus exercises (rag.baml:279).
    */
  private[graph] def directions(p: Parsed): Seq[Direction] = p.steps.map(_.dir)
}
