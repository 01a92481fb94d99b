package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThanOrEqual, IsNotNull, LeafExpression, LessThanOrEqual, Literal, UnaryExpression, Unevaluable}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType}

/** SQL syntax for the as-of operator (VERDICT r5 #1 gap: ClickHouse users
  * TYPE `ASOF JOIN`; graft's whole-operator path was Dataset-API-only):
  *
  * {{{
  *   SELECT ... FROM l ASOF [LEFT [OUTER]|INNER] JOIN r
  *     ON l.k = r.k AND l.t >= r.t [AND graft_asof_tie(r.c)]
  *   SELECT ... FROM l ASOF [LEFT [OUTER]|INNER] JOIN r USING (k, t)
  * }}}
  *
  * The USING spelling (ClickHouse's leading form) takes the last column
  * as the as-of inequality column and drops the right side's USING
  * columns from the output (merged-column convention).
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

/** `graft_asof_tolerance(n)`: staleness bound for an ASOF join's ON
  * condition (BIGINT literal, same time unit as the join's time
  * columns): a match with l.t − r.t > n no longer counts — dropped
  * under INNER, null-padded under LEFT [OUTER]. The SQL face of
  * [[AsOfJoin.asofTolerance]]. */
case class GraftAsofTolerance(child: Expression) extends UnaryExpression
    with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_asof_tolerance"
  override protected def withNewChildInternal(
      newChild: Expression): GraftAsofTolerance =
    copy(child = newChild)
}

/** `graft_asof_using('k', 't')`: tag produced by the rewriter for the
  * ClickHouse-leading `ASOF JOIN r USING (k, t)` spelling; carries the
  * column NAMES (string literals), resolved against both join sides by
  * [[ResolveAsofJoin]]. The last name is the as-of (inequality) column;
  * the right side's using-named columns are dropped from the output,
  * matching USING's merged-column convention. */
case class GraftAsofUsing(children: Seq[Expression]) extends Expression
    with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_asof_using"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftAsofUsing =
    copy(children = newChildren)
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
  private val Modifiers = Set(
    "LEFT", "RIGHT", "FULL", "INNER", "OUTER", "CROSS", "SEMI", "ANTI",
    "NATURAL")

  /** Index of this ASOF's JOIN keyword if `ASOF modifier* JOIN` starts at
    * i; rejects any modifier sequence that is not one of the supported
    * spellings — without the guard Spark would read `l ASOF RIGHT JOIN r`
    * (or `ASOF LEFT OUTER JOIN`, pre-r7) as a table ALIAS named ASOF plus
    * a plain join: silently wrong results instead of an error. */
  private def joinIdxAt(toks: Vector[Tok], i: Int, sql: String): Option[Int] = {
    var j = i + 1
    while (j < toks.length && Modifiers(toks(j).word)) j += 1
    if (j >= toks.length || toks(j).word != "JOIN") None
    else {
      val mods = (i + 1 until j).map(toks(_).word).toList
      mods match {
        case Nil | List("INNER") | List("LEFT") | List("LEFT", "OUTER") =>
          Some(j)
        case _ => throw new IllegalArgumentException(
          s"ASOF ${mods.mkString(" ")} JOIN is not supported " +
            s"(INNER or LEFT [OUTER]): $sql")
      }
    }
  }

  private def rewriteFirst(sql: String): Option[String] = {
    val toks = tokenize(sql)
    val at = toks.indices.flatMap { i =>
      if (toks(i).word == "ASOF") joinIdxAt(toks, i, sql).map(j => (i, j))
      else None
    }.headOption
    at.map { case (i, joinIdx) =>
      val d = toks(i).depth
      // the ON of THIS join: first depth-d ON after the JOIN keyword
      val onIdx = (joinIdx + 1 until toks.length).find { j =>
        val t = toks(j)
        (t.word == "ON" && t.depth == d) ||
          (t.word == "USING" && t.depth == d) ||
          (t.word == ")" && t.depth < d)
      }.getOrElse(throw new IllegalArgumentException(
        s"ASOF JOIN requires an ON condition: $sql"))
      // the scope's closing `)` matched: the join has no ON/USING at all
      if (toks(onIdx).word == ")") throw new IllegalArgumentException(
        s"ASOF JOIN requires an ON condition: $sql")
      if (toks(onIdx).word == "USING") {
        // ClickHouse's leading spelling: USING (k1, ..., kn, t) — the
        // LAST column is the as-of (inequality) column, the rest equi
        // keys. Rewritten to ON graft_asof_using('k1', ..., 't'); the
        // names resolve against both sides in ResolveAsofJoin. Plain
        // (unquoted) identifiers only.
        val open = onIdx + 1
        if (open >= toks.length || toks(open).word != "(")
          throw new IllegalArgumentException(
            s"ASOF JOIN USING requires a (col, ...) list: $sql")
        val close = (open + 1 until toks.length).find(j =>
          toks(j).word == ")" && toks(j).depth == d).getOrElse(
          throw new IllegalArgumentException(s"unclosed USING list: $sql"))
        val cols = (open + 1 until close).map(toks(_))
          .filter(t => t.word != "(" && t.word != ")")
          .map(t => sql.substring(t.start, t.end))
        if (cols.size < 2) throw new IllegalArgumentException(
          s"ASOF JOIN USING needs at least (key, time): $sql")
        val b = new java.lang.StringBuilder
        b.append(sql, 0, toks(i).start)             // drop the ASOF token
        b.append(sql, toks(i).end, toks(onIdx).start)
        b.append(" ON graft_asof_using(")
        b.append(cols.map(c => "'" + c + "'").mkString(", "))
        b.append(") ")
        b.append(sql, toks(close).end, sql.length)
        b.toString
      } else {
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

  import org.apache.spark.sql.catalyst.expressions.{Alias, IsNull, Or}
  import org.apache.spark.sql.catalyst.plans.logical.Union

  /** Shared tail: type-check, null-narrow both sides, build the node —
    * and for LEFT [OUTER] with a nullable left key/time, route those left
    * rows AROUND the exec and union them back null-padded (SQL left-outer
    * retention: a null-key left row is non-joinable but must survive;
    * inside the exec a null would read as 0 through getLong). */
  private def build(l: LogicalPlan, r: LogicalPlan,
                    lk: Attribute, lt: Attribute, rk: Attribute,
                    rt: Attribute, rtie: Attribute,
                    leftOuter: Boolean,
                    tolerance: Option[Long] = None): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{If, LessThanOrEqual, Subtract}
    Seq(lk, lt, rk, rt, rtie).foreach(a =>
      if (a.dataType != LongType)
        fail(s"column ${a.name} must be BIGINT, got ${a.dataType.sql} (CAST it)"))
    val lf = Filter(And(IsNotNull(lk), IsNotNull(lt)), l)
    val rConds = (Seq(rk, rt) ++ (if (rtie == rt) Nil else Seq(rtie)))
      .map(IsNotNull(_): Expression).reduce(And(_, _))
    val rf = Filter(rConds, r)
    val node = AsOfJoinNode(lf, rf, lk, lt, rk, rt, rtie, leftOuter)
    val joined = if (leftOuter && (lk.nullable || lt.nullable)) {
      val nullLeft = Filter(Or(IsNull(lk), IsNull(lt)), l)
      val padded = Project(
        l.output ++ node.output.drop(l.output.size).map(a =>
          Alias(Literal(null, a.dataType), a.name)()),
        nullLeft)
      Union(Seq(node, padded))
    } else node
    tolerance match {
      case None => joined
      case Some(t) =>
        // the merge yields AT MOST ONE match per left row, so the
        // staleness bound is one projection/filter over the join
        val rtOut = joined.output.find(_.exprId == rt.exprId).get
        val fresh = And(IsNotNull(rtOut),
          LessThanOrEqual(Subtract(lt, rtOut), Literal(t)))
        if (!leftOuter) Filter(fresh, joined)
        else Project(
          joined.output.take(l.output.size) ++
            joined.output.drop(l.output.size).map(a =>
              Alias(If(fresh, a, Literal(null, a.dataType)), a.name)(
                exprId = a.exprId)),
          joined)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case j @ Join(l, r, jt, Some(u: GraftAsofUsing), _) if j.resolved =>
      val leftOuter = jt match {
        case Inner => false
        case LeftOuter => true
        case other => fail(s"join type ${other.sql} not supported (INNER or LEFT)")
      }
      val names = u.children.map {
        case Literal(v, _: StringType) if v != null => v.toString
        case other => fail(s"graft_asof_using arguments must be string " +
          s"literals, got ${other.sql}")
      }
      if (names.size != 2)
        fail("USING supports exactly (key, time): one equi key plus the " +
          "as-of column (use the ON form for other shapes)")
      def one(p: LogicalPlan, n: String, side: String): Attribute =
        p.output.filter(a => conf.resolver(a.name, n)) match {
          case Seq(a) => a
          case Seq() => fail(s"USING column $n not found on the $side side " +
            s"(${p.output.map(_.name).mkString(", ")})")
          case _ => fail(s"USING column $n is ambiguous on the $side side")
        }
      val (lk, rk) = (one(l, names(0), "left"), one(r, names(0), "right"))
      val (lt, rt) = (one(l, names(1), "left"), one(r, names(1), "right"))
      val joined = build(l, r, lk, lt, rk, rt, rt, leftOuter)
      // USING's merged-column convention: right's using columns drop
      Project(joined.output.filterNot(a =>
        a.exprId == rk.exprId || a.exprId == rt.exprId), joined)
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
      var tol: Option[Long] = None
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
          case GraftAsofTolerance(lit: Literal) if lit.value != null &&
              (lit.dataType == LongType ||
                lit.dataType == org.apache.spark.sql.types.IntegerType) =>
            if (tol.isDefined) fail("at most one graft_asof_tolerance is supported")
            val v = lit.value match {
              case i: java.lang.Integer => i.longValue()
              case l: java.lang.Long => l.longValue()
            }
            if (v < 0) fail(s"graft_asof_tolerance must be nonnegative, got $v")
            tol = Some(v)
          case GraftAsofTolerance(other) => fail(
            s"graft_asof_tolerance takes an integer literal, got ${other.sql}")
          case other => fail(
            s"unsupported ON conjunct ${other.sql}; expected l.k = r.k, " +
              "l.t >= r.t (or r.t <= l.t), optional graft_asof_tie(r.c), " +
              "optional graft_asof_tolerance(n)")
        }
      val (lk, rk) = key.getOrElse(fail("missing key equality l.k = r.k"))
      val (lt, rt) = time.getOrElse(fail("missing time bound l.t >= r.t"))
      val rtie = tie.getOrElse(rt)
      build(l, r, lk, lt, rk, rt, rtie, leftOuter, tol)
  }
}
