package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Gremlin-shaped traversal surface over [[PropertyGraph]] — the
  * reference's actual user API. The reference exists to plug ClickHouse
  * under the JanusGraph SPI (ref ClickhouseStoreManager.java:49), and a
  * JanusGraph user writes `g.V().hasLabel(...).has(...).out(...).out()
  * .dedup().limit(n)`, never the SPI calls themselves; graft's 41 named
  * graph entries cover the SEMANTICS but not that shape (r10 verdict
  * #2). This is the shape: a thin immutable builder whose steps compose
  * the SAME DataFrame plans as the named entries — `V()` starts from
  * the vertex frame, each `out()`/`in()` is one edge join keyed on the
  * current vertex column, property taps are vertex joins, and `dedup`/
  * `limit` map to `distinct`/`limit` — so Catalyst sees exactly the
  * join tree g_onehop/g_twohop/g_motif build by hand (TraversalSpec
  * asserts optimized-plan equality against g_twohop; the driver entry
  * g_dsl_twohop shares g_twohop's oracle hash-for-hash).
  *
  * Scale notes: a traversal is a declarative plan, never an iterator —
  * every hop is a shuffle join on vid (co-located under a vid-bucketed
  * graph), dimension-sized property taps broadcast under AQE, and
  * `limit` is a LocalLimit+GlobalLimit pair, so the 100 TB story is the
  * named entries' story unchanged.
  */
object Traversal {

  /** Gremlin's P — tiny predicate vocabulary for `has`. */
  sealed trait P { def apply(c: Column): Column }
  object P {
    final case class Is(v: Any) extends P { def apply(c: Column): Column = c === F.lit(v) }
    final case class Neq(v: Any) extends P { def apply(c: Column): Column = c =!= F.lit(v) }
    final case class Gt(v: Any) extends P { def apply(c: Column): Column = c > F.lit(v) }
    final case class Gte(v: Any) extends P { def apply(c: Column): Column = c >= F.lit(v) }
    final case class Lt(v: Any) extends P { def apply(c: Column): Column = c < F.lit(v) }
    final case class Lte(v: Any) extends P { def apply(c: Column): Column = c <= F.lit(v) }
    final case class Within(vs: Seq[Any]) extends P { def apply(c: Column): Column = c.isin(vs: _*) }
    def is(v: Any): P = Is(v)
    def neq(v: Any): P = Neq(v)
    def gt(v: Any): P = Gt(v)
    def gte(v: Any): P = Gte(v)
    def lt(v: Any): P = Lt(v)
    def lte(v: Any): P = Lte(v)
    def within(vs: Any*): P = Within(vs)
  }

  /** g.V() — every vertex, properties still in reach for has/hasLabel. */
  def V(g: PropertyGraph.G): Traversal =
    new Traversal(g, g.vertices, 0, onVertices = true, Vector.empty, Map.empty)

  def V(s: SparkSession, dir: String): Traversal = V(PropertyGraph(s, dir))
}

/** One traversal state: `frame` holds the origin column v0, the current
  * vertex column (vid while still on the vertex frame, v<depth> after
  * the first hop), and every tapped value column; `marks` maps `as()`
  * labels to internal columns for the terminal `select`. */
final class Traversal private (
    g: PropertyGraph.G,
    frame: DataFrame,
    depth: Int,
    onVertices: Boolean,
    vals: Vector[String],
    marks: Map[String, String],
    originName: String = "v0") {

  import Traversal.P

  private def curCol: String =
    if (onVertices) "vid" else if (depth == 0) originName else s"v$depth"

  private def chain: Seq[String] =
    originName +: (1 to depth).map(i => s"v$i")

  private def keepCols: Seq[Column] = (chain ++ vals).map(F.col)

  private def step(frame: DataFrame = frame, depth: Int = depth,
                   onVertices: Boolean = onVertices,
                   vals: Vector[String] = vals,
                   marks: Map[String, String] = marks,
                   originName: String = originName): Traversal =
    new Traversal(g, frame, depth, onVertices, vals, marks, originName)

  /** User-supplied names (as() marks, value() taps) must not collide
    * with the traversal's own column machinery: the internal hop chain
    * (v0, v1, …), the edge-frame join keys (src/dst/elabel), the vertex
    * frame's columns, or a name already taken in this traversal — a
    * collision would make a hop join ambiguous or silently shadow a
    * tapped column (r11 review finding). */
  private def checkName(name: String): Unit = {
    require(!name.matches("v\\d+"), s"'$name' is a reserved hop-chain name")
    require(!Set("src", "dst", "elabel", "vid", "vlabel").contains(name),
      s"'$name' collides with a graph-frame column")
    require(!vals.contains(name) && !marks.contains(name) && name != originName,
      s"'$name' is already bound in this traversal")
  }

  /** hasLabel: filter in place on the vertex frame, one vertex join
    * after the first hop. */
  def hasLabel(l: String): Traversal =
    if (onVertices) step(frame = frame.filter(F.col("vlabel") === l))
    else step(frame = frame
      .join(g.vertices.select(F.col("vid").as(curCol), F.col("vlabel")), Seq(curCol))
      .filter(F.col("vlabel") === l)
      .select(keepCols: _*))

  def has(key: String, p: P): Traversal =
    if (onVertices) step(frame = frame.filter(p(F.col(key))))
    else step(frame = frame
      .join(g.vertices.select(F.col("vid").as(curCol), F.col(key).as("__has")), Seq(curCol))
      .filter(p(F.col("__has")))
      .select(keepCols: _*))

  def has(key: String, value: Any): Traversal = has(key, P.Is(value))

  /** Tap a property of the CURRENT vertex into the frame under `as` —
    * Gremlin's values()/valueMap() projected to one column. On the
    * vertex frame it is a free projection; after a hop it is the same
    * name-resolution join the named entries write by hand. */
  def value(key: String, as: String): Traversal = {
    checkName(as)
    if (onVertices) step(
      frame = frame.withColumn(as, F.col(key)), vals = vals :+ as)
    else step(
      frame = frame
        .join(g.vertices.select(F.col("vid").as(curCol), F.col(key).as(as)), Seq(curCol))
        .select((keepCols :+ F.col(as)): _*),
      vals = vals :+ as)
  }

  /** Mark the current vertex column for the terminal select. On the
    * vertex frame the mark NAMES the origin column itself (the column
    * the origin projects to when the traversal leaves the frame), so a
    * marked origin reaches the terminal select as a bare attribute —
    * the same canonical shape the hand-written entries produce. */
  def as(label: String): Traversal = {
    checkName(label)
    if (onVertices) step(marks = marks + (label -> label), originName = label)
    else step(marks = marks + (label -> curCol))
  }

  private def hop(reverse: Boolean, labels: Seq[String]): Traversal = {
    val e0 = if (labels.isEmpty) g.edges
             else g.edges.filter(F.col("elabel").isin(labels: _*))
    val (from, to) = if (reverse) ("dst", "src") else ("src", "dst")
    val nxt = s"v${depth + 1}"
    val joined =
      if (onVertices) {
        // leave the vertex frame: origin projects to its mark (or v0),
        // tapped values ride along
        val start = frame.select((F.col("vid").as(originName) +: vals.map(F.col)): _*)
        start.join(e0.select(F.col(from), F.col(to).as(nxt)),
            F.col(originName) === F.col(from))
          .select(((chain :+ nxt).map(F.col) ++ vals.map(F.col)): _*)
      } else
        frame.join(e0.select(F.col(from).as(curCol), F.col(to).as(nxt)), Seq(curCol))
          .select(((chain :+ nxt).map(F.col) ++ vals.map(F.col)): _*)
    step(frame = joined, depth = depth + 1, onVertices = false)
  }

  /** out()/out(label…): one hop along out-edges. */
  def out(labels: String*): Traversal = hop(reverse = false, labels)

  /** in()/in(label…): one hop along in-edges. */
  def in(labels: String*): Traversal = hop(reverse = true, labels)

  /** Cross-step predicate over tapped value columns (Gremlin where). */
  def where(pred: Column): Traversal = step(frame = frame.filter(pred))

  /** Terminal projection: `as()` marks resolve to their vertex columns,
    * tapped values by their own names — then dedup/limit apply to
    * exactly these columns, matching the named entries' select-then-
    * distinct shape. */
  def select(names: String*): Traversal = {
    val cols = names.map { n =>
      marks.get(n) match {
        case Some(internal) if internal != n => F.col(internal).as(n)
        case _ => F.col(n)
      }
    }
    step(frame = df.select(cols: _*), onVertices = false)
  }

  def dedup(): Traversal = step(frame = frame.distinct())

  def limit(n: Int): Traversal = step(frame = frame.limit(n))

  /** The composed plan. */
  def df: DataFrame =
    if (onVertices) frame.select((F.col("vid").as(originName) +: vals.map(F.col)): _*)
    else frame
}
