package graft.graph

/** The vertex-schema DESCRIPTOR — JanusGraph's schema registry as data,
  * not code (r14 verdict #4): which label each vid code decodes to and
  * which property ids/types the vertex column family carries. Every
  * vertex codec ([[KVGraphMutations.vertexAdditions]] /
  * [[KVGraphMutations.vertexPropAdditions]] /
  * [[KVGraphQueries.storeVertices]]) takes one of these, so a SECOND
  * corpus — different labels, different properties — rides the same
  * full-residency code path by passing its own descriptor
  * (KVSchemaSpec builds a two-label store with a disjoint property set
  * through exactly these functions). JanusGraph stores the same facts
  * as rows in its system schema vertex space
  * (the id-manager's type codes + PropertyKey definitions); graft keeps
  * them a value because the descriptor must also be available to the
  * DuckDB oracle side, which rebuilds the graph arithmetically.
  *
  * Conventions the codecs rely on:
  *   - vid encodes the label: `vlabel = labels(vid % labelMod)` — the
  *     collision-free arithmetic scheme [[PropertyGraph]] documents;
  *   - property id 0 is RESERVED for the existence cell (JanusGraph's
  *     hidden VertexExists property), so real ids start at 1;
  *   - a `double` property's value bytes go through the dec2 string
  *     discipline (2-decimal fixed point) so stored bytes are
  *     oracle-stable — the same rule either side of the round trip.
  */
final case class VertexSchema(
    labelMod: Long,
    labels: Seq[(String, Long)],
    props: Seq[VertexSchema.Prop]) {
  require(labels.nonEmpty && labels.map(_._2).distinct.size == labels.size,
    "labels must be non-empty with distinct codes")
  require(labels.forall { case (_, code) => code >= 0 && code < labelMod },
    s"label codes must lie in [0, $labelMod)")
  require(props.forall(_.id >= 1) && props.map(_.id).distinct.size == props.size,
    "property ids must be distinct and >= 1 (0 is the existence cell)")

  /** (name -> propId), the shape the historical VPropIds exposed. */
  def propIds: Seq[(String, Long)] = props.map(p => p.name -> p.id)

  /** The family's qualifier upper fence: max prop id + 1 (existence-only
    * schemas still span [0, 1)). */
  def maxPropId: Long = if (props.isEmpty) 0L else props.map(_.id).max

  /** vlabel as a PURE EXPRESSION of a vid column (the vid scheme's
    * label code) — the one home of the decode; the pivot
    * (KVGraphQueries.storeVertices) and the per-property read path
    * (VertexPropSource.labelOf) must agree literally. Unregistered
    * codes decode to null. */
  def labelExpr(vid: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.{functions => F}
    val code = F.pmod(vid, F.lit(labelMod))
    labels.init.foldLeft(
        F.when(code === F.lit(labels.last._2), labels.last._1)) {
      case (acc, (name, lc)) => acc.when(code === F.lit(lc), name)
    }
  }
}

object VertexSchema {
  /** One registered vertex property: its qualifier id inside the vertex
    * family and whether the value takes the dec2 double discipline. */
  final case class Prop(name: String, id: Long, isDouble: Boolean = false)

  /** The TPC-H-derived default corpus ([[PropertyGraph]]'s scheme) —
    * every historical entry and spec rides this descriptor implicitly. */
  val Default: VertexSchema = VertexSchema(
    labelMod = 4L,
    labels = Seq("customer" -> 0L, "supplier" -> 1L, "nation" -> 2L, "region" -> 3L),
    props = Seq(Prop("name", 1L), Prop("acctbal", 2L, isDouble = true),
      Prop("mktsegment", 3L)))
}
