package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

import graft.kv.{KVDeltaStore, KVStore}
import graft.kv.KVStore.encLong

/** The GRAPH WRITE LOOP through the KCV path — the reference's whole
  * write story is JanusGraph committing vertices and edges as KCV
  * mutations against `mutate(additions, deletions)` with
  * delete-before-add upsert (ref ClickhouseKeyColumnValueStore.java:133,
  * batched via mutateMany, ClickhouseStoreManager.java:79). graft could
  * already mutate a kv store and read a graph out of one
  * ([[KVGraphQueries.kvBackedGraph]]); this module closes the loop:
  * `addV` / `addE` / `dropEdges` COMPILE graph-shaped frames onto the
  * store's mutation batches, so an adjacency store is updated
  * incrementally and re-read by the existing g_kv_* plans.
  *
  * Layout (the [[KVGraphQueries]] adjacency layout, plus vertices):
  *   - vertex cell:  k = be(vid), c = be(0) ++ be(0),   v = be(vid % 4)
  *     — label id 0 is the reserved vertex column family (JanusGraph's
  *     hidden VertexExists property lives in the same store the edges
  *     do); the value carries the type code of the vid scheme.
  *   - edge cell:    k = be(src), c = be(labelId) ++ be(dst), v = be(w)
  *
  * Upsert semantics ride the store, not this module: a re-added edge's
  * (k, c) collides with its old cell, and both mutation paths resolve
  * the collision the reference's way — [[KVStore.mutate]] tombstones
  * every addition's own (k, c) first (delete-before-add), and
  * [[KVDeltaStore]]'s merge-on-read ranks (seq, op) so a same-batch
  * addition beats a same-batch deletion. So `addE` of an existing edge
  * SUPERSEDES its property value, and a deletion+addition of one edge
  * in one batch keeps the addition.
  *
  * Scale: every op here is a PROJECTION (graph frame → cell frame) —
  * zero shuffles added; the mutation cost is the store's (one bounded
  * delta append, or one co-bucketed anti-join for the snapshot form).
  */
object KVGraphMutations {

  /** The reserved vertex column family id (adjacency labels start at 1). */
  val VertexFamily = 0L

  /** Property-key ids inside the vertex family: the existence cell sits
    * at qualifier (0, 0), each property at (0, propId) — JanusGraph
    * stores vertex properties exactly so (one cell per property, the
    * property-key id from its schema registry as the column), and a
    * property READ is then getSlice(vertex, [propId, propId+1)).
    * Ids now come from the [[VertexSchema]] descriptor (r14 verdict #4 —
    * the registry is DATA, so a second corpus passes its own); this
    * value is the default descriptor's view, kept for the specs and
    * call sites that predate the descriptor. */
  val VPropIds: Seq[(String, Long)] = VertexSchema.Default.propIds

  /** addV: vertex frames (vid, …) → their existence cells (k, c, v).
    * The value carries the vid scheme's label code (vid % labelMod). */
  def vertexAdditions(vertices: DataFrame,
                      schema: VertexSchema = VertexSchema.Default): DataFrame =
    vertices.select(
      encLong(F.col("vid")).as("k"),
      F.concat(encLong(F.lit(VertexFamily)), encLong(F.lit(0L))).as("c"),
      encLong(F.pmod(F.col("vid"), F.lit(schema.labelMod))).as("v"))

  /** ONE home for a property's value-byte encoding — the property
    * cell's v AND the graphindex key must agree byte-for-byte, or an
    * index probe misses cells the store holds: doubles through dec2
    * string bytes (oracle-stable), everything else plain string bytes.
    * Driven by the DESCRIPTOR's type, with a loud failure if the frame
    * disagrees (a double column registered as string would silently
    * store full-precision bytes the dec2 oracle can't rebuild). */
  private def propValueBytes(vertices: DataFrame, p: VertexSchema.Prop)
      : org.apache.spark.sql.Column = {
    val isDoubleCol = vertices.schema(p.name).dataType ==
      org.apache.spark.sql.types.DoubleType
    require(isDoubleCol == p.isDouble,
      s"property '${p.name}': frame type and VertexSchema disagree " +
        s"(frame double=$isDoubleCol, schema double=${p.isDouble})")
    val raw = if (p.isDouble) graft.Tables.dec2(F.col(p.name)).cast("string")
              else F.col(p.name).cast("string")
    raw.cast("binary")
  }

  /** addV properties: one cell PER SET PROPERTY per vertex — c = (0,
    * propId), v = the value's string bytes (decimals via dec2 so the
    * bytes are oracle-stable; unset/null properties get NO cell, the
    * JanusGraph contract). The vertex's property read becomes a pushed
    * qualifier slice over the same store the edges live in. */
  def vertexPropAdditions(vertices: DataFrame,
                          schema: VertexSchema = VertexSchema.Default): DataFrame = {
    val cols = vertices.columns.toSet
    val present = schema.props.filter(p => cols.contains(p.name))
    require(present.nonEmpty,
      s"vertexPropAdditions: frame carries none of the registered vertex " +
        s"properties (${schema.props.map(_.name).mkString(", ")}) — use " +
        "vertexAdditions for existence-only cells")
    present.map { p =>
      vertices.filter(F.col(p.name).isNotNull).select(
        encLong(F.col("vid")).as("k"),
        F.concat(encLong(F.lit(VertexFamily)), encLong(F.lit(p.id))).as("c"),
        propValueBytes(vertices, p).as("v"))
    }.reduce(_ unionByName _)
  }

  /** The qualifier slice of ONE vertex property — [ (0, propId),
    * (0, propId+1) ): what the SPI's property read pushes. */
  def vpropSlice(prop: String, schema: VertexSchema = VertexSchema.Default)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val id = schema.propIds.toMap.apply(prop)
    (F.concat(encLong(F.lit(VertexFamily)), encLong(F.lit(id))),
      F.concat(encLong(F.lit(VertexFamily)), encLong(F.lit(id + 1))))
  }

  // ---- the GLOBAL COMPOSITE INDEX (JanusGraph's `graphindex` store) ----
  // A full-residency start set `V().has(prop, value)` over the vertex
  // store alone must pivot EVERY vertex and filter after (the r14
  // verdict's one unpruned scan). JanusGraph answers it with the
  // composite index: a second named store keyed on the property VALUE —
  // k = value bytes, c = be(vid) — opened through the same
  // openDatabase(name) SPI the reference implements
  // (ClickhouseStoreManager.java:79), so an equality start set becomes a
  // pushed key slice on the index plus a vid-keyed cell join. The key
  // bytes ride propValueBytes — byte-identical to the property cell's v,
  // the invariant that makes index probes exact.

  /** graphindex cells for one indexed property: k = value bytes,
    * c = be(vid), v = the existence marker. Null values get no cell
    * (nothing to look up), matching the property-cell contract. */
  def indexAdditions(vertices: DataFrame, prop: String,
                     schema: VertexSchema = VertexSchema.Default): DataFrame = {
    val p = schema.props.find(_.name == prop).getOrElse(
      throw new IllegalArgumentException(
        s"indexAdditions: '$prop' is not a registered vertex property"))
    vertices.filter(F.col(prop).isNotNull).select(
      propValueBytes(vertices, p).as("k"),
      encLong(F.col("vid")).as("c"),
      encLong(F.lit(1L)).as("v"))
  }

  /** graphindex tombstones — the (k, c) of each vertex's CURRENT value
    * cell. The caller hands the vertices WITH their old values (exactly
    * what a re-property mutation holds before the upsert): without
    * these, a re-valued vertex resurrects under its old value on the
    * next index probe (r14 verdict #8's failure mode). */
  def indexDeletions(vertices: DataFrame, prop: String,
                     schema: VertexSchema = VertexSchema.Default): DataFrame = {
    val p = schema.props.find(_.name == prop).getOrElse(
      throw new IllegalArgumentException(
        s"indexDeletions: '$prop' is not a registered vertex property"))
    vertices.filter(F.col(prop).isNotNull).select(
      propValueBytes(vertices, p).as("k"),
      encLong(F.col("vid")).as("c"))
  }

  // an UNKNOWN edge label resolves to id 0 = the vertex family: writing
  // such a cell would corrupt the vertex column family silently, so the
  // label id is guarded inside the load-bearing qualifier expression
  // (assert_true throws on the first unregistered label at write time)
  private def checkedLabelId =
    F.when(F.assert_true(KVGraphQueries.labelId > 0L,
      F.concat(F.lit("unregistered edge label '"), F.col("elabel"),
        F.lit("': adjacency labels must be registered in KVGraphQueries.LabelIds"))
    ).isNull, KVGraphQueries.labelId)

  /** addE: edge frames (src, dst, elabel, w) → adjacency cells (k, c, v). */
  def edgeAdditions(edges: DataFrame): DataFrame =
    edges.select(
      encLong(F.col("src")).as("k"),
      F.concat(encLong(checkedLabelId), encLong(F.col("dst"))).as("c"),
      encLong(F.col("w")).as("v"))

  /** dropE: edge frames (src, dst, elabel) → their tombstone (k, c). */
  def edgeDeletions(edges: DataFrame): DataFrame =
    edges.select(
      encLong(F.col("src")).as("k"),
      F.concat(encLong(checkedLabelId), encLong(F.col("dst"))).as("c"))

  /** The REVERSE adjacency family (JanusGraph's dual adjacency: every
    * edge is written into BOTH endpoints' adjacency lists — the IN
    * direction rides the destination vertex's list, so incoming hops
    * are the same pruned key-list slice outgoing ones are): the mirror
    * cell keys on the DST vertex, c = be(RevBase + labelId) ++ be(src).
    * Family ids ≥ RevBase partition the qualifier space away from the
    * primaries (1..) and the VCI families (1000+..). */
  val RevBase = 2000L

  /** addE's mirror half: edge frames → reverse-family cells (k, c, v). */
  def edgeRevAdditions(edges: DataFrame): DataFrame =
    edges.select(
      encLong(F.col("dst")).as("k"),
      F.concat(encLong(checkedLabelId + RevBase), encLong(F.col("src"))).as("c"),
      encLong(F.col("w")).as("v"))

  /** dropE's mirror half: the reverse-family tombstones (k, c). */
  def edgeRevDeletions(edges: DataFrame): DataFrame =
    edges.select(
      encLong(F.col("dst")).as("k"),
      F.concat(encLong(checkedLabelId + RevBase), encLong(F.col("src"))).as("c"))

  /** addE's VCI half: the w-sorted family's cells (k, c, v) — the ONE
    * encoder dualAdjacency/fullStoreCells persist per edge. The weight
    * rides the qualifier, where encLong's byte order is order-preserving
    * only for w >= 0 — KVGraphQueries.checkedW fails loudly on the
    * first negative weight (same guard as the label id). */
  def edgeVciAdditions(edges: DataFrame): DataFrame =
    edges.select(
      encLong(F.col("src")).as("k"),
      F.concat(encLong(checkedLabelId + KVGraphQueries.VciBase),
        encLong(KVGraphQueries.checkedW), encLong(F.col("dst"))).as("c"),
      encLong(F.col("w")).as("v"))

  /** dropE's VCI half: the w-sorted family's tombstones (k, c). The
    * qualifier carries the WEIGHT, so deletions need the edge's current
    * w — exactly what the edge frame holds. Without these, a store
    * carrying the index family would keep ghost cells an index-routed
    * read resurrects after a drop (r14 review #1). */
  def edgeVciDeletions(edges: DataFrame): DataFrame =
    edges.select(
      encLong(F.col("src")).as("k"),
      F.concat(encLong(checkedLabelId + KVGraphQueries.VciBase),
        encLong(F.col("w")), encLong(F.col("dst"))).as("c"))

  /** dropV's tombstone set — JanusGraph's vertex removal deletes the
    * vertex AND its incident edges in one mutation: for each doomed
    * vertex (a (vid) frame), the existence cell, every registered
    * property cell, and — joined against the graph's edge frame — every
    * incident edge in BOTH adjacency directions (the reverse-family
    * tombstones are harmless no-ops on single-direction stores). One
    * projection per cell kind plus two doomed⋈edges joins; the joins
    * are doomed-sized, never store-sized. */
  def vertexDeletions(doomed: DataFrame, edges: DataFrame,
                      schema: VertexSchema = VertexSchema.Default): DataFrame = {
    val vids = doomed.select("vid").distinct()
    val vCells = (0L +: schema.props.map(_.id)).map { pid =>
      vids.select(
        encLong(F.col("vid")).as("k"),
        F.concat(encLong(F.lit(VertexFamily)), encLong(F.lit(pid))).as("c"))
    }.reduce(_ unionByName _)
    val outE = edges.join(vids.select(F.col("vid").as("src")), "src")
    val inE = edges.join(vids.select(F.col("vid").as("dst")), "dst")
    // all THREE copies of each incident edge go: primary, mirror, AND
    // the w-sorted VCI family — on stores without a family the extra
    // tombstones are no-ops, on index-carrying stores skipping them
    // would leave ghost cells an index-routed read resurrects
    val eCells = Seq(outE, inE)
      .flatMap(e => Seq(edgeDeletions(e), edgeRevDeletions(e),
        edgeVciDeletions(e)))
      .reduce(_ unionByName _)
    vCells.unionByName(eCells)
  }

  /** The edge-cell additions for a store's declared family layout:
    * primary always; mirror and VCI halves when the store carries them.
    * Mutating a multi-family store through the primary-only batch
    * silently desynchronizes the families (an in() hop keeps seeing a
    * dropped edge whose mirror cell survived — r14 review #2), so the
    * CALLER states the layout once and every batch covers it. */
  def edgeAdditionsFor(edges: DataFrame, mirror: Boolean, vci: Boolean): DataFrame = {
    val base = edgeAdditions(edges)
    val withMirror = if (mirror) base.unionByName(edgeRevAdditions(edges)) else base
    if (vci) withMirror.unionByName(edgeVciAdditions(edges)) else withMirror
  }

  /** [[edgeAdditionsFor]]'s tombstone twin. */
  def edgeDeletionsFor(edges: DataFrame, mirror: Boolean, vci: Boolean): DataFrame = {
    val base = edgeDeletions(edges)
    val withMirror = if (mirror) base.unionByName(edgeRevDeletions(edges)) else base
    if (vci) withMirror.unionByName(edgeVciDeletions(edges)) else withMirror
  }

  /** Snapshot-path mutation: one [[KVStore.mutate]] applying addV + addE
    * + dropEdges as ONE batch (deletions strictly before additions, each
    * addition upserting its own cell — the reference's order). `mirror`/
    * `vci` must state the store's family layout (see
    * [[edgeAdditionsFor]]). */
  def mutateSnapshot(store: DataFrame, addV: DataFrame, addE: DataFrame,
                     dropE: DataFrame, mirror: Boolean = false,
                     vci: Boolean = false): DataFrame =
    KVStore.mutate(store,
      vertexAdditions(addV).unionByName(edgeAdditionsFor(addE, mirror, vci)),
      edgeDeletionsFor(dropE, mirror, vci))

  /** Log-path mutation: the same batch appended to a [[KVDeltaStore]]
    * (no snapshot rewrite — the form that keeps graph writes viable at
    * 100 TB; merge-on-read resolves it identically to the snapshot
    * path, KVGraphMutateSpec asserts the equivalence cell for cell).
    * `wts` is the batch's write timestamp and has NO default on purpose
    * (r13 advice #4): wall-clock stamps make batch metadata
    * non-reproducible, and time-travel reads over the log would then
    * depend on run timing — callers state their own clock. */
  def mutateLog(ds: KVDeltaStore, name: String, addV: DataFrame,
                addE: DataFrame, dropE: DataFrame, wts: Long,
                mirror: Boolean = false, vci: Boolean = false): Unit =
    ds.appendMutation(name,
      vertexAdditions(addV).unionByName(edgeAdditionsFor(addE, mirror, vci)),
      edgeDeletionsFor(dropE, mirror, vci), wts)

  /** [[mutateLog]] at an EXPLICIT log sequence — the form concurrent
    * appends need (deriving "the next free seq" from a listing is racy
    * when independent batches overlap; an explicit seq is not). */
  def mutateLogAt(ds: KVDeltaStore, name: String, seq: Long, addV: DataFrame,
                  addE: DataFrame, dropE: DataFrame, wts: Long,
                  mirror: Boolean = false, vci: Boolean = false): Unit =
    ds.appendMutationAt(name, seq,
      vertexAdditions(addV).unionByName(edgeAdditionsFor(addE, mirror, vci)),
      edgeDeletionsFor(dropE, mirror, vci), wts)
}
