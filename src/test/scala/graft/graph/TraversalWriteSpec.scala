package graft.graph

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** The DSL write vocabulary (r13 verdict #6): addV/property/drop must
  * produce mutation-compiler-ready frames with the right shapes,
  * orientations, and guards. */
class TraversalWriteSpec extends SparkSpec {

  test("addV materializes vertex frames from the walked chain") {
    val vf = Traversal.V(spark, SF)
      .hasLabel("nation").value("name", "nm").as("n")
      .addV("nation", F.col("n"), "name" -> F.col("nm"))
    assert(vf.columns.toSeq == Seq("vid", "vlabel", "name"))
    val rows = vf.collect()
    val expect = PropertyGraph(spark, SF).vertices
      .filter(F.col("vlabel") === "nation").select("vid", "vlabel", "name")
      .collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      expect.map(_.toString).sorted.toSeq && rows.nonEmpty)
    // and it compiles onto existence + property cells
    assert(KVGraphMutations.vertexAdditions(vf).count() == rows.length)
    assert(KVGraphMutations.vertexPropAdditions(vf).count() == rows.length)
  }

  test("property() yields (vid, key) upsert rows for the current vertices") {
    val pf = Traversal.V(spark, SF)
      .hasLabel("customer").has("mktsegment", "AUTOMOBILE")
      .property("mktsegment", F.lit("BUILDING"))
    assert(pf.columns.toSeq == Seq("vid", "mktsegment"))
    val n = PropertyGraph(spark, SF).vertices
      .filter(F.col("vlabel") === "customer" && F.col("mktsegment") === "AUTOMOBILE")
      .count()
    assert(pf.count() == n && n > 0)
    assert(pf.select("mktsegment").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("BUILDING"))
  }

  test("property() works after a hop, keyed on the hop's vertex") {
    val pf = Traversal.V(spark, SF)
      .hasLabel("customer").has("mktsegment", "BUILDING")
      .out("in_nation")
      .property("name", F.lit("X"))
    // keyed on the NATION vids (the hop target), bag semantics
    assert(pf.columns.toSeq == Seq("vid", "name"))
    assert(pf.select("vid").distinct().collect()
      .forall(_.getLong(0) % 4 == 2))
  }

  test("drop() on outE yields (src, dst, elabel) with the step orientation") {
    val del = Traversal.V(spark, SF)
      .hasLabel("nation").outE("in_region").drop()
    assert(del.columns.toSeq == Seq("src", "dst", "elabel"))
    val rows = del.collect()
    assert(rows.nonEmpty)
    // src must be the nation (near endpoint), dst the region
    assert(rows.forall(r => r.getLong(0) % 4 == 2 && r.getLong(1) % 4 == 3))
    assert(rows.forall(_.getString(2) == "in_region"))
  }

  test("drop() on inE swaps the orientation back to storage order") {
    val del = Traversal.V(spark, SF)
      .hasLabel("region").inE("in_region").drop()
    val rows = del.collect()
    assert(rows.nonEmpty)
    // stored edges run nation → region regardless of traversal direction
    assert(rows.forall(r => r.getLong(0) % 4 == 2 && r.getLong(1) % 4 == 3))
  }

  test("drop() respects edge predicates") {
    val del = Traversal.V(spark, SF)
      .hasLabel("customer").outE("in_nation").has("w", Traversal.P.lte(2L)).drop()
    val all = Traversal.V(spark, SF)
      .hasLabel("customer").outE("in_nation").drop()
    assert(del.count() < all.count() && del.count() > 0)
  }

  test("write-step guards fail loudly") {
    val t = Traversal.V(spark, SF).hasLabel("nation")
    intercept[IllegalArgumentException](t.drop()) // no edge step
    val onEdge = t.outE("in_region")
    intercept[IllegalArgumentException](onEdge.addV("x", F.lit(1L)))
    intercept[IllegalArgumentException](onEdge.property("name", F.lit("x")))
    // after group(): chain is gone
    val grp = Traversal.V(spark, SF)
      .hasLabel("customer").out("in_nation").as("n")
      .group("n", F.count(F.lit(1)).as("cnt"))
    intercept[IllegalArgumentException](grp.property("name", F.lit("x")))
    intercept[IllegalArgumentException](grp.addV("x", F.lit(1L)))
  }

  test("g_kv_dsl_mutate scalar invariants hold at sf0.001") {
    val df = KVGraphQueries.gKvDslMutate(spark, SF)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) == 0L)) // rem_region_edges
    assert(rows.forall(_.getLong(3) == 25L)) // n_nation_cells
    // the upserted AUTOMOBILE customers joined in: count matches oracle set
    val expect = graft.Tables(spark, SF, "customer")
      .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).count()
    assert(rows.length == expect)
  }
}
