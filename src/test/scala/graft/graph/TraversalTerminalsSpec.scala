package graft.graph

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** The DSL read terminals (r14 verdict #5): count()/sum()/mean() as
  * global aggregates with bag semantics, values()/valueMap() property
  * projections with the null-omission contract, and V(ids…) seeding. */
class TraversalTerminalsSpec extends SparkSpec {

  private def g = PropertyGraph(spark, SF)

  test("count() counts traversers in every state") {
    val verts = g.vertices.count()
    assert(Traversal.V(g).count().df.collect()(0).getLong(0) == verts)
    // mid-chain: one traverser per walked edge (bag semantics)
    val hops = Traversal.V(g).hasLabel("customer").out("in_nation")
      .count().df.collect()(0).getLong(0)
    assert(hops == g.vertices.filter(F.col("vlabel") === "customer").count())
    // on an edge step: outE().count() counts edges without completing
    val edges = Traversal.V(g).hasLabel("customer").outE("in_nation")
      .count().df.collect()(0).getLong(0)
    assert(edges == hops)
    // after group(): counts the aggregate's rows (frame-shaped state)
    val groups = Traversal.V(g).hasLabel("customer").as("c")
      .out("in_nation").as("n")
      .group("n", F.count(F.lit(1)).as("m"))
      .count().df.collect()(0).getLong(0)
    assert(groups == graft.Tables(spark, SF, "customer")
      .select("c_nationkey").distinct().count())
  }

  test("sum() and mean() aggregate a tapped value") {
    val t = Traversal.V(g).hasLabel("customer")
      .outE("in_nation").value("w", "w_e").inV()
    val expect = PropertyGraph(spark, SF).edges
      .filter(F.col("elabel") === "in_nation")
      .join(g.vertices.filter(F.col("vlabel") === "customer")
        .select(F.col("vid").as("src")), "src")
    assert(t.sum("w_e", "s").df.collect()(0).getLong(0) ==
      expect.agg(F.sum("w")).collect()(0).getLong(0))
    assert(math.abs(t.mean("w_e", "m").df.collect()(0).getDouble(0) -
      expect.agg(F.avg("w")).collect()(0).getDouble(0)) < 1e-12)
    // an unknown tap fails loudly, not with an unresolved column
    val e = intercept[IllegalArgumentException] {
      Traversal.V(g).hasLabel("customer").sum("nope")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("values() emits set properties only, multi-key interleaves") {
    // regions have name but null acctbal/mktsegment: only names emit
    val vals = Traversal.V(g).hasLabel("region")
      .values("name", "mktsegment").collect().map(_.getString(0)).sorted
    val names = g.vertices.filter(F.col("vlabel") === "region")
      .select("name").collect().map(_.getString(0)).sorted
    assert(vals.toSeq == names.toSeq && vals.nonEmpty)
    // two set keys → two rows per vertex, string-cast
    val two = Traversal.V(g).hasLabel("customer")
      .values("name", "acctbal").count()
    assert(two == 2 * g.vertices.filter(F.col("vlabel") === "customer").count())
    // after a hop: the taps fuse into one vertex join, values flow
    val hopVals = Traversal.V(g).hasLabel("supplier").out("in_nation")
      .values("name").collect()
    assert(hopVals.length ==
      g.vertices.filter(F.col("vlabel") === "supplier").count())
  }

  test("valueMap() omits absent properties from the map") {
    val rows = Traversal.V(g).hasLabel("region")
      .valueMap("name", "mktsegment", "acctbal").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getMap[String, String](1)
      assert(m.keySet == Set("name"), s"unexpected keys: ${m.keySet}")
    }
    val cust = Traversal.V(g).hasLabel("customer")
      .valueMap("name", "mktsegment").collect()
    assert(cust.forall(_.getMap[String, String](1).keySet ==
      Set("name", "mktsegment")))
    // vid column carries the traverser's current vertex
    val vids = cust.map(_.getLong(0)).toSet
    assert(vids.forall(_ % 4 == 0))
  }

  test("V(ids…) seeds exactly those vertices") {
    val rows = Traversal.V(g, 4L, 8L, 12L)
      .value("name", "nm").as("c").select("c", "nm").df.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(4L, 8L, 12L))
    // and the seeded start composes with hops
    val hop = Traversal.V(g, 4L).out("in_nation").count().df
      .collect()(0).getLong(0)
    assert(hop == 1L)
    intercept[IllegalArgumentException] { Traversal.V(g, Seq.empty[Long]: _*) }
  }

  test("terminals resolve a deferred (index-capable) start set first") {
    // an index-capable graph defers V()'s predicates; count() must
    // resolve the start set before aggregating — same answer as eager
    val sentinel = g.copy(vertexIndex = Some(new PropertyGraph.VertexIndex {
      override def lookup(label: String, prop: String, values: Seq[Any]) =
        if (prop != "mktsegment") None
        else Some(g.vertices.filter(F.col("vlabel") === label &&
          F.col("mktsegment").isin(values: _*)))
    }))
    val routed = Traversal.V(sentinel)
      .hasLabel("customer").has("mktsegment", "BUILDING")
      .count().df.collect()(0).getLong(0)
    val eager = g.vertices.filter(F.col("vlabel") === "customer" &&
      F.col("mktsegment") === "BUILDING").count()
    assert(routed == eager && eager > 0)
  }
}
