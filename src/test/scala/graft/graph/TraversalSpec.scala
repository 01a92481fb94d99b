package graft.graph

import org.apache.spark.sql.{functions => F}

import graft.SparkSpec

/** The traversal DSL must compile to the named entries' plans — same
  * optimized join tree for g_twohop (asserted structurally), same rows
  * for the one-hop and motif shapes (their hand plans carry broadcast
  * hints the generic DSL deliberately leaves to AQE). */
class TraversalSpec extends SparkSpec {

  import Traversal.P

  test("DSL twohop compiles to g_twohop's optimized plan") {
    val dsl = GraphQueries.gDslTwoHop(spark, SF)
    val named = GraphQueries.gTwoHop(spark, SF)
    assert(dsl.queryExecution.optimizedPlan
      .sameResult(named.queryExecution.optimizedPlan),
      s"optimized plans diverged:\nDSL:\n${dsl.queryExecution.optimizedPlan}\n" +
        s"named:\n${named.queryExecution.optimizedPlan}")
    // and the rows are bit-identical (the driver gate re-proves this at
    // sf0.01 against the shared oracle)
    assert(dsl.collect().toSet == named.collect().toSet)
  }

  test("DSL onehop matches g_onehop row-for-row") {
    val dsl = GraphQueries.gDslOneHop(spark, SF)
    val named = GraphQueries.gOneHop(spark, SF)
    assert(dsl.columns.toSeq == named.columns.toSeq)
    assert(dsl.collect().groupBy(identity).view.mapValues(_.length).toMap ==
      named.collect().groupBy(identity).view.mapValues(_.length).toMap)
  }

  test("DSL motif (as/where over tapped values) matches g_motif") {
    val dsl = GraphQueries.gDslMotif(spark, SF)
    val named = GraphQueries.gMotif(spark, SF)
    assert(dsl.columns.toSeq == named.columns.toSeq)
    assert(dsl.collect().groupBy(identity).view.mapValues(_.length).toMap ==
      named.collect().groupBy(identity).view.mapValues(_.length).toMap)
  }

  test("hasLabel mid-traversal, in(), within, dedup, limit") {
    // customers -in_nation-> nation, then BACKWARDS along in_nation picks
    // up customers AND suppliers of that nation; hasLabel narrows.
    val t = Traversal.V(spark, SF)
      .hasLabel("customer").limit(3).as("c")
      .out("in_nation")
      .in("in_nation")
      .hasLabel("supplier")
      .as("s")
      .select("c", "s")
      .dedup()
    val rows = t.df.collect()
    assert(rows.nonEmpty)
    // every landed vertex really is a supplier (vid mod 4 == 1)
    assert(rows.forall(r => r.getLong(1) % 4 == 1))
    assert(rows.distinct.length == rows.length)

    val lim = Traversal.V(spark, SF).limit(5).df
    assert(lim.count() == 5)

    val within = Traversal.V(spark, SF)
      .hasLabel("nation").has("name", P.within("FRANCE", "GERMANY"))
      .value("name", "nm").select("nm").df
    assert(within.collect().map(_.getString(0)).toSet.subsetOf(
      Set("FRANCE", "GERMANY")))
  }
}
