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

  test("repeat(out()).times(2) compiles to the same plan as out().out()") {
    val unrolled = Traversal.V(spark, SF)
      .hasLabel("customer").has("acctbal", P.gt(1000.0))
      .as("src_vid")
      .repeat(Traversal.out()).times(2).as("dst_vid")
      .value("name", "dst_name")
      .select("src_vid", "dst_vid", "dst_name")
      .dedup()
      .df
    val named = GraphQueries.gTwoHop(spark, SF)
    assert(unrolled.queryExecution.optimizedPlan
      .sameResult(named.queryExecution.optimizedPlan),
      "repeat/times(2) diverged from the hand-chained two-hop plan")
  }

  test("repeat(both()).path() compiles onto g_paths' frontier plan") {
    // plan identity cannot be asserted structurally here: the frontier
    // iteration localCheckpoints each level, so two CALLS materialize
    // distinct LogicalRDDs. Row equality + the shared driver oracle
    // (g_dsl_paths rides gPathsSql's hash) carry the equivalence.
    val dsl = GraphQueries.gDslPaths(spark, SF)
    val named = GraphQueries.gPaths(spark, SF)
    assert(dsl.columns.toSeq == named.columns.toSeq)
    assert(dsl.collect().toSet == named.collect().toSet)
    // multi-vertex frontier must refuse (per-source trees are
    // g_bfs_multi's surface)
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("customer")
        .repeat(Traversal.both()).path()
    }
  }

  test("adjacent property steps fuse into ONE vertex join per hop") {
    // hasLabel + has + value after a hop: unfused this plans three
    // vertex self-joins; fused it must be exactly two joins total
    // (start⋈edges, then ONE property join) — r11 verdict #6
    val t = Traversal.V(spark, SF)
      .hasLabel("customer").as("c")
      .out("in_nation")
      .hasLabel("nation").has("name", P.neq("ZZZ")).value("name", "nm")
      .select("c", "nm")
      .df
    val joins = t.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 2,
      s"expected 2 joins (hop + one fused property join), got ${joins.size}:\n" +
        t.queryExecution.optimizedPlan)
    // and the fused rows match the unfused semantics
    val rows = t.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) % 4 == 0)) // customers
  }

  test("order().by + range plans one bounded TopN, rows deterministic") {
    val df = GraphQueries.gDslOrder(spark, SF)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"ordered+bounded traversal should plan TakeOrderedAndProject:\n$phys")
    val rows = df.collect()
    assert(rows.length == 10)
    val bals = rows.map(_.getDouble(1))
    assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
  }

  test("groupCount matches a manual aggregate") {
    val dsl = GraphQueries.gDslGroupCount(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val g = PropertyGraph(spark, SF)
    val manual = g.edges.filter(F.col("elabel") === "in_nation")
      .join(g.vertices.filter(F.col("vlabel") === "customer")
        .select(F.col("vid").as("src")), "src")
      .groupBy("dst").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dsl == manual)
  }

  test("group().by(key).by(agg) is one aggregate over the chain, no extra join") {
    // same key and aggregate as groupCount: rows must agree exactly
    val grp = Traversal.V(spark, SF)
      .hasLabel("customer").out("in_nation").as("n_vid")
      .group("n_vid", F.count(F.lit(1)).as("cnt"))
      .df
    val gc = GraphQueries.gDslGroupCount(spark, SF)
    val a = grp.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = gc.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b && a.nonEmpty)
    // plan shape: the hop's one join plus ONE aggregate, nothing else
    def joinCount(p: org.apache.spark.sql.DataFrame): Int =
      p.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    def aggCount(p: org.apache.spark.sql.DataFrame): Int =
      p.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.size
    val bareHop = Traversal.V(spark, SF)
      .hasLabel("customer").out("in_nation").as("n_vid").df
    assert(joinCount(grp) == joinCount(bareHop),
      s"group() must not add joins:\n${grp.queryExecution.optimizedPlan}")
    assert(aggCount(grp) == 1)
  }

  test("project() is one projection over marks and taps, no extra join") {
    val df = GraphQueries.gDslProject(spark, SF)
    def joinCount(p: org.apache.spark.sql.DataFrame): Int =
      p.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    // the walk is one hop join + one fused name tap join; project adds none
    val bare = Traversal.V(spark, SF)
      .hasLabel("supplier").value("acctbal", "s_bal").as("s_vid")
      .out("in_nation").value("name", "n_name")
      .select("s_vid", "n_name").df
    assert(joinCount(df) == joinCount(bare),
      s"project() must not add joins:\n${df.queryExecution.optimizedPlan}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the computed band agrees with a manual recomputation
    val manual = PropertyGraph(spark, SF).vertices
      .filter(F.col("vlabel") === "supplier")
      .select(F.col("vid"), F.floor(F.col("acctbal") / 1000.0).cast("long").as("band"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => manual(r.getLong(0)) == r.getLong(2)))
  }

  test("pathE interleaves hop labels; edge steps and wildcards render correctly") {
    // labeled out-hops
    val rows = GraphQueries.gDslPathE(spark, SF).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1).contains(" -[in_nation]-> ")))
    assert(rows.forall(_.getString(1).contains(" -[in_region]-> ")))
    // an outE/inV edge step records its label the same way
    val viaEdgeStep = Traversal.V(spark, SF)
      .hasLabel("customer").has("mktsegment", "BUILDING").as("c_vid")
      .outE("in_nation").inV()
      .pathE("p").select("c_vid", "p").df.collect()
    assert(viaEdgeStep.nonEmpty &&
      viaEdgeStep.forall(_.getString(1).contains(" -[in_nation]-> ")))
    // a reverse hop renders the reverse arrow; label-free renders [*]
    val rev = Traversal.V(spark, SF)
      .hasLabel("nation").in("in_nation").pathE("p").df
      .select("p").head().getString(0)
    assert(rev.contains(" <-[in_nation]- "), rev)
    val free = Traversal.V(spark, SF)
      .hasLabel("region").in().pathE("p").df
      .select("p").head().getString(0)
    assert(free.contains(" <-[*]- "), free)
    // a NEAR completion (outE().outV()) must not render a directed
    // self-edge — the traverser stepped back onto its own vertex
    val near = Traversal.V(spark, SF)
      .hasLabel("customer").has("mktsegment", "BUILDING")
      .outE("in_nation").outV().pathE("p").df
      .select("p").head().getString(0)
    assert(near.contains(" =[in_nation]= ") && !near.contains("->"), near)
    // zero-hop path()/pathE() on the vertex frame must not crash
    val zero = Traversal.V(spark, SF).hasLabel("region").pathE("p").df
      .select("p").head().getString(0)
    assert(zero.nonEmpty && !zero.contains("["))
    val zeroP = Traversal.V(spark, SF).hasLabel("region").path("p").df
      .select("p").head().getString(0)
    assert(zeroP.nonEmpty)
  }

  test("outE/has(w)/value/inV: edge-property filter inside the hop join") {
    val df = GraphQueries.gDslEdgeW(spark, SF)
    // edge has()/value() must be FREE: exactly ONE join beyond what the
    // edge frame itself costs (peer edges are derived via a supplier
    // self-join inside PropertyGraph) — the hop join; none for the
    // property predicate or tap
    def joinCount(p: org.apache.spark.sql.DataFrame): Int =
      p.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    val baseJoins = joinCount(PropertyGraph(spark, SF).edges
      .filter(F.col("elabel") === "peer"))
    assert(joinCount(df) == baseJoins + 1,
      s"edge property steps must not add joins: base=$baseJoins got ${joinCount(df)}:\n" +
        df.queryExecution.optimizedPlan)
    // sf0.001 has zero peer edges (one supplier per nation there, like
    // g_motif's empty frame); row content is asserted at sf0.01
    val SF01 = "/root/testdata/sf0.01"
    val rows = GraphQueries.gDslEdgeW(spark, SF01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, w) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(w == (a + b) % 5 + 1, s"w mismatch for ($a,$b): $w")
      assert(w <= 2L)
      assert(a % 4 == 1 && b % 4 == 1) // suppliers on both ends
    }
    // inE().outV() walks the same edges backwards
    val back = Traversal.V(spark, SF01)
      .hasLabel("supplier").as("b_vid")
      .inE("peer").has("w", P.lte(2L)).value("w", "w_e")
      .outV().as("a_vid")
      .select("a_vid", "b_vid", "w_e")
      .df.collect()
    assert(back.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("name collisions with vertex/edge properties are rejected") {
    // r11 advice #1: a tap named after an existing vertex property
    // would silently shadow it — must throw instead
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("customer").value("acctbal", "name")
    }
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("supplier").value("acctbal", "w")
    }
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("supplier").as("__has0")
    }
    // hop-join internals are reserved too (r12 review)
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("supplier").value("acctbal", "__from")
    }
    // a PENDING (buffered, unflushed) tap claims its name immediately:
    // as()/a second value() on the same name must throw, not silently
    // rebind at flush time (r12 review — fusion must not regress the
    // r11 collision guard)
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("customer").out("in_nation")
        .value("name", "x").as("x")
    }
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("customer").out("in_nation")
        .value("name", "x").value("acctbal", "x")
    }
    // edge steps: src/dst are hop endpoints, not reachable properties
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("supplier").outE("peer")
        .has("src", P.gt(0L))
    }
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("supplier").outE("peer")
        .value("dst", "d")
    }
  }

  test("pathTree accepts a converging frontier with ONE distinct vertex") {
    // ASIA's nations hop BACK to ASIA: several rows, one distinct
    // current vertex — must not refuse (r12 review: the single-source
    // check counts DISTINCT vertices, not frame rows)
    val df = Traversal.V(spark, SF)
      .hasLabel("region").has("name", "ASIA")
      .in("in_region")
      .out("in_region")
      .repeat(Traversal.both()).path()
    assert(df.columns.toSeq == Seq("vid", "d", "path"))
    assert(df.count() > 0)
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

  test("repeat(in()).until: first-hit BFS stops at matches, expands past non-matches") {
    // from ASIA: hop 1 = nations (expand), hop 2 = customers (MATCH,
    // stop) + suppliers (expand through peer cliques, never match)
    val got = GraphQueries.gDslUntil(spark, SF).collect().map(_.getLong(0)).toSet
    // expected: exactly the customers of ASIA nations (vid mod 4 == 0),
    // built by hand from the frames
    val g = PropertyGraph(spark, SF)
    val asia = g.vertices
      .filter(F.col("vlabel") === "region" && F.col("name") === "ASIA")
      .select(F.col("vid").as("rv"))
    val nat = g.edges.filter(F.col("elabel") === "in_region")
      .join(asia, F.col("dst") === F.col("rv")).select(F.col("src").as("nv"))
    val cust = g.edges.filter(F.col("elabel") === "in_nation")
      .join(nat, F.col("dst") === F.col("nv"))
      .filter(F.col("src") % 4 === 0).select("src")
      .collect().map(_.getLong(0)).toSet
    assert(got == cust, s"until() diverged: got ${got.size}, want ${cust.size}")
    assert(got.nonEmpty && got.forall(_ % 4 == 0))
  }

  test("until is multi-source and emits nothing when no vertex matches") {
    // every nation expands backwards; predicate never matches
    val none = Traversal.V(spark, SF)
      .hasLabel("region")
      .repeat(Traversal.in()).until("vlabel", P.is("no_such_label"))
    assert(none.count() == 0)
    // matched-at-source is NOT emitted (do-while): regions seed the BFS,
    // predicate matches regions only — nothing else is ever reached that
    // matches, so the result is empty even though every SOURCE matches
    val srcOnly = Traversal.V(spark, SF)
      .hasLabel("region")
      .repeat(Traversal.in()).until("vlabel", P.is("region"))
    assert(srcOnly.count() == 0)
  }

  test("outE().outV() and inE().inV() land on the NEAR endpoint") {
    // Gremlin: outV is the tail, inV the head — outE().outV() steps
    // back onto the current vertex (r12 second review: both completions
    // used to project the far endpoint)
    val near = Traversal.V(spark, SF)
      .hasLabel("customer").as("a")
      .outE("in_nation").outV().as("b")
      .select("a", "b").df.collect()
    assert(near.nonEmpty && near.forall(r => r.getLong(0) == r.getLong(1)))
    val nearIn = Traversal.V(spark, SF)
      .hasLabel("nation").as("a")
      .inE("in_nation").inV().as("b")
      .select("a", "b").df.collect()
    assert(nearIn.nonEmpty && nearIn.forall(r => r.getLong(0) == r.getLong(1)))
    // far completions unchanged
    val far = Traversal.V(spark, SF)
      .hasLabel("customer").as("a")
      .outE("in_nation").inV().as("b")
      .select("a", "b").df.collect()
    assert(far.nonEmpty && far.forall(r => r.getLong(1) % 4 == 2))
  }

  test("union merges branch traverser streams with bag semantics") {
    val u = Traversal.V(spark, SF)
      .hasLabel("supplier").as("s")
      .union(_.out("in_nation"), _.out("in_nation")).as("e")
      .select("s", "e").df.collect()
    // the duplicated branch doubles every traverser (bag, not set)
    val single = Traversal.V(spark, SF)
      .hasLabel("supplier").as("s").out("in_nation").as("e")
      .select("s", "e").df.collect()
    assert(u.length == 2 * single.length && single.nonEmpty)
    assert(u.toSet == single.toSet)
    // a branch that does not hop is refused
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("supplier")
        .union(_.out("peer"), identity)
    }
  }

  test("coalesce/optional fall back per traverser, not globally") {
    // acctbal > 9000 holds customers (never peer-linked) and suppliers
    val base = Traversal.V(spark, SF).has("acctbal", P.gt(9000.0))
    val opt = base.as("a").optional(_.out("peer")).as("e")
      .select("a", "e").df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baseVids = base.df.collect().map(_.getLong(0)).toSet
    assert(opt.nonEmpty)
    // every incoming traverser survives: the a-side covers base exactly
    assert(opt.map(_._1).toSet == baseVids)
    // customers (vid % 4 == 0) have no peers -> identity fallback
    val custRows = opt.filter(_._1 % 4 == 0)
    assert(custRows.nonEmpty && custRows.forall(r => r._1 == r._2))
    // coalesce(to-peers, to-nation): suppliers with peers go to peers,
    // everyone else lands on their nation (customers have in_nation too)
    val coal = base.as("a").coalesce(_.out("peer"), _.out("in_nation")).as("e")
      .select("a", "e").df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(coal.map(_._1).toSet == baseVids)
    // fallback rows land on nations (vid % 4 == 2)
    assert(coal.filter(_._1 % 4 == 0).forall(_._2 % 4 == 2))
  }

  test("simplePath filters revisits with a plain filter (no extra join)") {
    // customer -> its nation -> BACK along in_nation: the backtrack
    // a->n->a exists for every customer (peer cliques may be empty at
    // sf0.001 where nations hold <= 1 supplier)
    val base = Traversal.V(spark, SF)
      .hasLabel("customer").as("a")
      .out("in_nation").in("in_nation")
    val all = base.df
    val simple = base.simplePath().df
    // a->b->a backtracks exist in every peer clique and are dropped
    assert(all.filter(F.col("a") === F.col("v2")).count() > 0)
    assert(simple.filter(F.col("a") === F.col("v2")).count() == 0)
    assert(simple.filter(F.col("v1") === F.col("v2")).count() == 0)
    // same join tree: simplePath adds a Filter, never a join
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    assert(joins(simple) == joins(all))
    // and it refuses before any hop (no chain to deduplicate)
    intercept[IllegalArgumentException] {
      Traversal.V(spark, SF).hasLabel("supplier").simplePath()
    }
  }

  test("group() aggregates can reference as() marks by their user name") {
    // sum over a mark used INSIDE the aggregate — died unresolved before
    // group() built on exposedMarks (r13 advice #1)
    val grp = Traversal.V(spark, SF)
      .hasLabel("customer").value("acctbal", "c_bal").as("c_vid")
      .out("in_nation").as("n_vid")
      .group("n_vid", F.sum(F.col("c_bal")).as("bal_sum"),
        F.count(F.col("c_vid")).as("cnt"))
      .df
    val g = PropertyGraph(spark, SF)
    val manual = g.edges.filter(F.col("elabel") === "in_nation")
      .join(g.vertices.filter(F.col("vlabel") === "customer")
        .select(F.col("vid").as("src"), F.col("acctbal")), "src")
      .groupBy("dst").agg(F.sum("acctbal"), F.count(F.lit(1)))
      .collect().map(r => (r.getLong(0), (math.round(r.getDouble(1) * 100), r.getLong(2)))).toMap
    val got = grp.collect()
      .map(r => (r.getLong(0), (math.round(r.getDouble(1) * 100), r.getLong(2)))).toMap
    assert(got == manual && got.nonEmpty)
  }

  test("chain-dependent steps after group()/project() fail loudly") {
    val grp = Traversal.V(spark, SF)
      .hasLabel("customer").out("in_nation").as("n_vid")
      .group("n_vid", F.count(F.lit(1)).as("cnt"))
    val proj = Traversal.V(spark, SF)
      .hasLabel("supplier").value("acctbal", "s_bal").as("s_vid")
      .out("in_nation")
      .project("band" -> F.floor(F.col("s_bal") / 1000.0))
    for (t <- Seq(grp, proj)) {
      intercept[IllegalArgumentException](t.out("in_region"))
      intercept[IllegalArgumentException](t.as("x"))
      intercept[IllegalArgumentException](t.value("name", "nm"))
      intercept[IllegalArgumentException](t.select("n_vid"))
      intercept[IllegalArgumentException](t.outE("peer"))
      intercept[IllegalArgumentException](t.group("cnt", F.count(F.lit(1)).as("c2")))
    }
    // frame-shaped continuations stay legal
    assert(grp.order(F.col("cnt").desc).limit(3).df.collect().length <= 3)
    assert(proj.where(F.col("band") >= 0).dedup().df.collect().nonEmpty)
  }
}
