package graft.graph

import graft.SparkSpec

/** g_squares must equal a brute-force 4-cycle census of the same graph. */
class SquaresSpec extends SparkSpec {

  test("g_squares equals the brute-force rectangle count") {
    val und = PropertyGraph(spark, SF).undirected.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // diagonals: for u < w, c = |N(u) ∩ N(w)|; squares = Σ C(c,2) / 2
    val nodes = adj.keys.toIndexedSeq.sorted
    var pairs = 0L
    var cyc2 = 0L // Σ C(c, 2), i.e. 2 × squares
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      c = (adj(nodes(i)) intersect adj(nodes(j))).size.toLong
      if c >= 2
    } { pairs += 1; cyc2 += c * (c - 1) / 2 }
    val r = GraphQueries.gSquares(spark, SF).collect().head
    assert(cyc2 % 2 == 0, "each square owns exactly two diagonals")
    assert(pairs >= 0) // diagnostic retained by the brute force only
    assert(r.getLong(0) == cyc2 / 2)

    // per-node attribution: squares(v) = Σ_w C(codeg(v,w), 2); the sum
    // over all vertices must equal 4 × total squares (4 vertices each),
    // and the emitted top list must match the brute-force per-node counts
    val perNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      c = (adj(nodes(i)) intersect adj(nodes(j))).size.toLong
      if c >= 2
    } {
      val sq = c * (c - 1) / 2
      perNode(nodes(i)) += sq; perNode(nodes(j)) += sq
    }
    assert(perNode.values.sum == 4 * (cyc2 / 2))
    val gotNodes = GraphQueries.gSquareNodes(spark, SF).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val expTop = perNode.toSeq.sortBy { case (v, n) => (-n, v) }.take(20)
    assert(gotNodes.toSeq == expTop)
  }
}
