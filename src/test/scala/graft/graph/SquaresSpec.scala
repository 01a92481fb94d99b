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
    assert(r.getLong(0) == pairs && r.getLong(1) == cyc2 / 2)
  }
}
