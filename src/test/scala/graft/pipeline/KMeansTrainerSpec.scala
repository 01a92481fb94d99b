package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The sample-based k-means|| trainer: deterministic, cluster-recovering,
  * and medoid mode returns genuine sample points. */
class KMeansTrainerSpec extends AnyFunSuite {

  /** 4 well-separated clusters in 8 dims, deterministically jittered;
    * points ordered so a naive "first k rows" seed would see ONLY
    * cluster 0 first — the trainer must still find all four. */
  private def clustered(): Array[(Long, Array[Float])] = {
    val centers = Array(
      Array.fill(8)(0.0f), Array.fill(8)(10.0f),
      Array.tabulate(8)(i => if (i < 4) 10.0f else 0.0f),
      Array.tabulate(8)(i => if (i < 4) 0.0f else 10.0f))
    // cluster-major order: ids 0..49 are cluster 0, 50..99 cluster 1, ...
    (0 until 200).map { i =>
      val c = i / 50
      val v = centers(c).zipWithIndex.map { case (x, p) =>
        x + (((i * 31 + p * 7) % 11) - 5) * 0.05f // deterministic jitter ±0.25
      }
      (i.toLong, v)
    }.toArray
  }

  private def nearestIdx(v: Array[Float], cs: Array[Array[Float]]): Int =
    cs.indices.minBy { j =>
      var s = 0.0; var p = 0
      while (p < v.length) { val d = v(p) - cs(j)(p); s += d * d; p += 1 }
      s
    }

  test("deterministic: identical input trains identical centroids") {
    val pts = clustered()
    val a = KMeansTrainer.kmeansParallel(pts, 4)
    val b = KMeansTrainer.kmeansParallel(pts, 4)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("recovers well-separated clusters a first-k-rows seed cannot see") {
    val pts = clustered()
    val cents = KMeansTrainer.kmeansParallel(pts, 4)
    assert(cents.length == 4 && cents.forall(_.length == 8))
    // each generating cluster maps onto exactly one trained centroid
    val assign = pts.map { case (id, v) => ((id / 50).toInt, nearestIdx(v, cents)) }
    val byCluster = assign.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq)
    assert(byCluster.values.forall(_.size == 1),
      s"a cluster split across centroids: $byCluster")
    assert(assign.map(_._2).distinct.length == 4,
      "two clusters merged into one centroid")
  }

  test("medoid mode returns distinct actual sample points") {
    val pts = clustered()
    val cents = KMeansTrainer.kmeansParallel(pts, 4, medoid = true)
    val asSeqs = cents.map(_.toSeq)
    val pool = pts.map(_._2.toSeq).toSet
    assert(asSeqs.forall(pool.contains), "medoid centroid is not a sample point")
    assert(asSeqs.distinct.length == 4, "medoid centroids must be distinct")
    // medoid anchoring must not break cluster recovery
    val assign = pts.map { case (id, v) => ((id / 50).toInt, nearestIdx(v, cents)) }
    assert(assign.groupBy(_._1).values.forall(_.map(_._2).distinct.length == 1))
  }

  test("spherical mode clusters by direction, ignoring magnitude") {
    // two directions, three magnitudes each: cosine training must yield
    // centroids aligned with the two directions
    val d1 = Array.tabulate(8)(i => if (i < 4) 1.0f else 0.0f)
    val d2 = Array.tabulate(8)(i => if (i < 4) 0.0f else 1.0f)
    val pts = (0 until 60).map { i =>
      val d = if (i % 2 == 0) d1 else d2
      val mag = 1.0f + (i % 3)
      (i.toLong, d.map(_ * mag))
    }.toArray
    val cents = KMeansTrainer.kmeansParallel(pts, 2, cosine = true)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { p => dp += a(p) * b(p); na += a(p) * a(p); nb += b(p) * b(p) }
      dp / math.sqrt(na * nb)
    }
    val dirs = cents.map(c => if (cos(c, d1) > cos(c, d2)) 0 else 1).toSet
    assert(dirs == Set(0, 1), "spherical training must separate the two directions")
    assert(cents.forall(c => math.max(cos(c, d1), cos(c, d2)) > 0.99))
  }
}
