package graft.operators

/** Driver-local seeded k-means (k-means++ init, Lloyd to convergence) over
  * a bounded training sample.
  *
  * Codebook/centroid fitting is the one place in the ANN family where the
  * scale-honest design is NOT a distributed job: production quantizer
  * builds (FAISS's `train`, the standard IVF/PQ recipe from Jégou et al.
  * 2011) fit on a bounded sample of ~10⁴-10⁶ vectors regardless of corpus
  * size, because centroid quality saturates long before the sample does.
  * Running that fit as MLlib jobs priced each Lloyd round as a scheduled
  * distributed job over a few thousand rows — measured at sf0.1, the
  * q_ann_ivfpq build spent ~5 s on job scheduling for microseconds of
  * arithmetic. One collected sample + this local fit is the same model at
  * a fraction of the cost, and the 100 TB story is unchanged: the sample
  * cap bounds driver memory, and everything corpus-sized (assignment,
  * encoding, search) stays distributed.
  *
  * Determinism: seeded `scala.util.Random` drives both the k-means++
  * D²-weighted seeding and empty-cell reseeds; ties in assignment break
  * toward the lower cell id. Same sample + same seed → same centroids,
  * which the determinism audit (dev/determinism_check.py) relies on.
  */
object LocalKMeans {

  private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Index of the nearest center (squared-L2; ties → lower index). */
  def nearest(v: Array[Float], centers: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < centers.length) {
      val d = sqDist(v, centers(j))
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** Fit `k` centers on `points`. k > n is tolerated (extra centers
    * duplicate sampled points and their cells just stay empty) so callers
    * need no special-casing on tiny corpora; empty input is a caller
    * error (query paths guard it with their empty-corpus short-circuit).
    */
  def fit(points: Array[Array[Float]], k: Int, seed: Long,
      maxIter: Int = 30): Array[Array[Float]] = {
    require(points.nonEmpty, "k-means needs a non-empty training sample")
    val rnd = new scala.util.Random(seed)
    val n = points.length
    val dim = points(0).length

    // k-means++ seeding: next center drawn ∝ D²(point, nearest chosen).
    val centers = Array.ofDim[Array[Float]](k)
    centers(0) = points(rnd.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      var mass = 0.0
      while (i < n) {
        val d = sqDist(points(i), centers(c - 1))
        if (d < d2(i)) d2(i) = d
        mass += d2(i)
        i += 1
      }
      var pick = -1
      if (mass > 0) {
        val r = rnd.nextDouble() * mass
        var acc = 0.0
        i = 0
        while (i < n && pick < 0) {
          acc += d2(i)
          if (acc >= r && d2(i) > 0) pick = i
          i += 1
        }
      }
      // zero mass (k exceeds distinct points) → uniform fallback
      if (pick < 0) pick = rnd.nextInt(n)
      centers(c) = points(pick).clone()
      c += 1
    }

    // Lloyd until assignments stabilize (or maxIter).
    val assign = Array.fill(n)(-1)
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      changed = false
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        val best = nearest(points(i), centers)
        if (best != assign(i)) { changed = true; assign(i) = best }
        val s = sums(best)
        var t = 0
        while (t < dim) { s(t) += points(i)(t); t += 1 }
        counts(best) += 1
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          val nc = new Array[Float](dim)
          var t = 0
          while (t < dim) { nc(t) = (sums(j)(t) / counts(j)).toFloat; t += 1 }
          centers(j) = nc
        } else {
          // empty cell: reseed (seeded, so still deterministic) and keep
          // iterating — matches MLlib's drop-tolerant behavior without
          // silently returning fewer than k centers
          centers(j) = points(rnd.nextInt(n)).clone()
          changed = true
        }
        j += 1
      }
      iter += 1
    }
    centers
  }
}
