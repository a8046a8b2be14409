package graft

/** Round-10 oracle-INDEPENDENCE properties: the new statistical lanes
  * re-verified against randomized driver-side brute force — pure Scala
  * recursions and pair loops sharing nothing with the Spark pipelines
  * or the DuckDB mirrors (the Round8/9PropSpec discipline).
  */
class Round10PropSpec extends SparkSpec {

  // ---- q543 shape: CUSUM prefix-sum identity ---------------------------

  test("q543 shape: the window identity equals the textbook recursion") {
    val rnd = new scala.util.Random(1043)
    for (_ <- 1 to 20) {
      val d = Seq.fill(rnd.nextInt(60) + 3)(rnd.nextInt(2001).toLong - 1000)
      // textbook: S_t = max(0, S_{t-1} + d_t)
      val sRec = d.scanLeft(0L)((s, x) => math.max(0L, s + x)).tail
      // the lane's identity: S_t = P_t − min(0, min_{j≤t} P_j)
      val p = d.scanLeft(0L)(_ + _).tail
      val sId = p.zipWithIndex.map { case (pt, t) =>
        pt - math.min(0L, p.take(t + 1).min)
      }
      assert(sRec == sId, s"identity diverged on $d")
    }
  }

  // ---- q545: Krippendorff's alpha vs the coincidence-matrix form ------

  test("q545 shape: closed form equals the coincidence-matrix definition") {
    val rnd = new scala.util.Random(1045)
    for (_ <- 1 to 20) {
      val items = Seq.fill(rnd.nextInt(200) + 20)(
        (rnd.nextInt(3), rnd.nextInt(3), rnd.nextInt(3)))
      val nN = items.size.toLong
      // closed form used by the lane: 1 − (9N−S)(n−1)/(2(n²−C))
      val s = items.map { case (a, b, c) =>
        (0 to 2).map(j => Seq(a, b, c).count(_ == j).toLong)
          .map(x => x * x).sum
      }.sum
      val cs = (0 to 2).map(j =>
        items.map { case (a, b, c) => Seq(a, b, c).count(_ == j).toLong }.sum)
      val n = 3 * nN
      val cc = cs.map(x => x * x).sum
      val alphaClosed =
        1.0 - (9 * nN - s).toDouble * (n - 1) / (2.0 * (n * n - cc))
      // definition: alpha = 1 − Do/De from the coincidence matrix
      // o_ck = Σ_u n_uc·n_uk/(m_u−1), De from marginals n_c·n_k/(n−1)
      var doSum = 0.0
      items.foreach { case (a, b, c) =>
        val nu = (0 to 2).map(j => Seq(a, b, c).count(_ == j).toDouble)
        for (cI <- 0 to 2; k <- 0 to 2 if cI != k)
          doSum += nu(cI) * nu(k) / 2.0
      }
      val dO = doSum / n
      var deSum = 0.0
      for (cI <- 0 to 2; k <- 0 to 2 if cI != k)
        deSum += cs(cI).toDouble * cs(k)
      val dE = deSum / (n.toDouble * (n - 1))
      val alphaDef = 1.0 - dO / dE
      assert(math.abs(alphaClosed - alphaDef) < 1e-9,
        s"alpha forms diverged: $alphaClosed vs $alphaDef")
    }
  }

  // ---- q547: Mann–Kendall S and tie correction -------------------------

  test("q547 shape: aggregate S and tie term equal the pair loop") {
    val rnd = new scala.util.Random(1047)
    for (_ <- 1 to 20) {
      val x = Seq.fill(rnd.nextInt(80) + 5)(rnd.nextInt(12).toLong)
      var sPair = 0L
      for (i <- x.indices; j <- x.indices if i < j)
        sPair += java.lang.Long.signum(x(j) - x(i))
      // the lane's aggregates
      val n = x.size.toLong
      val ties = x.groupBy(identity).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val varNum = n * (n - 1) * (2 * n + 5) - ties
      // brute-force variance term over tie groups recomputed directly
      val tieBrute = x.distinct.map(v => x.count(_ == v).toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      assert(varNum == n * (n - 1) * (2 * n + 5) - tieBrute)
      // sanity: S bounded by the number of untied pairs
      val untied = (for (i <- x.indices; j <- x.indices if i < j)
        yield if (x(i) == x(j)) 0 else 1).sum
      assert(math.abs(sPair) <= untied)
    }
  }

  // ---- q553: Cliff's delta via frequency tables vs the pair loop ------

  test("q553 shape: frequency-table delta equals the doc×doc pair loop") {
    val rnd = new scala.util.Random(1053)
    for (_ <- 1 to 20) {
      val xs = Seq.fill(rnd.nextInt(150) + 10)(rnd.nextInt(40).toLong)
      val ys = Seq.fill(rnd.nextInt(150) + 10)(rnd.nextInt(40).toLong)
      var num = 0L
      for (x <- xs; y <- ys) num += java.lang.Long.signum(x - y)
      val den = xs.size.toLong * ys.size
      // the lane's form: freq(x) × freq(y) cross
      val fx = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val fy = ys.groupBy(identity).view.mapValues(_.size.toLong)
      var numF = 0L; var denF = 0L
      for ((v, cx) <- fx; (w, cy) <- fy) {
        numF += cx * cy * java.lang.Long.signum(v - w)
        denF += cx * cy
      }
      assert(num == numF && den == denF)
      // the signed floor-ppm readout both engines pin
      val ppm = java.lang.Long.signum(numF) *
        (math.abs(numF) * 1000000L / denF)
      assert(math.abs(ppm) <= 1000000L)
    }
  }

  // ---- q548: packing waste identities ----------------------------------

  test("q548 shape: split count and tail waste match a direct simulation") {
    val rnd = new scala.util.Random(1048)
    for (_ <- 1 to 20) {
      val costs = Seq.fill(rnd.nextInt(100) + 5)(rnd.nextInt(900).toLong + 1)
      val budget = Seq(128L, 256L, 512L)(rnd.nextInt(3))
      // the lane's prefix-sum form
      val offs = costs.scanLeft(0L)(_ + _).dropRight(1)
      val nSplit = offs.zip(costs)
        .count { case (o, c) => o / budget != (o + c - 1) / budget }
      val tail = (budget - costs.sum % budget) % budget
      // direct simulation: walk the concat-and-chunk layout
      var pos = 0L; var splits = 0
      costs.foreach { c =>
        if (pos / budget != (pos + c - 1) / budget) splits += 1
        pos += c
      }
      val tailSim = if (pos % budget == 0) 0L else budget - pos % budget
      assert(nSplit == splits && tail == tailSim)
    }
  }
}
