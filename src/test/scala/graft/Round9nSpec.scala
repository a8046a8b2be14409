package graft

import graft.queries.Registry

/** q517/q518 re-verified: the integral-image identity must hold on
  * every image, and the team-draft replayed in pure Scala.
  */
class Round9nSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  private def hashLongRef(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)

  test("q517 inclusion-exclusion equals direct box sums everywhere") {
    val rows = Registry.byName("q517_integral_image").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("ii_eq") == 1L,
        s"img ${r.getAs[Long]("img")}: integral-image identity broken")
      // total must equal the closed-form pixel sum of the class pattern
      val img = r.getAs[Long]("img")
      val v0 = img % 17
      val want = (0 until 256).map(i => (v0 * 37 + i.toLong * i * 13) % 256).sum
      assert(r.getAs[Long]("total") == want)
    }
  }

  test("q518 draft equals the pure-Scala team-draft replay") {
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val ra = ds.sortBy(d => (-d._3, d._2)).take(10).map(_._2).toList
      val rb = ds.sortBy(d => -d._2).take(10).map(_._2).toList
      val coins = (0 to 4).map(j => hashLongRef(s"$src#$j") % 2)
      var picked = List.empty[Long]
      var ta = List.empty[Long]; var tb = List.empty[Long]
      for (_ <- 1 to 10) {
        val aPicks = ta.size < tb.size ||
          (ta.size == tb.size && coins(ta.size) == 0)
        val pA = ra.find(x => !picked.contains(x))
        val pB = rb.find(x => !picked.contains(x))
        val useA = (aPicks && pA.isDefined) ||
          (!aPicks && pB.isEmpty && pA.isDefined)
        val pk = if (useA) pA else pB
        pk.foreach { p =>
          picked = picked :+ p
          if (useA) ta = ta :+ p else tb = tb :+ p
        }
      }
      src -> (picked.mkString(","),
        ta.count(_ % 3 == 0).toLong, tb.count(_ % 3 == 0).toLong)
    }
    val got = Registry.byName("q518_team_draft_interleave").fn(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    // non-vacuity: both teams must win somewhere OR clicks differ
    assert(got.values.map(v => v._2 + v._3).sum > 0, "no clicks anywhere")
  }
}
