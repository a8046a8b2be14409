package graft

import graft.queries.Registry

/** q537 re-verified against a pure-Scala canonical-Vose replay. */
class Round9abSpec extends SparkSpec {

  test("q537 alias table equals the pure-Scala Vose replay") {
    val cnts = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = cnts.size.toLong
    val t = cnts.map(_._2).sum
    var rem = cnts.map { case (nm, c) => (c * n, nm) }
    val cells = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    while (rem.size > 1) {
      val srt = rem.sortBy(identity)
      val sml = srt.head; val lrg = srt.last
      cells += ((sml._2, lrg._2, sml._1))
      rem = srt.slice(1, srt.size - 1) :+
        ((lrg._1 - (t - sml._1), lrg._2))
    }
    cells += ((rem.head._2, rem.head._2, t))
    val want = cells.map(c => c._1 -> (c._2, c._3)).toMap
    val got = Registry.byName("q537_alias_table").fn(spark, sf).collect()
    assert(got.length == cells.size)
    got.foreach { r =>
      val (alias, thr) = want(r.getString(0))
      assert(r.getString(1) == alias, s"cell ${r.getString(0)} alias")
      assert(r.getLong(2) == thr, s"cell ${r.getString(0)} thr")
      assert(r.getBoolean(4), s"cell ${r.getString(0)} reconstruction broke")
    }
    // independent reconstruction check on the replay itself
    val mass = scala.collection.mutable.Map.empty[String, Long]
    cells.foreach { case (cell, alias, thr) =>
      mass(cell) = mass.getOrElse(cell, 0L) + thr
      if (alias != cell) mass(alias) = mass.getOrElse(alias, 0L) + (t - thr)
      else mass(alias) = mass(alias) // self-alias cell is already full
    }
    cnts.foreach { case (nm, c) =>
      assert(mass(nm) == c * n, s"source $nm mass ${mass(nm)} != ${c * n}")
    }
  }
}
