package graft

import org.apache.spark.sql.functions._

/** Round-7aj pins: McNemar cell accounting + χ² law against a driver
  * replay, and the lineage ledger's chain integrity. */
class Round7ajSpec extends SparkSpec {

  test("property: q411 McNemar equals a driver replay and partitions the corpus") {
    val rows = Tables.documents(spark, sf)
      .select(col("n_chars"),
        size(graft.ops.Text.tokens(col("text"))).cast("long"))
      .collect().map(r => (r.getLong(0) >= 200, r.getLong(1) >= 40))
    val nb = rows.count(p => p._1 && p._2).toLong
    val oc = rows.count(p => p._1 && !p._2).toLong
    val os = rows.count(p => !p._1 && p._2).toLong
    val ne = rows.count(p => !p._1 && !p._2).toLong
    val r = graft.queries.Registry.byName("q411_mcnemar_shadow")
      .fn(spark, sf).collect().head
    assert(r.getLong(0) == rows.length.toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((nb, oc, os, ne)))
    assert(nb + oc + os + ne == rows.length.toLong) // cells partition
    assert(r.getLong(5) == (oc + os) * 1000000L / rows.length)
    if (oc + os > 0) {
      val chi2 = (oc - os) * (oc - os) * 1000000L / (oc + os)
      assert(r.getLong(6) == chi2)
      assert(r.getBoolean(7) ==
        ((oc - os) * (oc - os) * 1000000L > 3841459L * (oc + os)))
    }
  }

  test("law: q412 lineage chain is complete and stage-consistent") {
    val rows = graft.queries.Registry.byName("q412_lineage_ledger")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getString(3))))
    assert(rows.map(_._1).toSeq == Seq("1_raw", "2_gated", "3_agg"))
    // parent pointers: root has none; each stage records its parent's
    // fingerprint verbatim
    assert(rows.head._4.isEmpty)
    assert(rows(1)._4.contains(rows.head._3))
    assert(rows(2)._4.contains(rows(1)._3))
    // row counts follow the pipeline: gate only shrinks; agg groups
    assert(rows(1)._2 <= rows.head._2)
    val nSources = Tables.documents(spark, sf)
      .where(col("n_chars") >= 200).select("source").distinct().count()
    assert(rows(2)._2 == nSources)
    // fingerprints genuinely distinguish the stages
    assert(rows.map(_._3).distinct.length == 3)
  }
}
