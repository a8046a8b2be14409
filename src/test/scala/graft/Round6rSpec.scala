package graft

import org.apache.spark.sql.functions._

/** Round-6r: exact time-series diagnostics invariants. */
class Round6rSpec extends SparkSpec {

  test("q281 ACF is bounded: |acf_k| <= 1e6 ppm (Cauchy-Schwarz)") {
    val out = graft.queries.Registry.byName("q281_autocorrelation")
      .fn(spark, sf)
    val bad = out.where(
      abs(col("acf1_ppm")) > 1000000 ||
        abs(col("acf2_ppm")) > 1000000 ||
        abs(col("acf3_ppm")) > 1000000).count()
    assert(bad == 0 && out.count() > 0)
  }

  test("q282 CUSUM endpoints vanish: statistic at k=n is exactly zero") {
    // S'_n = n·Σc − n·S = 0 by construction, so the reported max can
    // never be at the last bucket unless the series is flat; and the
    // max is always >= 0
    val out = graft.queries.Registry.byName("q282_change_point")
      .fn(spark, sf)
    assert(out.where(col("max_abs_cusum") < 0).count() == 0)
    assert(out.count() > 0)
  }

  test("q283 churn: untouched docs report zero edits, struck docs nonzero") {
    val out = graft.queries.Registry.byName("q283_crawl_churn").fn(spark, sf)
    // doc_id % 3 != 0 and % 5 != 0 -> prev == text -> unchanged
    assert(out.where(col("doc_id") % 3 =!= 0 && col("doc_id") % 5 =!= 0 &&
      !col("unchanged")).count() == 0)
    // prefix-clipped docs longer than the clip must show churn (the
    // digit-strike branch is a no-op on this digit-free corpus — the
    // %3 rows double as the "rule fired but nothing changed" case)
    assert(out.where(col("doc_id") % 5 === 0 && col("doc_id") % 3 =!= 0 &&
      col("span") > 80 && col("edits") === 0).count() == 0)
    assert(out.where(col("edits") > 0).count() > 0)
    // churn is a ratio in [0, 1e6]
    assert(out.where(col("churn_ppm") < 0 ||
      col("churn_ppm") > 1000000).count() == 0)
  }
}
