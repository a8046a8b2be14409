package graft

import org.apache.spark.sql.functions._

/** Round-7p pins: patchify against the pixel formula, BPE inference
  * laws, and the velocity window against a driver replay. */
class Round7pSpec extends SparkSpec {

  test("property: q350 patch stats equal the pixel-formula brute force") {
    val got = graft.queries.Registry.byName("q350_image_patchify")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty)
    val keys = got.keys.map(_._1).toSeq.distinct
    keys.foreach { key =>
      val sums = new Array[Long](16); val sqs = new Array[Long](16)
      for (y <- 0 until 32; x <- 0 until 32) {
        val g = 3L * ((x * 7 + y * 13 + key * 31) % 256)
        val p = (y / 8) * 4 + x / 8
        sums(p) += g; sqs(p) += g * g
      }
      for (p <- 0 until 16)
        assert(got((key, p.toLong)) == ((sums(p), sqs(p), sums(p) / 64)))
    }
  }

  test("q350 helper: invalid bytes are data, not exceptions") {
    assert(graft.ops.Multimodal.patchStats32(Array[Byte](1, 2, 3)).isEmpty)
    assert(graft.ops.Multimodal.patchStats32(
      "BMgarbage".getBytes("US-ASCII")).isEmpty)
    // a real 32x32 BMP yields 16 patches covering all 1024 pixels
    val px = Array.tabulate(1024)(i => i % 256)
    val ps = graft.ops.Multimodal.patchStats32(
      graft.ops.Multimodal.makeBmp(32, 32, px))
    assert(ps.length == 16)
    assert(ps.map(_.psum).sum == px.map(_.toLong * 3).sum)
  }

  test("q351 BPE inference: merges learned on train compress held-out text") {
    val row = graft.queries.Registry.byName("q351_bpe_inference")
      .fn(spark, sf).collect().head
    val (n, before, after, ppm) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(n > 0 && before > 0)
    assert(after <= before, "applying merges can only shrink")
    assert(ppm == (before - after) * 1000000L / before)
  }

  test("property: q352 velocity window equals a driver replay") {
    val ev = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).values.flatMap { xs =>
      xs.map { case (u, id, t, _) =>
        val in = xs.filter(e => e._3 >= t - 3599999999L && e._3 <= t)
        (u, id) -> ((t, in.length.toLong, in.map(_._4).sum))
      }
    }.toMap
    val got = graft.queries.Registry.byName("q352_velocity_window")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty && got == want)
  }
}
