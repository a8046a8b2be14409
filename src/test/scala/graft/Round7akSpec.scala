package graft

import org.apache.spark.sql.functions._

/** Round-7ak pin: the group-aware split against a driver replay, the
  * zero-spanning guarantee, and the naive-split contrast being real. */
class Round7akSpec extends SparkSpec {

  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("property: q413 group split replays exactly and never breaks a cluster") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(concat_ws(" ",
          slice(graft.ops.Text.tokens(col("text")), 1, 8))).as("ck"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byC = docs.groupBy(_._2)
    val multi = byC.count(_._2.length > 1).toLong
    val spanNaive = byC.count { case (_, v) =>
      v.map(d => hashLong(d._1.toString) % 100 < 80).distinct.length > 1
    }.toLong
    val nTrain = docs.count(d => hashLong(d._2) % 100 < 80).toLong
    val r = graft.queries.Registry.byName("q413_group_split")
      .fn(spark, sf).collect().head
    assert(r.getLong(0) == docs.length.toLong)
    assert(r.getLong(1) == byC.size.toLong)
    assert(r.getLong(2) == multi)
    assert(r.getLong(3) == 0L, "grouped split broke a cluster")
    assert(r.getLong(4) == spanNaive)
    assert(r.getLong(5) == nTrain)
    assert(r.getLong(6) == nTrain * 1000000L / docs.length)
    // the contrast is real on this corpus: naive hashing does break
    // prefix clusters, which is exactly what the grouped split fixes
    assert(multi > 0 && spanNaive > 0)
  }
}
