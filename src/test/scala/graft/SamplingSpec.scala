package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)

  test("hashSplit is deterministic, exhaustive, and roughly proportional") {
    val a = Sampling.hashSplit(docs, "doc_id", 80, 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val b = Sampling.hashSplit(docs, "doc_id", 80, 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a == b)                                   // pure function of id
    val n = a.values.sum
    assert(a.keySet == Set("train", "val", "test"))  // exhaustive
    assert(a("train").toDouble / n > 0.7 && a("train").toDouble / n < 0.9)
    assert(a("val").toDouble / n < 0.2)
  }

  test("hash sampling is monotone: larger target keeps a superset") {
    val small = Sampling.balancedSample(docs, "lang", "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    val large = Sampling.balancedSample(docs, "lang", "doc_id", 200)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(large))
    // per-stratum yield lands near the target for strata above it
    val perLang = Sampling.balancedSample(docs, "lang", "doc_id", 50)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    perLang.foreach { case (lang, kept) =>
      if (full(lang) >= 200) assert(kept > 20 && kept < 100, s"$lang kept $kept")
      else assert(kept <= full(lang))
    }
  }

  test("weightedMix: rate 1.0 keeps all, rate 0.0 keeps none") {
    val n = docs.count()
    assert(Sampling.weightedMix(docs, "lang", "doc_id",
      Map.empty, 1.0).count() == n)
    assert(Sampling.weightedMix(docs, "lang", "doc_id",
      Map.empty, 0.0).count() == 0)
    val langs = docs.select("lang").distinct().as[String].collect()
    val only = Sampling.weightedMix(docs, "lang", "doc_id",
      Map(langs.head -> 1.0), 0.0)
    assert(only.select("lang").distinct().as[String].collect().toSeq == Seq(langs.head))
  }

  test("packSequences: offsets chain within shards, spans match budget math") {
    val packed = Sampling.packSequences(docs, "doc_id", "n_chars", 1000L, 4)
      .collect()
    assert(packed.length == docs.count())
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      // each offset = previous offset + previous cost (contiguous layout)
      ordered.sliding(2).foreach {
        case Array(p, c) =>
          assert(c.getAs[Long]("offset") ==
            p.getAs[Long]("offset") + p.getAs[Long]("cost"))
        case _ =>
      }
      ordered.foreach { r =>
        val off = r.getAs[Long]("offset"); val cost = r.getAs[Long]("cost")
        assert(r.getAs[Long]("seq_first") == off / 1000)
        assert(r.getAs[Long]("n_seqs") ==
          (off + math.max(cost, 1) - 1) / 1000 - off / 1000 + 1)
      }
    }
  }

  test("applyChangelog: upsert replaces, delete removes, latest wins, inserts land") {
    import graft.ops.Relational
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    val changes = Seq(
      (2L, "delete", 1L, "b", 20.0),    // delete key 2
      (3L, "upsert", 1L, "c1", 31.0),   // first update of key 3
      (3L, "upsert", 2L, "c2", 32.0),   // later update wins
      (4L, "upsert", 1L, "d", 40.0),    // brand-new key
      (5L, "delete", 1L, "x", 0.0)      // delete of absent key: no-op
    ).toDF("id", "op", "seq", "name", "bal")
    val out = Relational.applyChangelog(base, changes, "id", "op", "seq")
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (3L, "c2", 32.0), (4L, "d", 40.0)))
  }

  test("hashLong matches the oracle nibble formula") {
    // cross-check the Spark conv() path against a JVM-side reimplementation
    // of the DuckDB per-nibble sum, on real ids
    val ids = docs.select("doc_id").as[Long].collect().take(50)
    val sparkVals = docs.select(col("doc_id"),
        Sampling.hashLong(col("doc_id")).as("h"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      assert(sparkVals(id) == java.lang.Long.parseLong(hex, 16))
    }
  }
}
