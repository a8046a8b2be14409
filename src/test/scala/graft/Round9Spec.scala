package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Round-9 lanes (q491-q497) re-verified against driver-side
  * brute-force references computed in pure Scala from the collected
  * base tables — no Spark expressions and no DuckDB anywhere in the
  * reference path (the Round8/9PropSpec discipline).
  */
class Round9Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  private def hashLongRef(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)

  private def normToks(text: String): Seq[String] =
    text.toLowerCase.map(c =>
        if (c.isDigit || (c >= 'a' && c <= 'z')) c else ' ')
      .split("\\s+").filter(_.nonEmpty).toSeq

  private lazy val docRows: Seq[(Long, String, String, Long)] =
    Tables.documents(spark, sf)
      .select("doc_id", "lang", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("q491 OPH: pipeline pairs equal the pure-Scala densified replay") {
    val K = 16; val C = 8589934592L
    def shingles(toks: Seq[String]): Set[String] =
      toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val sigs = docRows.flatMap { case (id, _, text, _) =>
      val sh = shingles(normToks(text))
      if (sh.isEmpty) None
      else {
        val bins = Array.fill[Option[Long]](K)(None)
        sh.foreach { s =>
          val h = hashLongRef(s)
          val b = (h % K).toInt
          if (bins(b).forall(_ > h)) bins(b) = Some(h)
        }
        val dens = (0 until K).map { j =>
          (0 until K).iterator.flatMap(t =>
            bins((j + t) % K).map(_ + t.toLong * C)).next()
        }
        Some((id, dens, sh))
      }
    }
    val byBand = sigs.groupBy(s => md5Hex(s._2.take(4).mkString(",")))
      .filter(_._2.size <= 32)
    val want = (for {
      grp <- byBand.values.toSeq
      a <- grp; b <- grp if a._1 < b._1
      m = (0 until K).count(j => a._2(j) == b._2(j))
      inter = (a._3 & b._3).size
    } yield (a._1, b._1, m.toLong, inter.toLong)).toSet
    val got = Registry.byName("q491_oph_minhash").fn(spark, sf)
      .select("id_a", "id_b", "n_match", "n_inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want && want.nonEmpty)
  }

  test("q492 Adamic-Adar: top-20 equals the capped brute-force scan") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val edges = (for {
      (o, g) <- li.groupBy(_._1).toSeq
      a <- g.map(_._2); b <- g.map(_._2) if a != b
    } yield (a, b)).toSet
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val adj = edges.groupBy(_._1).map { case (y, es) =>
      y -> es.map(_._2).toSeq.sorted.take(33)
    }
    val scores = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((y, nbs) <- adj; i <- nbs.indices; j <- (i + 1) until nbs.size) {
      val x = nbs(i); val z = nbs(j)
      if (!edges.contains((x, z))) {
        val w = 1000000000000L /
          graft.ops.FixedPoint.lnMicroLong(deg(y) * 1048576L)
        val (c, s0) = scores.getOrElse((x, z), (0L, 0L))
        scores((x, z)) = (c + 1, s0 + w)
      }
    }
    val want = scores.toSeq
      .map { case ((x, z), (c, s0)) => (x, z, c, s0) }
      .sortBy { case (x, z, _, s0) => (-s0, x, z) }.take(20)
    val got = Registry.byName("q492_adamic_adar").fn(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want && want.nonEmpty)
  }

  test("q493 slice finder: flagged slices equal the brute-force stats") {
    val ng = docRows.size.toLong
    val sg = docRows.map(_._4).sum
    val rows = Tables.documents(spark, sf)
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    def st2(key: ((String, String, Long)) => String, dim: String) =
      rows.groupBy(key).toSeq.map { case (slice, g) =>
        val ns = g.size.toLong; val ss = g.map(_._3).sum
        (dim, slice, ns, ss / ns,
          (ss * ng - sg * ns) * 1000000L / (sg * ns))
      }
    val want = (st2(_._1, "lang") ++ st2(_._2, "source") ++
      st2(r => r._1 + "/" + r._2, "lang_source"))
      .filter(r => r._3 >= 30 && math.abs(r._5) >= 10000).toSet
    val got = Registry.byName("q493_slice_finder").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === want)
  }

  test("q494 bitext: every planted cross-lingual in-ratio pair surfaces") {
    val byId = docRows.map(r => r._1 -> r).toMap
    val planted = docRows.map(_._1).filter(id => id % 5 == 0 && id % 10 == 0)
      .flatMap { a =>
        val b = a + 5
        byId.get(b).map(rb => (byId(a), rb))
      }
    def lenOf(r: (Long, String, String, Long)): Long = {
      val extra =
        if (r._1 % 5 == 0)
          s" ent${r._1 / 10} ref${r._1 / 10} hub0"
        else ""
      normToks(r._3 + extra).size.toLong
    }
    val want = planted.flatMap { case (ra, rb) =>
      val (la, lb) = (lenOf(ra), lenOf(rb))
      if (ra._2 != rb._2 && la * 2 <= lb * 3 && lb * 2 <= la * 3) {
        val (x, y) = if (ra._2 < rb._2) (ra, rb) else (rb, ra)
        Some((x._1, y._1))
      } else None
    }.toSet
    val got = Registry.byName("q494_bitext_mining").fn(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "no planted pair qualified — synthesis broke")
    assert(want.subsetOf(got),
      s"missing planted pairs: ${(want -- got).take(5)}")
    // and nothing pairs WITHIN one language
    val langs = Registry.byName("q494_bitext_mining").fn(spark, sf)
      .select("lang_a", "lang_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(langs.forall(p => p._1 < p._2))
  }

  test("q495 bitemporal: snapshot equals the brute-force two-axis argmax") {
    val os = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        // o_orderdate may be TIMESTAMP_NTZ in this testdata generation;
        // under the UTC session TZ the NTZ->LTZ cast is value-preserving
        unix_micros(col("o_orderdate").cast("timestamp")).as("od"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val day = 86400L * 1000000L
    def tsOf(s: String): Long = {
      val f = java.time.LocalDate.parse(s)
      f.toEpochDay * day
    }
    val (ttx, tv) = (tsOf("1995-06-15"), tsOf("1995-08-01"))
    val versions = os.flatMap { case (k, st, od, c) =>
      Seq((k, st, od, od, c)) ++
        (if (k % 7 == 0) Seq((k, st, od, od + 30 * day, c + 100)) else Nil) ++
        (if (k % 13 == 0) Seq((k, st, od + 60 * day, od + 10 * day, c + 500))
         else Nil)
    }.filter(v => v._4 <= ttx && v._3 <= tv)
    val cur = versions.groupBy(v => (v._1, v._2, v._3)).map { case (_, g) =>
      g.maxBy(_._4) // latest tx within (k, valid_from)
    }.groupBy(v => (v._1, v._2)).map { case (_, g) =>
      g.maxBy(_._3) // latest valid_from within k
    }
    val want = cur.groupBy(_._2).map { case (st, g) =>
      (st, g.size.toLong, g.count(v => v._4 != v._3).toLong,
        g.map(_._5).sum)
    }.toSet
    val got = Registry.byName("q495_bitemporal_snapshot").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want && want.nonEmpty)
  }

  test("q496/q497: streaming PSI equals batch PSI bit-for-bit, both >= 0") {
    val batch = Registry.byName("q496_psi_stability").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    val stream = Registry.byName("q497_streaming_psi").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(batch === stream && batch.size == 10)
    val psi = batch.head.last.asInstanceOf[Long]
    assert(psi >= 0L)
    // brute-force PSI from collected events (pure Scala + FixedPoint
    // scalar evaluators — the one-source-of-truth constants)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0) % 2,
        math.min(math.max(r.getLong(1) / 2000L, 0L), 9L)))
    val ca = Array.tabulate(10)(b =>
      1L + ev.count(e => e._1 == 0 && e._2 == b))
    val cb = Array.tabulate(10)(b =>
      1L + ev.count(e => e._1 == 1 && e._2 == b))
    val (na, nb) = (ca.sum, cb.sum)
    val num = (0 until 10).map { b =>
      val (p, q) = (ca(b) * nb, cb(b) * na)
      val (hi, lo) = (math.max(p, q), math.min(p, q))
      math.abs(p - q) * graft.ops.FixedPoint.lnMicroLong(
        graft.ops.FixedPoint.ratioFp20Long(hi - lo, lo))
    }.sum
    assert(psi === num / (na * nb))
  }

  test("q498 lagged co-movement equals the brute-force shifted scan") {
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val day0 = java.time.LocalDate.parse("2024-01-01").toEpochDay *
      86400L * 1000000L
    def daily(t: String): Array[Long] = {
      val a = Array.fill(30)(0L)
      ev.foreach { case (ts, ty) =>
        val d = ((ts - day0) / (86400L * 1000000L)).toInt
        if (ty == t && d >= 0 && d < 30) a(d) += 1
      }
      a
    }
    val (x, y) = (daily("click"), daily("purchase"))
    val rows = (0 to 7).map { lag =>
      val pairs = (0 to 29 - lag).map(d => (x(d), y(d + lag)))
      val n = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val cov = n * sxy - sx * sy
      (lag.toLong, n, sx, sy, sxy, cov, cov * 1000000L / (n * n))
    }
    val best = rows.maxBy(r => (r._7, -r._1))._1
    val want = rows.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, r._7,
      r._1 == best)).toSet
    val got = Registry.byName("q498_lagged_comovement").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7))).toSet
    assert(got === want)
  }

  test("q499 streaming funnel equals the batch first-touch reference") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.filter(e =>
      Set("signup", "click", "purchase")(e._3)).groupBy(_._1)
    def mn(g: Array[(Long, Long, String)], t: String): Option[Long] = {
      val xs = g.filter(_._3 == t).map(_._2)
      if (xs.isEmpty) None else Some(xs.min)
    }
    var (n1, n2, n3) = (0L, 0L, 0L)
    byUser.values.foreach { g =>
      val (t1, t2, t3) = (mn(g, "signup"), mn(g, "click"), mn(g, "purchase"))
      val s1 = t1.isDefined
      val s2 = s1 && t2.isDefined && t2.get >= t1.get
      val s3 = s2 && t3.isDefined && t3.get >= t2.get
      if (s1) n1 += 1; if (s2) n2 += 1; if (s3) n3 += 1
    }
    val got = Registry.byName("q499_streaming_funnel").fn(spark, sf)
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((n1, n2, n3)))
    assert(got.getLong(3) === n2 * 1000000L / n1)
    assert(got.getLong(4) === n3 * 1000000L / math.max(n2, 1L))
  }

  test("q500 Shapley: axioms hold and values equal the brute-force game") {
    val rows = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def shingles(text: String): Set[String] =
      normToks(text).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val byGrp = rows.groupBy(r => r._1.drop(3).toInt % 5)
      .map { case (g, rs) => g -> rs.flatMap(r => shingles(r._2)).toSet }
    def v(s: Int): Long =
      (0 until 5).filter(i => (s & (1 << i)) != 0)
        .flatMap(byGrp.getOrElse(_, Set.empty)).toSet.size.toLong
    def fact(n: Int): Long = (1 to n).map(_.toLong).product
    val want = (0 until 5).map { i =>
      val sh = (0 until 32).filter(s => (s & (1 << i)) == 0).map { s =>
        fact(Integer.bitCount(s)) * fact(4 - Integer.bitCount(s)) *
          (v(s | (1 << i)) - v(s))
      }.sum
      i.toLong -> sh
    }.toMap
    val got = Registry.byName("q500_source_shapley").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2),
        r.getBoolean(4))).toSeq
    assert(got.map(g => g._1 -> g._2).toMap === want)
    assert(got.forall(_._3), "efficiency axiom column must hold")
    assert(want.values.sum === 120L * v(31), "efficiency (driver side)")
  }

  test("q501 transitivity audit equals the brute-force wedge closure scan") {
    val docs = docRows.map(r => r._1 -> {
      normToks(r._3).sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    }).filter(_._2.nonEmpty).toMap
    def jppm(a: Long, b: Long): Long = {
      val (sa, sb) = (docs(a), docs(b))
      val i = (sa & sb).size.toLong
      i * 1000000L / (sa.size + sb.size - i)
    }
    // OPH banding replay (the q491 reference path)
    val K = 16; val C = 8589934592L
    val sigs = docs.toSeq.map { case (id, sh) =>
      val bins = Array.fill[Option[Long]](K)(None)
      sh.foreach { s =>
        val h = hashLongRef(s); val b = (h % K).toInt
        if (bins(b).forall(_ > h)) bins(b) = Some(h)
      }
      val dens = (0 until 4).map { j =>
        (0 until K).iterator.flatMap(t =>
          bins((j + t) % K).map(_ + t.toLong * C)).next()
      }
      (id, md5Hex(dens.mkString(",")))
    }
    val cand = sigs.groupBy(_._2).values.filter(_.size <= 32).flatMap { g =>
      for (a <- g; b <- g if a._1 < b._1) yield (a._1, b._1)
    }.toSet
    val edges = cand.filter(p => jppm(p._1, p._2) >= 500000)
    val both = edges.toSeq.flatMap(e => Seq(e, (e._2, e._1)))
    val wedges = (for {
      (u, g) <- both.groupBy(_._1).toSeq
      a <- g.map(_._2); b <- g.map(_._2) if a < b
    } yield (a, b)).toSet
    val closed = wedges.count(p => jppm(p._1, p._2) >= 500000).toLong
    val got = Registry.byName("q501_dedup_transitivity").fn(spark, sf)
      .collect().head
    assert(got.getLong(0) === edges.size.toLong)
    assert(got.getLong(1) === wedges.size.toLong)
    assert(got.getLong(2) === closed)
    assert(got.getLong(3) ===
      closed * 1000000L / math.max(wedges.size.toLong, 1L))
  }

  test("q505 RFM quintiles equal the brute-force rank coding") {
    val ref = java.time.LocalDate.parse("2024-01-31").toEpochDay *
      86400L * 1000000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byU = ev.groupBy(_._1).toSeq.map { case (u, g) =>
      val lastTs = g.map(_._2).max
      // whole hours by integer epoch arithmetic — the q505 definition
      (u, (ref - lastTs) / 3600000000L, g.size.toLong, g.map(_._3).sum)
    }
    val n = byU.size.toLong
    def codes(metric: ((Long, Long, Long, Long)) => Long): Map[Long, Long] =
      byU.sortBy(r => (metric(r), r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> (i.toLong * 5 / n + 1) }.toMap
    val (rc, fc, mc) = (codes(_._2), codes(_._3), codes(_._4))
    val want = byU.map(r => (rc(r._1), fc(r._1), mc(r._1)))
      .groupBy(identity).map { case (k, g) =>
        (k._1, k._2, k._3, g.size.toLong) }.toSet
    val got = Registry.byName("q505_rfm_segments").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
  }

  test("q506/q507: split ledger and sync flags equal brute force") {
    val dayUs = 86400L * 1000000L
    val t20 = java.time.LocalDate.parse("2024-01-20").toEpochDay * dayUs
    val t23 = java.time.LocalDate.parse("2024-01-23").toEpochDay * dayUs
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def part(t: Long): String =
      if (t < t20) "train" else if (t >= t23) "test" else "embargo"
    val rows = ev.groupBy(e => part(e._2))
    val trU = rows.getOrElse("train", Array.empty).map(_._1).toSet
    val teU = rows.getOrElse("test", Array.empty).map(_._1).toSet
    val got6 = Registry.byName("q506_temporal_split_audit").fn(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    for (p <- Seq("train", "test", "embargo") if rows.contains(p)) {
      val (nr, nu, ov) = got6(p)
      assert(nr === rows(p).length.toLong, p)
      assert(nu === rows(p).map(_._1).distinct.length.toLong, p)
      assert(ov === (trU & teU).size.toLong, p)
    }
    // q507: flag counts from the synthesis arithmetic
    val toks = docRows.map(r => r._1 -> normToks(r._3).size)
      .filter(_._2 > 0)
    val wantFlags = toks.map { case (id, tk) =>
      val per = if (id % 23 == 0) 400 else if (id % 29 == 0) 4 else 40
      val rm = 1000L * 80 * tk / (tk.toLong * per)
      if (rm < 500) "slow" else if (rm > 5000) "fast" else "ok"
    }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val got7 = Registry.byName("q507_av_sync_audit").fn(spark, sf)
      .groupBy("flag").sum("n_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got7 === wantFlags)
    assert(wantFlags.contains("slow") && wantFlags.contains("fast"),
      "planted outliers must exist at this SF")
  }

  test("q508 greedy cover equals brute force; gains are non-increasing") {
    val rows = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def shingles(text: String): Set[String] =
      normToks(text).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val byGrp = rows.groupBy(r => r._1.drop(3).toInt % 5)
      .map { case (g, rs) => g -> rs.flatMap(r => shingles(r._2)).toSet }
    val schedule = collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
    var cov = Set.empty[String]
    val left = collection.mutable.Set(0, 1, 2, 3, 4)
    for (r <- 1 to 5) {
      val best = left.toSeq.map { g =>
        val next = cov ++ byGrp.getOrElse(g, Set.empty)
        (g, next.size - cov.size, next.size)
      }.minBy { case (g, gain, _) => (-gain, g) }
      left -= best._1
      cov = cov ++ byGrp.getOrElse(best._1, Set.empty)
      schedule += ((r.toLong, best._1.toLong, best._2.toLong,
        best._3.toLong))
    }
    val got = Registry.byName("q508_greedy_source_cover").fn(spark, sf)
      .select("round", "grp_chosen", "gain", "covered_after").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got === schedule.toSeq)
    // submodularity of coverage: greedy gains never increase
    val gains = got.map(_._3)
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a })
  }

  test("q491/q501 lockstep: the duplicated OPH banding stays identical") {
    // q501 re-builds q491's banding (file-local fragment duplication,
    // the lshCtes precedent) — pin the two in lockstep: q501's edge
    // count must equal the count of q491 candidates whose exact
    // Jaccard clears the 0.5 threshold
    val verified = Registry.byName("q491_oph_minhash").fn(spark, sf)
      .where(col("exact_ppm") >= 500000).count()
    val edges = Registry.byName("q501_dedup_transitivity").fn(spark, sf)
      .collect().head.getLong(0)
    assert(edges === verified)
  }

  test("q509 law: quotient-merge CC equals full CC on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(509)
    for (trial <- 1 to 3) {
      val edges = (1 to 150).map(_ =>
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(p => p._1 != p._2)
      val eAll = edges.toDF("id_a", "id_b").localCheckpoint()
      val newNode = (id: Long) => id % 3 == 0
      val eOld = eAll.where(expr("id_a % 3 != 0 AND id_b % 3 != 0"))
      val eNew = eAll.where(expr("id_a % 3 = 0 OR id_b % 3 = 0"))
      val lab1 = graft.ops.Dedup.duplicateGroups(eOld)
      val quotient = eNew
        .join(lab1.select(col("id").as("id_a"),
          col("group_id").as("ra")), Seq("id_a"), "left")
        .join(lab1.select(col("id").as("id_b"),
          col("group_id").as("rb")), Seq("id_b"), "left")
        .select(coalesce(col("ra"), col("id_a")).as("id_a"),
          coalesce(col("rb"), col("id_b")).as("id_b"))
        .where(col("id_a") =!= col("id_b"))
      val lab2 = graft.ops.Dedup.duplicateGroups(quotient)
      val composed = lab1
        .join(lab2.select(col("id").as("group_id"),
          col("group_id").as("g2")), Seq("group_id"), "left")
        .select(col("id"), coalesce(col("g2"), col("group_id"))
          .as("group_id"))
        .unionByName(lab2.join(lab1.select("id"), Seq("id"), "left_anti"))
        .as[(Long, Long)].collect().toMap
      val full = graft.ops.Dedup.duplicateGroups(eAll)
        .as[(Long, Long)].collect().toMap
      assert(composed === full && full.nonEmpty, s"trial $trial")
    }
  }
}
