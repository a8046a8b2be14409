package graft

import graft.ingest.Normalize
import graft.model.{IngestRecord, Schema, Segment}
import graft.ops.{Dedup, Text}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-style tests (SURVEY §5.3): scalacheck generators drive
  * randomized inputs; each property is evaluated over one batched
  * DataFrame (a Spark job per *property*, not per sample). Generation
  * is seeded, so failures reproduce.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      rng.Seed(seed + i)))

  private val unicodeText: Gen[String] = for {
    words <- Gen.listOfN(8, Gen.oneOf(
      "hello", "WORLD", "xin", "chào", "bạn", "42", "état", "größe",
      "data!", "spark?", "x.y", "", "  ", "a,b;c", "日本語", "emoji🙂"))
  } yield words.mkString(" ")

  private val segmentGen: Gen[Segment] = for {
    start <- Gen.chooseNum(0.0, 100.0)
    dur <- Gen.chooseNum(0.01, 10.0)
    text <- unicodeText
  } yield Segment(math.floor(start * 1000) / 1000, math.floor(dur * 1000) / 1000, text)

  private val recordGen: Gen[IngestRecord] = for {
    id <- Gen.identifier.map(_.take(16))
    st <- Gen.oneOf(Schema.SourceYoutubeTranscript, Schema.SourceYoutubeStt,
      Schema.SourceSystemAudio)
    text <- Gen.option(unicodeText)
    segs <- Gen.option(Gen.listOfN(3, segmentGen).map(_.toSeq))
    bp <- Gen.option(Gen.identifier.map(p => s"out/audio/$p.wav"))
    metaKeys <- Gen.listOfN(3, Gen.identifier.map(_.take(8)))
    metaVals <- Gen.listOfN(3, unicodeText)
  } yield IngestRecord(id, st, text, segs, bp, metaKeys.zip(metaVals).toMap)

  test("property: IngestRecord survives parquet and JSONL round-trips") {
    val recs = samples(recordGen, 200).zipWithIndex
      .map { case (r, i) => r.copy(id = s"${r.id}_$i") } // unique ids
    val ds = recs.toDS()
    val pq = java.nio.file.Files.createTempDirectory("prop-pq").toString
    ds.write.mode("overwrite").parquet(pq)
    val backPq = spark.read.parquet(pq).as[IngestRecord].collect()
    assert(backPq.sortBy(_.id).toSeq == recs.sortBy(_.id))
    val js = java.nio.file.Files.createTempDirectory("prop-js").toString
    ds.write.mode("overwrite").json(js)
    val backJs = spark.read.schema(Schema.ingest).json(js).as[IngestRecord].collect()
    // JSON cannot distinguish None from Some(empty map/array is kept);
    // normalize the one lossy case: meta None vs empty never generated
    assert(backJs.sortBy(_.id).toSeq == recs.sortBy(_.id))
  }

  test("property: sentences preserve normalized content and drop no words") {
    val texts = samples(unicodeText, 300).filter(_.nonEmpty)
    val df = texts.toDF("t")
    val out = df.select(col("t"),
      concat_ws(" ", Normalize.sentences(col("t"))).as("joined"))
      .select(Text.normText(col("t")), Text.normText(col("joined")))
      .as[(String, String)].collect()
    out.foreach { case (orig, joined) => assert(orig == joined) }
  }

  test("property: videoId is identity on well-formed ids, null-safe on noise") {
    val idGen = Gen.listOfN(11, Gen.oneOf(
      ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq('_', '-'))).map(_.mkString)
    val ids = samples(idGen, 200)
    val out = ids.toDF("url")
      .select(Normalize.videoId(col("url"))).as[String].collect()
    assert(out.toSeq == ids)
    val urls = ids.map(i => s"https://www.youtube.com/watch?v=$i")
    val out2 = urls.toDF("url")
      .select(Normalize.videoId(col("url"))).as[String].collect()
    assert(out2.toSeq == ids)
  }

  test("property: shingle count equals max(0, tokens - n + 1)") {
    val texts = samples(unicodeText, 300)
    val df = texts.toDF("t")
    for (n <- Seq(2, 3, 5)) {
      val rows = df.select(
        size(Text.tokens(col("t"))).as("nt"),
        size(Dedup.wordShingles(Text.tokens(col("t")), n)).as("ns"))
        .as[(Int, Int)].collect()
      rows.foreach { case (nt, ns) =>
        assert(ns == math.max(0, nt - n + 1), s"n=$n tokens=$nt shingles=$ns")
      }
    }
  }

  test("property: hash split partitions every id into exactly one bucket") {
    val ids = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 400).distinct
    val df = ids.toDF("id")
    for ((tr, va) <- Seq((80, 10), (50, 25), (0, 0), (100, 0))) {
      val out = graft.ops.Sampling.hashSplit(df, "id", tr, va)
        .groupBy("split").count().as[(String, Long)].collect().toMap
      assert(out.values.sum == ids.length, s"($tr,$va) loses rows")
      if (tr == 0 && va == 0) assert(out.keySet == Set("test"))
      if (tr == 100) assert(out.keySet == Set("train"))
    }
  }

  test("property: weightedMix keep-rate is monotone in the configured rate") {
    val ids = samples(Gen.chooseNum(0L, Long.MaxValue), 400).distinct
    val df = ids.map(i => (i, "s" + (i % 3))).toDF("id", "src")
    val counts = Seq(0.0, 0.25, 0.5, 0.75, 1.0).map { r =>
      graft.ops.Sampling.weightedMix(df, "src", "id", Map.empty, r).count()
    }
    assert(counts == counts.sorted, counts.toString)
    assert(counts.head == 0L && counts.last == ids.length)
  }

  test("property: packSequences conserves cost mass per shard") {
    val rows = samples(Gen.zip(Gen.chooseNum(0L, 100000L),
      Gen.chooseNum(1L, 5000L)), 300).distinctBy(_._1)
    val df = rows.toDF("id", "cost")
    val out = graft.ops.Sampling.packSequences(df, "id", "cost", 4096L, 4)
      .groupBy("shard")
      .agg(max(col("offset") + col("cost")).as("hi"), sum("cost").as("mass"))
      .as[(Long, Long, Long)].collect()
    // contiguous layout: the highest end-offset equals the shard's mass
    out.foreach { case (shard, hi, mass) => assert(hi == mass, s"shard $shard") }
  }

  test("property: scd2History intervals are disjoint, chained, and cover every upsert") {
    val changeGen = for {
      key <- Gen.chooseNum(1L, 20L)
      op <- Gen.oneOf("upsert", "delete")
      v <- Gen.identifier.map(_.take(6))
    } yield (key, op, v)
    val raw = samples(changeGen, 300).zipWithIndex
      .map { case ((k, op, v), i) => (k, op, i.toLong, v) } // unique seq = arrival order
    val h = graft.ops.Relational
      .scd2History(raw.toDF("k", "op", "seq", "v"), "k", "op", "seq")
      .select(col("k"), col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, Long, Option[Long], Boolean)].collect()
    // one row per upsert, none lost
    assert(h.length == raw.count(_._2 == "upsert"))
    h.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      // intervals are ordered and non-overlapping: each closes at or
      // before the next opens; only the last may be open
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.isDefined && a._3.get <= b._2, s"key $k overlap")
        case _ =>
      }
      assert(sorted.init.forall(!_._4) , s"key $k: non-final current flag")
      sorted.lastOption.foreach(last => assert(last._4 == last._3.isEmpty))
    }
  }

  test("property: weightedTopK supersets are monotone in k and weight-deterministic") {
    val rows = samples(Gen.zip(Gen.chooseNum(1L, 100000L),
      Gen.chooseNum(1L, 9999L)), 400).distinctBy(_._1)
    val df = rows.toDF("id", "w")
    def pick(k: Int): Seq[Long] =
      graft.ops.Sampling.weightedTopK(df, "id", "w", k)
        .select("id").as[Long].collect().toSeq
    val s10 = pick(10); val s25 = pick(25)
    assert(s10.toSet.subsetOf(s25.toSet)) // monotone supersets
    assert(pick(25) == s25)               // rerun-identical
  }

  test("property: histogram bucketing is total and order-preserving") {
    val vals = samples(Gen.chooseNum(-50.0, 150.0), 500)
    val df = vals.zipWithIndex.map(_.swap).toDF("i", "v")
    val h = graft.ops.Relational.histogram(df, "v", 0.0, 100.0, 10)
      .as[(Long, Long, Double, Double)].collect()
    assert(h.map(_._2).sum == vals.length)          // total mass
    h.foreach { case (b, _, lo, hi) =>
      assert(b >= 0 && b <= 9 && lo <= hi)
      // interior buckets contain only in-range values
      if (b > 0 && b < 9) assert(lo >= b * 10.0 - 1e-9 && hi < (b + 1) * 10.0 + 1e-9)
    }
  }

  test("property: streaming EWMA state is a convex combination (stays in [min,max])") {
    import graft.streaming.{EwmaState, ValEvent}
    // fold the update rule directly (the streaming op wraps exactly
    // this recurrence; bit-parity with batch is pinned in StreamingSpec)
    val series = samples(Gen.listOfN(50, Gen.chooseNum(-1000.0, 1000.0)), 40)
      .filter(_.nonEmpty)
    series.foreach { vs =>
      val folded = vs.tail.foldLeft(EwmaState(1L, vs.head)) { (st, x) =>
        EwmaState(st.n + 1, 0.3 * x + 0.7 * st.ewma)
      }
      assert(folded.n == vs.length)
      assert(folded.ewma >= vs.min - 1e-9 && folded.ewma <= vs.max + 1e-9,
        s"EWMA ${folded.ewma} escaped [${vs.min}, ${vs.max}]")
    }
    // and the Spark-side fold (q129 formulation) agrees on one series
    val vs = series.head
    val viaSpark = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("key", "seq", "v")
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("seq"), col("v")))).as("s"))
      .select(aggregate(
        expr("slice(transform(s, e -> e.v), 2, size(s) - 1)"),
        element_at(expr("transform(s, e -> e.v)"), 1),
        (acc, x) => lit(0.3) * x + lit(0.7) * acc).as("e"))
      .as[Double].head()
    val viaFold = vs.tail.foldLeft(vs.head)((a, x) => 0.3 * x + 0.7 * a)
    assert(viaSpark == viaFold)
  }

  test("property: equi-depth bucket assignment is total and monotone") {
    val vals = samples(Gen.chooseNum(0.0, 10000.0), 500).map(v =>
      math.rint(v * 100) / 100)  // 2-dp like the money columns
    val sorted = vals.sorted
    val bounds = (1 to 9).map(i => sorted((vals.length - 1) * i / 10))
    def bucket(x: Double) = bounds.count(x > _)
    val bs = vals.map(bucket)
    assert(bs.forall(b => b >= 0 && b <= 9))               // total
    vals.sorted.map(bucket).sliding(2).foreach {            // monotone
      case Seq(a, b) => assert(a <= b)
      case _ =>
    }
  }

  test("property: allocateBudget quotas are exact-apportionment bounded") {
    // random positive weights: Σ quota == budget and every quota is
    // floor(budget*w/W) or floor+1 (the largest-remainder guarantee)
    val ws = samples(Gen.listOfN(40, Gen.chooseNum(1L, 5000L)), 5)
    ws.zipWithIndex.foreach { case (weights, i) =>
      val budget = 10000L + i * 977L
      val df = weights.zipWithIndex.map { case (w, j) => (s"d$j", w) }
        .toDF("dom", "weight")
      val out = graft.ops.Sampling.allocateBudget(df, Seq("dom"), "weight", budget)
        .as[(String, Long, Long)].collect()
      val tot = weights.sum
      assert(out.map(_._3).sum == budget, s"run $i: sum != budget")
      out.foreach { case (_, w, q) =>
        val fl = budget * w / tot
        assert(q == fl || q == fl + 1, s"run $i: quota $q outside [$fl, ${fl + 1}]")
      }
    }
  }

  test("property: fillQuota admits a prefix — bounded overshoot, never empty") {
    val costs = samples(Gen.listOfN(60, Gen.chooseNum(1L, 500L)), 3)
    costs.zipWithIndex.foreach { case (cs, i) =>
      val rows = cs.zipWithIndex.map { case (c, j) => (s"d${j % 4}", j.toLong, c) }
      val df = rows.toDF("dom", "id", "cost")
      val quotas = (0 until 4).map(k => (s"d$k", 300L + 100L * k)).toDF("dom", "quota")
      val sel = graft.ops.Sampling.fillQuota(df, Seq("dom"), "id", "cost", quotas)
        .as[(String, Long, Long)].collect()
      val byDom = sel.groupBy(_._1)
      (0 until 4).foreach { k =>
        val dom = s"d$k"; val quota = 300L + 100L * k
        val domRows = rows.filter(_._1 == dom)
        if (domRows.nonEmpty) {
          val got = byDom.get(dom).map(_.toSeq).getOrElse(Seq.empty)
          assert(got.nonEmpty, s"run $i: funded domain $dom came back empty")
          val total = got.map(_._3).sum
          val maxCost = domRows.map(_._3).max
          assert(total < quota + maxCost,
            s"run $i: $dom total $total >= quota $quota + max $maxCost")
          // admitted set is a subset of the domain's rows
          assert(got.map(_._2).toSet.subsetOf(domRows.map(_._2).toSet))
        }
      }
    }
  }

  test("property: segmentDedup accounting is total; no-op cap drops nothing") {
    val docs = samples(unicodeText, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t + " tail" + (i % 3)) }
    val df = docs.toDF("doc_id", "text")
    // cap above the doc count: nothing can be dropped
    val lax = graft.ops.Dedup.segmentDedup(df, "doc_id", "text",
        segTokens = 3, maxDocs = docs.length + 1)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(lax.length == docs.length)
    lax.foreach { case (_, segs, kept, dropped, _) =>
      assert(dropped == 0L && kept == segs)
    }
    // tight cap: accounting still total, never negative
    val tight = graft.ops.Dedup.segmentDedup(df, "doc_id", "text",
        segTokens = 3, maxDocs = 1)
      .as[(Long, Long, Long, Long, String)].collect()
    tight.foreach { case (_, segs, kept, dropped, _) =>
      assert(kept + dropped == segs && kept >= 0 && dropped >= 0)
    }
  }

  test("property: domainPercentileGate keeps at least the top (100-pct)%") {
    val scores = samples(Gen.listOfN(80, Gen.chooseNum(0L, 50L)), 3)
    scores.zipWithIndex.foreach { case (ss, i) =>
      val rows = ss.zipWithIndex.map { case (s, j) => (s"d${j % 3}", j.toLong, s) }
      val df = rows.toDF("dom", "id", "score")
      val pct = 25 * (i + 1) // 25, 50, 75
      val kept = graft.ops.Text.domainPercentileGate(df, "dom", "score", pct)
        .as[(String, Long, Long, Long)].collect()
      rows.groupBy(_._1).foreach { case (dom, domRows) =>
        val total = domRows.length
        val r = (total * pct + 99) / 100 // ceil — the threshold's rank
        val got = kept.count(_._1 == dom)
        // scores strictly below the threshold number at most r-1
        assert(got >= total - (r - 1).max(0),
          s"run $i: $dom kept $got < ${total - (r - 1).max(0)} of $total at pct $pct")
      }
    }
  }

  test("property: duplicateGroupsStar fast path and loop match reference CC") {
    // 12 random graphs in disjoint id spaces, batched into ONE edge
    // frame so each engine path runs once (not per sample). The
    // reference is an in-test union-find over the same edges.
    val edgeGen = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es
    val all = samples(edgeGen, 12).zipWithIndex.flatMap { case (es, g) =>
      es.map { case (a, b) => (g * 1000L + a, g * 1000L + b) }
    }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    all.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val want = (all.flatMap(e => Seq(e._1, e._2)).distinct)
      .map(id => id -> find(id)).toMap
    val pairs = all.toDF("id_a", "id_b")
    val viaFast = Dedup.duplicateGroupsStar(pairs)
      .as[(Long, Long)].collect().toMap
    val viaLoop = Dedup.duplicateGroupsStar(pairs, smallGraph = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaFast == want)
    assert(viaLoop == want)
  }

  test("property: kCore matches reference bounded peeling on random graphs") {
    val edgeGen = for {
      n <- Gen.chooseNum(2, 30)
      m <- Gen.chooseNum(1, 50)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es
    val all = samples(edgeGen, 10, seed = 7L).zipWithIndex.flatMap {
      case (es, g) => es.map { case (a, b) => (g * 1000L + a, g * 1000L + b) }
    }
    val (k, rounds) = (2, 3)
    // reference: same bounded peeling, sequential
    val sym = all.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    var alive = sym.map(_._1).toSet
    for (_ <- 1 to rounds) {
      val deg = sym.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.size }
      alive = alive.filter(n => deg.getOrElse(n, 0) >= k)
    }
    val finalDeg = sym.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val want = alive.map(n => n -> finalDeg.getOrElse(n, 0L)).toMap
    val got = graft.ops.Graph.kCore(all.toDF("id_a", "id_b"),
        "id_a", "id_b", k = k, rounds = rounds)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("property: uncapped sharedShinglePairs matches brute-force reference") {
    // lowercase-alpha words from a tiny vocab force genuine shared
    // windows; with such text Text.tokens is exactly split-on-space,
    // so the reference tokenization agrees with the engine's
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta")
    val docGen = Gen.chooseNum(6, 24)
      .flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab)))
      .map(_.mkString(" "))
    val docs = samples(docGen, 30, seed = 11L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val n = 4
    val windows: Map[Long, Set[Seq[String]]] = docs.map { case (id, t) =>
      id -> t.split(" ").toSeq.sliding(n).filter(_.size == n).map(_.toSeq).toSet
    }.toMap
    val want = (for {
      (a, wa) <- windows; (b, wb) <- windows if a < b
      shared = (wa & wb).size if shared > 0
    } yield (a, b) -> shared.toLong).toMap
    val got = Dedup.sharedShinglePairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = n, maxDocsPerShingle = 0)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(got == want)
  }

  test("property: windowNovelty matches the brute-force first-owner scan") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = Gen.chooseNum(1, 14)
      .flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab)))
      .map(_.mkString(" "))
    val docs = samples(docGen, 40, seed = 23L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val n = 3
    val windows: Map[Long, Set[Seq[String]]] = docs.map { case (id, t) =>
      id -> t.split(" ").toSeq.sliding(n).filter(_.size == n).map(_.toSeq).toSet
    }.toMap
    val owner: Map[Seq[String], Long] = windows.toSeq
      .flatMap { case (id, ws) => ws.map(_ -> id) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).min }
    val want = docs.map { case (id, _) =>
      val ws = windows(id)
      val novel = ws.count(owner(_) == id).toLong
      (id, ws.size.toLong, novel,
        if (ws.isEmpty) None else Some(novel * 1000000L / ws.size))
    }.toSet
    val got = Dedup.windowNovelty(docs.toDF("doc_id", "text"),
        "doc_id", "text", n)
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(got == want)
  }

  test("property: prefixDupPairs equals the brute-force proper-prefix scan") {
    val vocab = Vector("u", "v", "w")  // tiny vocab: prefix collisions abound
    val docGen = Gen.chooseNum(2, 10)
      .flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab)))
    val docs = samples(docGen, 50, seed = 31L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val minPrefix = 3
    val want = (for {
      (a, ta) <- docs; (b, tb) <- docs
      if a != b && ta.size >= minPrefix && ta.size < tb.size &&
        tb.take(ta.size) == ta
    } yield (a, b, ta.size.toLong, tb.size.toLong)).toSet
    val got = Dedup.prefixDupPairs(docs.toDF("doc_id", "toks"),
        "doc_id", "toks", minPrefix = minPrefix)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("property: mergeAdjacentPair equals the sequential greedy BPE pass") {
    val vocab = Vector("a", "b", "c")
    val caseGen = for {
      toks <- Gen.chooseNum(0, 12).flatMap(Gen.listOfN(_, Gen.oneOf(vocab)))
      x <- Gen.oneOf(vocab); y <- Gen.oneOf(vocab) if x != y
    } yield (toks, x, y)
    val cases = samples(caseGen, 120, seed = 57L).zipWithIndex
      .map { case ((t, x, y), i) => (i.toLong, t, x, y) }
    def ref(t: Seq[String], x: String, y: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < t.size) {
        if (i + 1 < t.size && t(i) == x && t(i + 1) == y) {
          out += s"${x}_$y"; i += 2
        } else { out += t(i); i += 1 }
      }
      out.toSeq
    }
    val got = cases.toDF("id", "toks", "x", "y")
      .select(col("id"), Text.mergeAdjacentPair(col("toks"),
        col("x"), col("y"), "_").as("m"))
      .as[(Long, Seq[String])].collect().toMap
    cases.foreach { case (id, t, x, y) =>
      assert(got(id) == ref(t, x, y), s"case $id: $t merge ($x,$y)")
    }
  }

  test("property: aucPpm equals the brute-force pair count") {
    val rowGen = for {
      score <- Gen.chooseNum(0L, 6L)   // narrow range: ties guaranteed
      pos <- Gen.oneOf(true, false)
    } yield (score, pos)
    val rows = samples(rowGen, 300, seed = 71L)
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val r = graft.ops.Eval.aucPpm(rows.toDF("score", "is_pos"),
      "score", "is_pos").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((pos.size.toLong, neg.size.toLong, u2,
        u2 * 1000000L / (2L * pos.size * neg.size))))
  }

  test("property: binPack bins are exclusive-cumsum consistent and total") {
    val sizeGen = Gen.chooseNum(1L, 150L)
    val sizes = samples(sizeGen, 120, seed = 23L).zipWithIndex
      .map { case (sz, i) => (i.toLong, "grp" + (i % 3), sz) }
    val target = 100L
    val out = graft.ops.Layout.binPack(
        sizes.toDF("item", "grp", "sz"),
        orderCols = Seq("item"), sizeCol = "sz", target = target,
        partitionBy = Seq("grp"))
      .select("grp", "item", "sz", "bin")
      .as[(String, Long, Long, Long)].collect()
    // every item assigned exactly once
    assert(out.length == sizes.length)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      // bin == floor(exclusive running sum / target), bins non-decreasing
      var cum = 0L
      ordered.foreach { case (_, _, sz, bin) =>
        assert(bin == cum / target)
        cum += sz
      }
      assert(ordered.map(_._4).sliding(2).forall(w =>
        w.length < 2 || w(0) <= w(1)))
    }
  }

  test("property: identical docs are always LSH candidates (no false negatives at J=1)") {
    // identical token streams produce identical MinHash signatures, so
    // every band collides — exact duplicates can never be missed, for
    // any (k, bands) split
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum")
    val docGen = Gen.chooseNum(5, 15)
      .flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab)))
      .map(_.mkString(" "))
    val base = samples(docGen, 12, seed = 31L)
    // each doc i gets a twin at id i+100 with the same text
    val docs = base.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, t), (i + 100L, t))
    }
    val cand = Dedup.lshCandidatePairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, k = 8, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    base.indices.foreach { i =>
      assert(cand.contains((i.toLong, i + 100L)),
        s"twin pair ($i, ${i + 100}) missing from LSH candidates")
    }
  }

  test("property: SegmentMerge preserves word mass and time span") {
    val segs = samples(segmentGen, 100).zipWithIndex
      .map { case (s, i) => ("k" + (i % 5), s) }
    val merged = spark.createDataset(segs).repartition(4)
      .groupByKey(_._1).mapValues(_._2)
      .agg(graft.ops.SegmentMerge.merged(gapSec = 1.0))
      .collect().toMap
    segs.groupBy(_._1).foreach { case (k, ss) =>
      val out = merged(k)
      // utterance count within bounds; span covered; ordering correct
      assert(out.nonEmpty && out.length <= ss.length)
      assert(out.map(_.start) == out.map(_.start).sorted)
      val inMin = ss.map(_._2.start).min
      val inMax = ss.map(s => s._2.start + s._2.duration).max
      assert(out.head.start == inMin)
      assert(math.abs((out.last.start + out.last.duration) - inMax) < 1e-9)
    }
  }

  test("property: paretoFrontier equals the brute-force skyline") {
    // correlated, anti-correlated, and tie/duplicate-heavy point sets;
    // tiny bucket widths force the grid-prune path to actually drop
    // rows before the exact windows
    val ptGen = for {
      x <- Gen.chooseNum(0L, 400L)
      mode <- Gen.chooseNum(0, 2)
      y <- mode match {
        case 0 => Gen.chooseNum(0L, 400L)           // independent
        case 1 => Gen.const(400L - x)               // anti-correlated (big frontier)
        case _ => Gen.oneOf(x, x / 2, 100L)         // ties / duplicates
      }
    } yield (x, y)
    for ((seed, bucket) <- Seq((7L, 16L), (8L, 1L), (9L, 1000L))) {
      val pts = samples(ptGen, 300, seed).zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
      def dominated(p: (Long, Long, Long)) = pts.exists { q =>
        (q._2 > p._2 && q._3 >= p._3) || (q._2 >= p._2 && q._3 > p._3)
      }
      val expect = pts.filterNot(dominated).map(_._1).sorted
      val got = graft.ops.Relational.paretoFrontier(
          pts.toDF("id", "x", "y"), "x", "y", Seq("id"), bucket = bucket)
        .select("id").as[Long].collect().sorted
      assert(got.toSeq == expect,
        s"seed=$seed bucket=$bucket: got ${got.length}, want ${expect.length}")
    }
  }
}
