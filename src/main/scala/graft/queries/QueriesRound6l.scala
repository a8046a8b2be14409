package graft.queries

import graft.Tables._
import graft.ops.{Relational, Sampling, Text}
import org.apache.spark.sql.functions._

/** Round-6 twelfth batch: the vocabulary-size coverage curve, time-
  * windowed (recency-scoped) exact dedup, item-item collaborative
  * filtering over the basket machinery, and deterministic negative
  * sampling for training pairs. Integer arithmetic end-to-end.
  */
object QueriesRound6l {

  val defs: Seq[QueryDef] = Seq(

    // ---- q258: vocabulary coverage curve -----------------------------
    // The curve that picks a vocab size: corpus token types ranked by
    // (count desc, token), cumulative token mass at vocab sizes
    // 5/10/20/30 in ppm of all tokens. One corpus shuffle to
    // type counts; only the top `maxSize` types can contribute a curve
    // point (the join condition is rk <= vocab_size <= maxSize), so the
    // candidates come from a distributed top-k (TakeOrderedAndProject:
    // per-partition heaps + a k-row merge, plan-pinned) and the rank/
    // cumsum window runs over that CONSTANT-sized frame — never over
    // the corpus vocabulary, which at web scale is itself huge.
    // Complements q204 (OOV at a FIXED vocab) with the tradeoff curve.
    QueryDef("q258_vocab_coverage",
      (s, d) => {
        import s.implicits._
        val counts = documents(s, d)
          .select(explode(Text.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n"))
        val maxSize = 30
        val top = counts.orderBy(col("n").desc, col("tok")).limit(maxSize)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("tok"))
        val ranked = top
          .withColumn("rk", row_number().over(w))
          .withColumn("cum", sum("n").over(
            w.rowsBetween(Long.MinValue, 0)))
        val sizes = Seq(5, 10, 20, 30).toDF("vocab_size")
        ranked.join(broadcast(sizes), col("rk") <= col("vocab_size"))
          .groupBy("vocab_size")
          .agg(max("rk").as("n_types"), max("cum").as("covered"))
          .crossJoin(broadcast(counts.agg(sum("n").as("total"))))
          .select(col("vocab_size").cast("long").as("vocab_size"),
            col("n_types").cast("long").as("n_types"),
            col("covered"), col("total"),
            expr("(covered * 1000000) div total").as("coverage_ppm"))
          .orderBy("vocab_size")
      },
      Some(s"""WITH c AS (SELECT tok, count(*) AS n FROM (
        |    SELECT unnest(${DuckSql.toks("text")}) AS tok FROM documents) t
        |  GROUP BY 1),
        |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rk,
        |    sum(n) OVER (ORDER BY n DESC, tok
        |      ROWS UNBOUNDED PRECEDING) AS cum FROM c),
        |tot AS (SELECT sum(n) AS total FROM c),
        |sz AS (SELECT unnest([5, 10, 20, 30]) AS vocab_size)
        |SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
        |  CAST(max(rk) AS BIGINT) AS n_types,
        |  CAST(max(cum) AS BIGINT) AS covered,
        |  CAST(any_value(total) AS BIGINT) AS total,
        |  CAST((max(cum) * 1000000) // any_value(total) AS BIGINT)
        |    AS coverage_ppm
        |FROM r JOIN sz ON rk <= vocab_size, tot
        |GROUP BY vocab_size ORDER BY vocab_size""".stripMargin)),

    // ---- q259: time-windowed exact dedup -----------------------------
    // Recrawl suppression with a FRESHNESS horizon: an exact duplicate
    // (same md5 of normalized text) is dropped only if some earlier
    // copy was crawled within the last 7 days — an old copy does NOT
    // suppress a fresh recrawl (the re-crawl policy exact dedup q40
    // cannot express). Crawl days are md5-derived; planted template
    // docs (every 11th) create real dup chains. The window runs per
    // fingerprint over (day, doc_id) — never a global order.
    QueryDef("q259_windowed_dedup",
      (s, d) => {
        val day = Sampling.hashLong(
          concat(col("doc_id").cast("string"), lit("#day"))) % 60
        val fp = md5(Text.normText(when(col("doc_id") % 11 === 0,
          concat(lit("shared template "), (col("doc_id") % 7).cast("string")))
          .otherwise(col("text"))))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp")).orderBy(col("crawl_day"), col("doc_id"))
          .rowsBetween(Long.MinValue, -1)
        documents(s, d)
          .select(col("doc_id"), day.as("crawl_day"), fp.as("fp"))
          .withColumn("prev_day", max("crawl_day").over(w))
          .select(col("doc_id"), col("crawl_day"),
            (col("prev_day").isNotNull &&
              col("prev_day") >= col("crawl_day") - 7).as("suppressed"))
          .orderBy("doc_id")
      },
      Some(s"""WITH f AS (SELECT doc_id,
        |    ${DuckSql.hashLong("doc_id || '#day'")} % 60 AS crawl_day,
        |    md5(${DuckSql.norm(
               "CASE WHEN doc_id % 11 = 0 THEN 'shared template ' || " +
               "CAST(doc_id % 7 AS VARCHAR) ELSE text END")}) AS fp
        |  FROM documents),
        |w AS (SELECT doc_id, crawl_day,
        |    max(crawl_day) OVER (PARTITION BY fp
        |      ORDER BY crawl_day, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_day
        |  FROM f)
        |SELECT doc_id, crawl_day,
        |  prev_day IS NOT NULL AND prev_day >= crawl_day - 7 AS suppressed
        |FROM w ORDER BY doc_id""".stripMargin)),

    // ---- q260: item-item collaborative filtering ---------------------
    // "Customers who bought X also bought Y": co-occurrence counts
    // from the capped basket-pair machinery (q165's blowup guard), a
    // per-item basket degree, and the cosine-squared similarity in
    // integer micro-units — co² · 10⁶ div (deg_a · deg_b) ranks
    // IDENTICALLY to cosine (both sides non-negative) with zero
    // floats. Top 40 pairs with co-support ≥ 3.
    QueryDef("q260_item_item_cf",
      (s, d) => {
        // consumed three times (pair self-join + mega-basket cap +
        // degrees) — persist so the scan+distinct runs once (q206
        // discipline; Bench/Verify sweep persists between queries)
        val bi = lineitem(s, d)
          .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pairs = Relational.basketPairs(bi, "basket", "item")
          .where(col("pair_cnt") >= 3)
        val deg = bi.groupBy(col("item")).agg(count(lit(1)).as("deg"))
        pairs
          .join(deg.withColumnsRenamed(Map("item" -> "pa", "deg" -> "deg_a")), "pa")
          .join(deg.withColumnsRenamed(Map("item" -> "pb", "deg" -> "deg_b")), "pb")
          .select(col("pa"), col("pb"), col("pair_cnt"),
            col("deg_a"), col("deg_b"),
            expr("(pair_cnt * pair_cnt * 1000000) div (deg_a * deg_b)")
              .as("cos2_micro"))
          .orderBy(col("cos2_micro").desc, col("pa"), col("pb"))
          .limit(40)
      },
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS basket,
        |    l_partkey AS item FROM lineitem),
        |pr AS (SELECT a.item AS pa, b.item AS pb, count(*) AS pair_cnt
        |  FROM bi a JOIN bi b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |deg AS (SELECT item, count(*) AS deg FROM bi GROUP BY 1)
        |SELECT pa, pb, CAST(pair_cnt AS BIGINT) AS pair_cnt,
        |  CAST(da.deg AS BIGINT) AS deg_a, CAST(db.deg AS BIGINT) AS deg_b,
        |  CAST((pair_cnt * pair_cnt * 1000000) // (da.deg * db.deg)
        |    AS BIGINT) AS cos2_micro
        |FROM pr JOIN deg da ON pr.pa = da.item
        |JOIN deg db ON pr.pb = db.item
        |ORDER BY cos2_micro DESC, pa, pb LIMIT 40""".stripMargin)),

    // ---- q261: deterministic negative sampling -----------------------
    // Contrastive training pairs need negatives the user did NOT
    // interact with: per customer, 8 md5-derived candidate items
    // (hash(cust#slot) mod the part-key space — a pure function, so
    // any engine or rerun draws the same candidates), anti-joined
    // against the customer's true positives. Per customer: positive
    // count, kept negatives, and their checksum. The positive set
    // shuffles once; candidates are map-side; the part-count scalar is
    // one broadcast row.
    QueryDef("q261_negative_sampling",
      (s, d) => {
        val pos = lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_partkey").as("item"))
          .distinct()
        val nParts = part(s, d).agg(max("p_partkey").as("maxp"))
        val cand = pos.select(col("cust")).distinct()
          .crossJoin(broadcast(nParts))
          .withColumn("slot", explode(sequence(lit(0), lit(7))))
          .select(col("cust"), col("slot"),
            (Sampling.hashLong(concat(col("cust").cast("string"), lit("#ns"),
              col("slot").cast("string"))) % col("maxp") + 1).as("neg_item"))
        val kept = cand.join(pos
            .withColumnsRenamed(Map("item" -> "neg_item")),
          Seq("cust", "neg_item"), "left_anti")
        val posCnt = pos.groupBy("cust").agg(count(lit(1)).as("n_pos"))
        kept.groupBy("cust")
          .agg(count(lit(1)).as("n_neg"), sum("neg_item").as("neg_checksum"))
          .join(posCnt, Seq("cust"))
          .select("cust", "n_pos", "n_neg", "neg_checksum")
          .orderBy("cust")
      },
      Some(s"""WITH pos AS (SELECT DISTINCT o.o_custkey AS cust,
        |    l.l_partkey AS item
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |mx AS (SELECT max(p_partkey) AS maxp FROM part),
        |cand AS (SELECT cust, slot,
        |    ${DuckSql.hashLong("cust || '#ns' || slot")} % maxp + 1
        |      AS neg_item
        |  FROM (SELECT DISTINCT cust FROM pos) c,
        |    (SELECT unnest(generate_series(0, 7)) AS slot) s, mx),
        |kept AS (SELECT cand.cust, neg_item FROM cand
        |  LEFT JOIN pos ON cand.cust = pos.cust AND cand.neg_item = pos.item
        |  WHERE pos.item IS NULL),
        |pc AS (SELECT cust, count(*) AS n_pos FROM pos GROUP BY 1)
        |SELECT k.cust, CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(count(*) AS BIGINT) AS n_neg,
        |  CAST(sum(neg_item) AS BIGINT) AS neg_checksum
        |FROM kept k JOIN pc ON k.cust = pc.cust
        |GROUP BY k.cust, n_pos ORDER BY k.cust""".stripMargin)))
}
