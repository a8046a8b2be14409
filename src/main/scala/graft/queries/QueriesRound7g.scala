package graft.queries

import graft.Tables._
import graft.ops.{Relational, Sampling, Text}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 seventh batch: order-3 sequential patterns (the PrefixSpan
  * readout one level past q296's adjacent pairs), the Heaps-law vocab
  * growth curve (the corpus-stats view behind tokenizer sizing), and
  * CUPED variance-reduced experiment readouts (the A/B analysis every
  * data-quality experiment ends at).
  */
object QueriesRound7g {

  val defs: Seq[QueryDef] = Seq(

    // ---- q312: frequent order-3 event sequences ------------------------
    // Sequential patterns beyond adjacent pairs: per-user traces in
    // (ts, event_id) total order (the q302 symbol machinery), every
    // overlapping 3-gram, support = distinct users containing it,
    // occurrences = total appearances. Top-20 by support rides
    // TakeOrderedAndProject; the trace stays bounded per user (one
    // doc-keyed shuffle, map work after).
    QueryDef("q312_event_3grams",
      (s, d) => {
        val traces = events(s, d)
          .select(col("user_id"),
            struct(col("ts"), col("event_id"),
              substring(col("event_type"), 1, 1).as("sym")).as("__e"))
          .groupBy("user_id")
          .agg(concat_ws("", transform(array_sort(collect_list(col("__e"))),
            e => e("sym"))).as("__trace"))
        val g2 = traces
          .select(col("user_id"),
            explode(when(length(col("__trace")) >= 3,
                sequence(lit(1), length(col("__trace")) - 2))
              .otherwise(array().cast("array<int>"))).as("__i"),
            col("__trace"))
          .select(col("user_id"),
            col("__trace").substr(col("__i"), lit(3)).as("gram"))
        Relational.topK(
          g2.groupBy("gram")
            .agg(countDistinct(col("user_id")).as("support_users"),
              count(lit(1)).as("occurrences")),
          Seq(col("support_users").desc, col("gram").asc), 20)
      },
      Some("""WITH o AS (SELECT user_id, ts, event_id,
        |    substr(event_type, 1, 1) AS sym FROM events),
        |tr AS (SELECT user_id,
        |    string_agg(sym, '' ORDER BY ts, event_id) AS trace
        |  FROM o GROUP BY 1),
        |g AS (SELECT user_id, substr(trace, i, 3) AS gram
        |  FROM tr, unnest(generate_series(1, greatest(len(trace) - 2, 0)))
        |    AS t(i)
        |  WHERE len(trace) >= 3)
        |SELECT gram, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS support_users,
        |  CAST(count(*) AS BIGINT) AS occurrences
        |FROM g GROUP BY 1
        |ORDER BY support_users DESC, gram LIMIT 20""".stripMargin)),

    // ---- q313: Heaps-law vocabulary growth curve -----------------------
    // Vocabulary size as the corpus grows (V ≈ K·Nᵝ) — the curve
    // behind "how big must the tokenizer vocab be at 100× the data".
    // Ten prefix checkpoints by doc id; vocab at a checkpoint counts
    // tokens whose FIRST document falls inside the prefix (one min-agg
    // over the token space — never a per-checkpoint rescan), total
    // token mass via per-doc counts joined to the 10-row checkpoint
    // frame. All frames O(vocab) or O(docs); windows none.
    QueryDef("q313_heaps_law",
      (s, d) => {
        val docs = documents(s, d)
        val n = docs.agg(max(col("doc_id")).as("__max"))
        val cps = broadcast(n.select(
          explode(sequence(lit(1), lit(10))).as("k"), col("__max"))
          .select(col("k"),
            expr("((__max + 1) * k) div 10").as("__cut")))
        val toks = docs.select(col("doc_id"),
          explode(Text.tokens(col("text"))).as("__t"))
        val firstDoc = toks.groupBy("__t")
          .agg(min(col("doc_id")).as("__first"))
        val vocab = firstDoc.crossJoin(cps)
          .where(col("__first") < col("__cut"))
          .groupBy("k").agg(count(lit(1)).as("vocab"))
        val mass = toks.groupBy("doc_id").agg(count(lit(1)).as("__m"))
          .crossJoin(cps)
          .where(col("doc_id") < col("__cut"))
          .groupBy("k").agg(sum("__m").as("tokens_total"),
            countDistinct(col("doc_id")).as("n_docs"))
        mass.join(vocab, Seq("k"))
          .select(col("k"), col("n_docs"), col("tokens_total"),
            col("vocab"))
          .orderBy("k")
      },
      Some(s"""WITH t AS (SELECT doc_id,
        |    unnest(${DuckSql.toks("text")}) AS tok FROM documents),
        |cp AS (SELECT k, ((SELECT max(doc_id) + 1 FROM documents) * k)
        |      // 10 AS cut
        |  FROM unnest(generate_series(1, 10)) AS s(k)),
        |fd AS (SELECT tok, min(doc_id) AS firstd FROM t GROUP BY 1),
        |v AS (SELECT k, count(*) AS vocab FROM fd, cp
        |  WHERE firstd < cut GROUP BY 1),
        |dm AS (SELECT doc_id, count(*) AS m FROM t GROUP BY 1),
        |ms AS (SELECT k, sum(m) AS tokens_total,
        |    count(DISTINCT doc_id) AS n_docs
        |  FROM dm, cp WHERE doc_id < cut GROUP BY 1)
        |SELECT ms.k, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(tokens_total AS BIGINT) AS tokens_total,
        |  CAST(vocab AS BIGINT) AS vocab
        |FROM ms JOIN v ON v.k = ms.k ORDER BY ms.k""".stripMargin)),

    // ---- q314: CUPED variance-reduced A/B readout ----------------------
    // The experimentation closer: users hash-split into two arms, the
    // post-period purchase total is the metric, the PRE-period total
    // the covariate; CUPED subtracts θ·(x − x̄) with θ = Cov(x,y)/
    // Var(x) pooled. θ and x̄ are floored ONCE to micro units
    // (pinned), every other step is exact-integer: cents sums, dollar
    // covariate, per-user adjustment, per-arm means. Shape: one
    // per-user aggregation, one 5-scalar pooled frame broadcast back,
    // one 2-group readout — no window over data rows anywhere.
    QueryDef("q314_cuped_ab",
      (s, d) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp")
        val perUser = events(s, d)
          .where(col("event_type") === "purchase")
          .select(col("user_id"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("__c"),
            (col("ts") < cut).as("__pre"))
          .groupBy("user_id")
          .agg((sum(when(col("__pre"), col("__c")).otherwise(0L)) / 100)
            .cast("long").as("x"),
            sum(when(!col("__pre"), col("__c")).otherwise(0L)).as("y"))
          .withColumn("arm", Sampling.hashLong(
            concat(col("user_id").cast("string"), lit("#arm"))) % 2)
        val pooled = broadcast(perUser.agg(
          count(lit(1)).as("__n"), sum("x").as("__sx"),
          sum("y").as("__sy"), sum(col("x") * col("x")).as("__sxx"),
          sum(col("x") * col("y")).as("__sxy")))
        // every division with a possibly-NEGATIVE numerator is the
        // pinned signed floor division (x − pmod(x, m)) div m — the
        // q242 discipline; Spark's div truncates toward zero and would
        // split from the oracle on negative covariances/adjustments
        def fdiv(a: String, m: String) = s"(($a) - pmod(($a), ($m))) div ($m)"
        val thetaNum = "((__n * __sxy - __sx * __sy) * 1000000)"
        val thetaDen = "(__n * __sxx - __sx * __sx)"
        val adjTerm = "(__theta_micro * (x * 1000000 - __xbar_micro))"
        perUser.crossJoin(pooled)
          .withColumn("__theta_micro", expr(fdiv(thetaNum, thetaDen)))
          .withColumn("__xbar_micro", expr("(__sx * 1000000) div __n"))
          .withColumn("__adj_micro",
            expr(s"y * 1000000 - ${fdiv(adjTerm, "1000000")}"))
          .groupBy("arm")
          .agg(count(lit(1)).as("n_users"),
            expr("(sum(y) * 1000000) div count(1)").as("raw_mean_micro"),
            expr(fdiv("sum(__adj_micro)", "count(1)")).as("adj_mean_micro"))
          .orderBy("arm")
      },
      Some {
        val arm = DuckSql.hashLong("CAST(user_id AS VARCHAR) || '#arm'")
        s"""WITH pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      ELSE 0 END) // 100 AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS y,
        |    $arm % 2 AS arm
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |p AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(x * y) AS sxy FROM pu),
        |th AS (SELECT n, sx,
        |    (((n * sxy - sx * sy) * 1000000)
        |      - (((((n * sxy - sx * sy) * 1000000) % (n * sxx - sx * sx))
        |          + (n * sxx - sx * sx)) % (n * sxx - sx * sx)))
        |      // (n * sxx - sx * sx) AS theta_micro,
        |    (sx * 1000000) // n AS xbar_micro FROM p),
        |adj AS (SELECT pu.arm, pu.y,
        |    pu.y * 1000000
        |      - ((th.theta_micro * (pu.x * 1000000 - th.xbar_micro)
        |          - ((((th.theta_micro * (pu.x * 1000000 - th.xbar_micro))
        |              % 1000000) + 1000000) % 1000000)) // 1000000) AS a
        |  FROM pu, th)
        |SELECT CAST(arm AS BIGINT) AS arm,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS raw_mean_micro,
        |  CAST((sum(a) - (((sum(a) % count(*)) + count(*)) % count(*)))
        |    // count(*) AS BIGINT) AS adj_mean_micro
        |FROM adj GROUP BY 1 ORDER BY 1""".stripMargin
      }))
}
