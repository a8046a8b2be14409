package graft.queries

import graft.Tables._
import graft.ops.{Sampling, Text}
import org.apache.spark.sql.functions._

/** Round-7 twenty-eighth batch: sample-based range-partition
  * boundaries with a balance readout, a measured Bloom-filter
  * false-positive evaluation, and the Zipf octave audit.
  */
object QueriesRound7ab {

  val defs: Seq[QueryDef] = Seq(

    // ---- q392: range-partition boundary estimation + balance ------------
    // The primitive under every total sort / range-bucketed layout
    // (Spark's RangePartitioner, made explicit and measurable): an
    // md5 1/64 sample of lineitem keys, 31 boundaries read off the
    // sample's order statistics — the q182 histogram running-count
    // pass over the O(distinct sampled keys) frame, positions
    // i·S div 32 — collected into ONE array row (31 values, the only
    // "collect"-shaped thing here, boundary-sized not data-sized),
    // then every row assigned partition = #boundaries < key via one
    // scalar crossJoin + array filter, and the per-partition masses
    // reported. The balance of these masses IS the quality of the
    // sample; Round7abSpec bounds max/min.
    QueryDef("q392_range_boundaries",
      (s, d) => {
        val keys = lineitem(s, d)
          .select((col("l_orderkey") * 1000000L + col("l_partkey"))
            .as("k"))
        val sample = keys.where(
          Sampling.hashLong(concat(col("k").cast("string"), lit("#rb")))
            % 64 === 0)
        val tot = sample.agg(count(lit(1)).as("ns"))
        val wCum = org.apache.spark.sql.expressions.Window
          .orderBy("k").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val ranked = sample.groupBy("k").agg(count(lit(1)).as("c"))
          .withColumn("run", sum("c").over(wCum))
        val bounds = broadcast(ranked.crossJoin(tot)
          .select(col("k"), col("run"), col("ns"),
            explode(sequence(lit(1), lit(31))).as("i"))
          .where(col("run") - col("c") < expr("(i * ns) div 32") &&
            expr("(i * ns) div 32") <= col("run"))
          .groupBy(lit(1).as("__g")).agg(sort_array(collect_list("k"))
            .as("bs")))
        keys.crossJoin(bounds)
          .select(size(filter(col("bs"),
            b => b < col("k"))).cast("long").as("p"))
          .groupBy("p").agg(count(lit(1)).as("mass"))
          .select(col("p"), col("mass"))
          .orderBy("p")
      },
      Some {
        val h = DuckSql.hashLong("CAST(k AS VARCHAR) || '#rb'")
        s"""WITH keys AS (SELECT l_orderkey * 1000000 + l_partkey AS k
        |  FROM lineitem),
        |smp AS (SELECT k FROM keys WHERE ($h) % 64 = 0),
        |tot AS (SELECT count(*) AS ns FROM smp),
        |rk AS (SELECT k, c, sum(c) OVER (ORDER BY k
        |    ROWS UNBOUNDED PRECEDING) AS run
        |  FROM (SELECT k, count(*) AS c FROM smp GROUP BY 1)),
        |bd AS (SELECT list_sort(list(k)) AS bs FROM rk, tot,
        |    unnest(generate_series(1, 31)) u(i)
        |  WHERE run - c < (i * ns) // 32 AND (i * ns) // 32 <= run)
        |SELECT CAST(len(list_filter(bs, b -> b < k)) AS BIGINT) AS p,
        |  CAST(count(*) AS BIGINT) AS mass
        |FROM keys, bd GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- q393: Bloom filter with MEASURED false-positive rate -----------
    // The q268/q272 measured-error discipline applied to the Bloom
    // filter the dedup gates lean on (q292/q295): m = 2¹⁶ bits as
    // 2048 32-bit words built by bit_or aggregation (32-bit words so
    // no shift ever reaches the sign bit — DuckDB errors on 1<<63
    // where Java wraps) (the filter is a
    // FRAME, broadcast — never a driver-side bitset), k = 4 md5
    // hashes, probed with keys guaranteed absent (orderkey + 10⁹);
    // a probe is positive iff all 4 bits are set (min over the
    // word-join). Outputs the measured FPR in ppm next to the filter
    // parameters; the spec checks it against the closed form
    // (1 − e^{−kn/m})^k.
    QueryDef("q393_bloom_fpr_eval",
      (s, d) => {
        def hashes(keyCol: String) = explode(array(
          (0 until 4).map(j => Sampling.hashLong(concat(
            col(keyCol).cast("string"), lit(s"#b$j"))) % 65536): _*))
        val ins = orders(s, d).select(col("o_orderkey").as("key"))
        val nIns = broadcast(ins.agg(count(lit(1)).as("n_inserted")))
        val words = broadcast(ins
          .select(hashes("key").as("h"))
          .select(expr("h div 32").as("w"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 32 AS INT))")
              .as("b"))
          .groupBy("w").agg(expr("bit_or(b)").as("wv")))
        val probes = orders(s, d)
          .select((col("o_orderkey") + 1000000000L).as("key"))
        val fp = probes
          .select(col("key"), hashes("key").as("h"))
          .select(col("key"), expr("h div 32").as("w"),
            expr("CAST(h % 32 AS INT)").as("bit"))
          .join(words, Seq("w"), "left")
          .groupBy("key")
          .agg(min(expr("(shiftright(coalesce(wv, 0), bit) & 1)"))
            .as("hit"))
          .agg(count(lit(1)).as("n_probes"),
            sum(col("hit")).as("n_false_pos"))
        fp.crossJoin(nIns)
          .select(col("n_inserted"), lit(65536L).as("m_bits"),
            lit(4L).as("k_hashes"), col("n_probes"), col("n_false_pos"),
            expr("(n_false_pos * 1000000) div n_probes").as("fpr_ppm"))
      },
      Some {
        def h(tbl: String, j: Int) = DuckSql.hashLong(
          s"CAST($tbl.key AS VARCHAR) || '#b$j'")
        val insH = (0 until 4).map(j => s"(${h("ins", j)}) % 65536")
          .mkString(", ")
        val prbH = (0 until 4).map(j => s"(${h("prb", j)}) % 65536")
          .mkString(", ")
        s"""WITH ins AS (SELECT o_orderkey AS key FROM orders),
        |ih AS (SELECT unnest([$insH]) AS h FROM ins),
        |words AS (SELECT h // 32 AS w,
        |    bit_or(CAST(1 AS BIGINT) << CAST(h % 32 AS INTEGER)) AS wv
        |  FROM ih GROUP BY 1),
        |prb AS (SELECT o_orderkey + 1000000000 AS key FROM orders),
        |ph AS (SELECT key, unnest([$prbH]) AS h FROM prb),
        |hits AS (SELECT key,
        |    min((coalesce(wv, 0) >> CAST(h % 32 AS INTEGER)) & 1)
        |      AS hit
        |  FROM ph LEFT JOIN words ON words.w = ph.h // 32 GROUP BY 1),
        |fp AS (SELECT count(*) AS n_probes, sum(hit) AS n_false_pos
        |  FROM hits)
        |SELECT CAST((SELECT count(*) FROM ins) AS BIGINT) AS n_inserted,
        |  CAST(65536 AS BIGINT) AS m_bits, CAST(4 AS BIGINT) AS k_hashes,
        |  CAST(n_probes AS BIGINT) AS n_probes,
        |  CAST(n_false_pos AS BIGINT) AS n_false_pos,
        |  CAST((n_false_pos * 1000000) // n_probes AS BIGINT) AS fpr_ppm
        |FROM fp""".stripMargin
      }),

    // ---- q394: Zipf octave audit ----------------------------------------
    // Vocabulary health at a glance: under Zipf's law with exponent
    // ≈ 1, each frequency OCTAVE (tokens with floor(log2 c) = o)
    // carries roughly constant total mass while type counts halve —
    // the whole fit needs only the O(vocab) count frame, integer
    // bitlength for the octave, no log and no regression. Degenerate
    // vocabularies (boilerplate floods, truncation artifacts) bend
    // the octave-mass profile immediately — this is the cheap
    // pre-training tokenizer-health gate next to q313's Heaps curve.
    QueryDef("q394_zipf_octaves",
      (s, d) => {
        val vocab = documents(s, d)
          .select(explode(Text.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
        val tot = broadcast(vocab.agg(sum("c").as("N")))
        vocab
          .select((length(bin(col("c"))) - 1).cast("long").as("octave"),
            col("c"))
          .groupBy("octave")
          .agg(count(lit(1)).as("n_types"), sum("c").as("mass"))
          .crossJoin(tot)
          .select(col("octave"), col("n_types"), col("mass"),
            expr("(mass * 1000000) div N").as("mass_ppm"))
          .orderBy("octave")
      },
      Some(s"""WITH t AS (SELECT unnest(${DuckSql.toks("text")}) AS tok
        |  FROM documents),
        |v AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
        |n AS (SELECT sum(c) AS N FROM v)
        |SELECT CAST(length(format('{:b}', c)) - 1 AS BIGINT) AS octave,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(c) AS BIGINT) AS mass,
        |  CAST((sum(c) * 1000000) // max(n.N) AS BIGINT) AS mass_ppm
        |FROM v, n GROUP BY 1 ORDER BY 1""".stripMargin)))
}
