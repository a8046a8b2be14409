package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Round-9 seventeenth batch: multi-rater agreement (Fleiss' kappa)
  * and embedding-space drift (centroid cosine between snapshots).
  */
object QueriesRound9q {

  val defs: Seq[QueryDef] = Seq(

    // ---- q521: Fleiss' kappa ---------------------------------------------------
    // q228 (Cohen) covers TWO raters; annotation pipelines run three
    // or more, and the multi-rater chance correction is a different
    // statistic: κ = (P̄o − P̄e)/(1 − P̄e) with P̄o from Σ n_ij² and
    // P̄e from squared category marginals. Three deterministic
    // length-family raters with deliberately offset thresholds give a
    // real mid-range kappa. ONE corpus scan builds the n_ij grid;
    // everything after is O(categories). Kept exact by clearing
    // denominators: with r = 3, κ = (3n·S − 9n² − 2Σc²) /
    // (18n² − 2Σc²) in ppm — BIGINT-safe through sf0.1 and beyond
    // (|num| ≤ 1.5·den ≤ 27n²; overflows only past n ≈ 10⁸ docs,
    // where the ppm readout lifts to DECIMAL(38) like q455).
    QueryDef("q521_fleiss_kappa",
      (s, d) => {
        val toks = graft.ops.Text.tokens(col("text"))
        val rated = documents(s, d).select(
          when(col("n_chars") < 216, 0).when(col("n_chars") < 380, 1)
            .otherwise(2).as("r1"),
          when(size(toks) < 36, 0).when(size(toks) < 63, 1)
            .otherwise(2).as("r2"),
          when(length(col("text")) < 230, 0)
            .when(length(col("text")) < 360, 1).otherwise(2).as("r3"))
        // n_ij per item from the three category columns; S = Σ n_ij²
        val withS = rated.select((0 to 2).map(j =>
          ((col("r1") === j).cast("long") + (col("r2") === j).cast("long") +
            (col("r3") === j).cast("long")).as(s"n$j")): _*)
        val agg = withS.agg(
          count(lit(1)).as("n"),
          sum(expr("n0 * n0 + n1 * n1 + n2 * n2")).as("s"),
          sum("n0").as("c0"), sum("n1").as("c1"), sum("n2").as("c2"))
        agg.select(col("n"), col("s"),
          expr("c0 * c0 + c1 * c1 + c2 * c2").as("sum_c2"),
          expr("(s - 3 * n) * 1000000 div (6 * n)").as("po_ppm"),
          expr("(c0 * c0 + c1 * c1 + c2 * c2) * 1000000 div (9 * n * n)")
            .as("pe_ppm"),
          // kappa's numerator (3nS − 9n² − 2Σc²) goes NEGATIVE whenever
          // agreement falls below chance; Spark `div` truncates toward
          // zero where DuckDB `//` floors, so the sign rides outside
          // (the q522 discipline). po/pe numerators are provably ≥ 0
          // (S ≥ 3n since each row's n_ij sum to 3) and stay bare divs.
          expr("CAST(signum(3 * n * s - 9 * n * n" +
            " - 2 * (c0*c0 + c1*c1 + c2*c2)) AS BIGINT)" +
            " * (abs(3 * n * s - 9 * n * n - 2 * (c0*c0 + c1*c1 + c2*c2))" +
            " * 1000000 div (18 * n * n - 2 * (c0*c0 + c1*c1 + c2*c2)))")
            .as("kappa_ppm"))
      },
      Some(s"""WITH rated AS (SELECT
        |    CASE WHEN n_chars < 216 THEN 0 WHEN n_chars < 380 THEN 1
        |      ELSE 2 END AS r1,
        |    CASE WHEN len(${DuckSql.toks("text")}) < 36 THEN 0
        |      WHEN len(${DuckSql.toks("text")}) < 63 THEN 1
        |      ELSE 2 END AS r2,
        |    CASE WHEN length(text) < 230 THEN 0
        |      WHEN length(text) < 360 THEN 1 ELSE 2 END AS r3
        |  FROM documents),
        |grid AS (SELECT
        |    CAST((r1 = 0) AS BIGINT) + CAST((r2 = 0) AS BIGINT)
        |      + CAST((r3 = 0) AS BIGINT) AS n0,
        |    CAST((r1 = 1) AS BIGINT) + CAST((r2 = 1) AS BIGINT)
        |      + CAST((r3 = 1) AS BIGINT) AS n1,
        |    CAST((r1 = 2) AS BIGINT) + CAST((r2 = 2) AS BIGINT)
        |      + CAST((r3 = 2) AS BIGINT) AS n2
        |  FROM rated),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(n0*n0 + n1*n1 + n2*n2) AS BIGINT) AS s,
        |    CAST(sum(n0) AS BIGINT) AS c0, CAST(sum(n1) AS BIGINT) AS c1,
        |    CAST(sum(n2) AS BIGINT) AS c2
        |  FROM grid)
        |SELECT n, s, c0*c0 + c1*c1 + c2*c2 AS sum_c2,
        |  (s - 3 * n) * 1000000 // (6 * n) AS po_ppm,
        |  (c0*c0 + c1*c1 + c2*c2) * 1000000 // (9 * n * n) AS pe_ppm,
        |  CAST(sign(3 * n * s - 9 * n * n - 2 * (c0*c0 + c1*c1 + c2*c2))
        |      AS BIGINT)
        |    * (abs(3 * n * s - 9 * n * n - 2 * (c0*c0 + c1*c1 + c2*c2))
        |      * 1000000
        |      // (18 * n * n - 2 * (c0*c0 + c1*c1 + c2*c2))) AS kappa_ppm
        |FROM a""".stripMargin)),

    // ---- q522: embedding centroid drift between snapshots ----------------------
    // The drift family (PSI q496, KS q455, KL q428) covers SCALARS;
    // embedding spaces drift too, and the retraining trigger is the
    // per-label centroid rotation between snapshots. Components are
    // quantized once to 1/32 units (round(x·32) — exact integers both
    // engines), per-(label, dim, half) INTEGER sums make the
    // centroid exact and order-free (the labelCentroids decimal
    // discipline, integer form), and the cosine between the two sum
    // vectors needs no normalization by n (scale cancels). All
    // magnitudes stay under 2^53 so even the isqrt doubles are exact;
    // floor-milli cosine is the deterministic readout.
    QueryDef("q522_centroid_drift",
      (s, d) => {
        val sums = embeddings(s, d)
          .select(col("label"), (col("vec_id") % 2).as("half"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("label", "half", "dim")
          .agg(sum(expr("CAST(round(CAST(x AS DOUBLE) * 32) AS BIGINT)"))
            .as("sv"))
        val ab = sums.groupBy("label", "dim").agg(
          sum(when(col("half") === 0, col("sv")).otherwise(0L)).as("a"),
          sum(when(col("half") === 1, col("sv")).otherwise(0L)).as("b"))
        ab.groupBy("label").agg(
          sum(expr("a * b")).as("dot"),
          sum(expr("a * a")).as("na2"),
          sum(expr("b * b")).as("nb2"))
          .select(col("label").cast("long").as("label"), col("dot"),
            col("na2"), col("nb2"),
            // signum × positive-div: Spark `div` truncates toward zero
            // where DuckDB `//` floors — they agree only on
            // non-negative numerators, so the sign rides outside
            expr("CAST(signum(dot) AS BIGINT) * (abs(dot) * 1000 div" +
              " greatest(1L," +
              " CAST(floor(sqrt(CAST(na2 AS DOUBLE))) AS BIGINT)" +
              " * CAST(floor(sqrt(CAST(nb2 AS DOUBLE))) AS BIGINT)))")
              .as("cos_milli"))
          .orderBy("label")
      },
      Some("""WITH ex AS (SELECT label, vec_id % 2 AS half,
        |    generate_subscripts(embedding, 1) AS dim,
        |    unnest(embedding) AS x
        |  FROM embeddings),
        |sums AS (SELECT label, half, dim,
        |    CAST(sum(CAST(round(CAST(x AS DOUBLE) * 32) AS BIGINT))
        |      AS BIGINT) AS sv
        |  FROM ex GROUP BY 1, 2, 3),
        |ab AS (SELECT label, dim,
        |    CAST(sum(CASE WHEN half = 0 THEN sv ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN half = 1 THEN sv ELSE 0 END) AS BIGINT) AS b
        |  FROM sums GROUP BY 1, 2),
        |g AS (SELECT label, CAST(sum(a * b) AS BIGINT) AS dot,
        |    CAST(sum(a * a) AS BIGINT) AS na2,
        |    CAST(sum(b * b) AS BIGINT) AS nb2
        |  FROM ab GROUP BY 1)
        |SELECT CAST(label AS BIGINT) AS label, dot, na2, nb2,
        |  CAST(sign(dot) AS BIGINT) * (abs(dot) * 1000 // greatest(1,
        |    CAST(floor(sqrt(CAST(na2 AS DOUBLE))) AS BIGINT)
        |    * CAST(floor(sqrt(CAST(nb2 AS DOUBLE))) AS BIGINT))) AS cos_milli
        |FROM g ORDER BY label""".stripMargin))
  )
}
