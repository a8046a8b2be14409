package graft.queries

import graft.Tables._
import graft.ops.Text
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-8 sixteenth batch: Spearman rank agreement between quality
  * signals (q483) and a centroid-silhouette clustering quality
  * readout over the embedding labels (q484).
  */
object QueriesRound8p {

  val defs: Seq[QueryDef] = Seq(

    // ---- q483: Spearman agreement between quality signals ----------------
    // Do two curation signals rank documents the SAME way? Spearman ρ
    // between n_chars and per-doc distinct-token count, entirely in
    // exact integers: average ranks carried DOUBLED (2·avg-rank =
    // 2·cum_before + cnt + 1 is always integral), Pearson-on-ranks
    // power sums in DECIMAL(38,0), and since ρ's denominator needs a
    // square root, the readout is the exact numerator sign plus
    // ρ²·10⁶ = num²·10⁶ div (dx·dy) — monotone in |ρ|, sqrt-free.
    // Ranks come from windows over the O(distinct values) frames
    // (the q332 histogram discipline), never a corpus sort.
    QueryDef("q483_spearman_signals",
      (s, d) => {
        val docs = documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("x"),
            size(array_distinct(Text.tokens(col("text"))))
              .cast("long").as("y"))
        def rank2(valCol: String): org.apache.spark.sql.DataFrame = {
          val w = Window.orderBy(valCol)
            .rowsBetween(Window.unboundedPreceding, -1)
          docs.groupBy(valCol).agg(count(lit(1)).as("__c"))
            .withColumn("__cb", coalesce(sum("__c").over(w), lit(0L)))
            .select(col(valCol),
              (col("__cb") * 2 + col("__c") + 1).as(s"r_$valCol"))
        }
        val ranked = docs
          .join(rank2("x"), "x").join(rank2("y"), "y")
        ranked.agg(count(lit(1)).as("n"),
            sum("r_x").as("__sx"), sum("r_y").as("__sy"),
            sum(expr("CAST(r_x AS DECIMAL(38,0)) * r_y")).as("__sxy"),
            sum(expr("CAST(r_x AS DECIMAL(38,0)) * r_x")).as("__sx2"),
            sum(expr("CAST(r_y AS DECIMAL(38,0)) * r_y")).as("__sy2"))
          .select(col("n"),
            expr("CAST(n AS DECIMAL(38,0)) * __sxy - " +
              "CAST(__sx AS DECIMAL(38,0)) * __sy").as("num"),
            expr("CAST(n AS DECIMAL(38,0)) * __sx2 - " +
              "CAST(__sx AS DECIMAL(38,0)) * __sx").as("dx"),
            expr("CAST(n AS DECIMAL(38,0)) * __sy2 - " +
              "CAST(__sy AS DECIMAL(38,0)) * __sy").as("dy"))
          .select(col("n"),
            when(col("num") > 0, 1L).when(col("num") < 0, -1L)
              .otherwise(0L).as("rho_sign"),
            expr("CAST((num * num * 1000000) div (dx * dy) AS BIGINT)")
              .as("rho2_ppm"))
      },
      Some {
        val toks = DuckSql.toks("text")
        s"""WITH dd AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
        |    CAST(len(list_distinct($toks)) AS BIGINT) AS y
        |  FROM documents),
        |rx AS (SELECT x, 2 * coalesce(sum(c) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + c + 1 AS r_x
        |  FROM (SELECT x, count(*) AS c FROM dd GROUP BY 1)),
        |ry AS (SELECT y, 2 * coalesce(sum(c) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + c + 1 AS r_y
        |  FROM (SELECT y, count(*) AS c FROM dd GROUP BY 1)),
        |j AS (SELECT dd.doc_id, rx.r_x, ry.r_y FROM dd
        |  JOIN rx ON dd.x = rx.x JOIN ry ON dd.y = ry.y),
        |a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(r_x) AS HUGEINT) AS sx,
        |    CAST(sum(r_y) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(r_x AS HUGEINT) * r_y) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(r_x AS HUGEINT) * r_x) AS HUGEINT) AS sx2,
        |    CAST(sum(CAST(r_y AS HUGEINT) * r_y) AS HUGEINT) AS sy2
        |  FROM j),
        |f AS (SELECT n, n * sxy - sx * sy AS num,
        |    n * sx2 - sx * sx AS dx, n * sy2 - sy * sy AS dy FROM a)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1
        |    ELSE 0 END AS BIGINT) AS rho_sign,
        |  CAST((num * num * 1000000) // (dx * dy) AS BIGINT) AS rho2_ppm
        |FROM f""".stripMargin
      }),

    // ---- q484: centroid silhouette (clustering quality) -------------------
    // How separable are the embedding labels? The silhouette readout
    // in its centroid approximation, squared-distance variant (no
    // sqrt ever runs): a = squared distance to the OWN label
    // centroid, b = min over other labels — both as exact integer
    // cross-products quantized once to micro units of the mean
    // (Σ_d(n_l·v_d − S_l_d)²·10⁶ div n_l²), s = (b−a)·10⁶ div
    // max(a,b). Per label: mean s and how many vectors sit closer to
    // a foreign centroid (s < 0 — the mislabel candidates, the
    // embedding-space twin of q201's label QA). One corpus scan for
    // the centroids, vectors × labels rows for the scoring — labels
    // are O(10), never vector×vector.
    QueryDef("q484_centroid_silhouette",
      (s, d) => {
        val qv = transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long"))
        val emb = embeddings(s, d)
          .select(col("vec_id"), col("label"), qv.as("v"))
        val cents = emb.groupBy(col("label").as("c_label"))
          .agg(count(lit(1)).as("n_l"),
            array((0 until 64).map(i =>
              sum(element_at(col("v"), i + 1))): _*).as("sv"))
        val scored = emb.crossJoin(broadcast(cents))
          .withColumn("__num", aggregate(
            zip_with(col("v"), col("sv"),
              (x, sx) => (col("n_l") * x - sx) * (col("n_l") * x - sx)),
            lit(0L), (acc, x) => acc + x))
          // split division (FixedPoint discipline): num*1000 overflows
          // BIGINT at corpus scale; milli units keep every later product
          // in range
          .withColumn("d2_milli",
            expr("(__num div (n_l * n_l)) * 1000 + " +
              "((__num % (n_l * n_l)) * 1000) div (n_l * n_l)"))
        val a = scored.where(col("label") === col("c_label"))
          .select(col("vec_id"), col("label"), col("d2_milli").as("a2"))
        val b = scored.where(col("label") =!= col("c_label"))
          .groupBy("vec_id").agg(min("d2_milli").as("b2"))
        // signed divisions: Spark `div` and DuckDB `//` BOTH truncate
        // toward zero (verified empirically), so the plain operators
        // agree on the negative deltas
        a.join(b, "vec_id")
          .withColumn("__dn", expr("(b2 - a2) * 1000000"))
          .withColumn("__g", greatest(col("a2"), col("b2"), lit(1L)))
          .withColumn("s_ppm", expr("__dn div __g"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            expr("sum(s_ppm) div count(1)").as("mean_s_ppm"),
            sum(when(col("s_ppm") < 0, 1L).otherwise(0L))
              .as("n_closer_to_foreign"))
          .orderBy("label")
      },
      Some("""WITH e AS (SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS v
        |  FROM embeddings),
        |ed AS (SELECT vec_id, label, i AS dim, v[i] AS vd
        |  FROM e, generate_series(1, 64) AS t(i)),
        |ct AS (SELECT label AS c_label, dim,
        |    CAST(count(*) AS BIGINT) AS n_l,
        |    CAST(sum(vd) AS BIGINT) AS sd
        |  FROM ed GROUP BY 1, 2),
        |cn AS (SELECT c_label, max(n_l) AS n_l FROM
        |  (SELECT c_label, count(*) AS n_l FROM
        |    (SELECT DISTINCT vec_id, label AS c_label FROM e)
        |   GROUP BY 1) GROUP BY 1),
        |sc AS (SELECT ed.vec_id, ed.label, ct.c_label,
        |    CAST(sum((cn.n_l * ed.vd - ct.sd) * (cn.n_l * ed.vd - ct.sd))
        |      AS BIGINT) AS num, max(cn.n_l) AS n_l
        |  FROM ed JOIN ct ON ed.dim = ct.dim
        |  JOIN cn ON ct.c_label = cn.c_label
        |  GROUP BY 1, 2, 3),
        |d2 AS (SELECT vec_id, label, c_label,
        |    (num // (n_l * n_l)) * 1000 +
        |    ((num % (n_l * n_l)) * 1000) // (n_l * n_l) AS d2_milli
        |  FROM sc),
        |a AS (SELECT vec_id, label, d2_milli AS a2 FROM d2
        |  WHERE label = c_label),
        |b AS (SELECT vec_id, min(d2_milli) AS b2 FROM d2
        |  WHERE label != c_label GROUP BY 1),
        |sil AS (SELECT a.vec_id, a.label,
        |    ((b.b2 - a.a2) * 1000000) // greatest(a.a2, b.b2, 1) AS s_ppm
        |  FROM a JOIN b ON a.vec_id = b.vec_id)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(s_ppm) // count(*) AS BIGINT) AS mean_s_ppm,
        |  CAST(sum(CASE WHEN s_ppm < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_closer_to_foreign
        |FROM sil GROUP BY 1 ORDER BY label""".stripMargin))
  )
}
