package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Round-9 twenty-eighth batch: Walker/Vose alias table for O(1)
  * mixture sampling.
  */
object QueriesRound9ab {

  val defs: Seq[QueryDef] = Seq(

    // ---- q537: alias-table construction ------------------------------------------
    // The data structure behind every O(1) weighted sampler (training
    // mixtures draw BILLIONS of source picks — per-draw binary search
    // over CDFs is the naive path, the alias table is the real one):
    // Vose's two-bucket pairing made CANONICAL so two engines build
    // the IDENTICAL table — each step pairs the (scaled, name)-sorted
    // minimum with the maximum, all integer (scaled_i = cnt_i·n, cell
    // capacity T = Σcnt — no 1/n floats anywhere). The fold is a
    // 19-step column-expression aggregate with (remaining, cells)
    // array state; the oracle walks the same steps recursively. The
    // construction PROVES itself in the output: per source, Σ_cells
    // [own threshold + (T − threshold) where aliased] must equal
    // scaled_i exactly — `reconstruct_ok` rides every row.
    QueryDef("q537_alias_table",
      (s, d) => {
        val cnts = documents(s, d).groupBy("source")
          .agg(count(lit(1)).as("cnt"))
        val tot = cnts.agg(sum("cnt").as("t"), count(lit(1)).as("n"))
        val base = cnts.crossJoin(broadcast(tot))
          .select(col("t"), col("n"),
            expr("named_struct('scaled', cnt * n, 'name', source)")
              .as("e"))
          .groupBy("t", "n")
          .agg(expr("array_sort(collect_list(e))").as("rem0"))
        // srt inlined everywhere (lambdas cannot host subqueries);
        // codegen CSE collapses the repeats
        val srt = "array_sort(acc.rem)"
        val sml = s"element_at($srt, 1)"
        val lrg = s"element_at($srt, CAST(size($srt) AS INT))"
        val step =
          s"""CASE WHEN size(acc.rem) <= 1 THEN acc ELSE
             |  named_struct(
             |    'rem', concat(
             |      slice($srt, 2, size($srt) - 2),
             |      array(named_struct(
             |        'scaled', $lrg.scaled - (t - $sml.scaled),
             |        'name', $lrg.name))),
             |    'cells', concat(acc.cells, array(named_struct(
             |      'cell', $sml.name, 'alias', $lrg.name,
             |      'thr', $sml.scaled))))
             |END""".stripMargin
        val folded = base.withColumn("st", expr(
          s"""aggregate(sequence(1, CAST(n - 1 AS INT)),
             |  named_struct('rem', rem0,
             |    'cells', CAST(array() AS
             |      ARRAY<STRUCT<cell: STRING, alias: STRING, thr: BIGINT>>)),
             |  (acc, k) -> $step,
             |  acc -> concat(acc.cells, array(named_struct(
             |    'cell', element_at(acc.rem, 1).name,
             |    'alias', element_at(acc.rem, 1).name, 'thr', t))))"""
            .stripMargin))
        val cells = folded.select(col("t"),
            posexplode(col("st")).as(Seq("i", "c")))
          .select(col("t"), col("c.cell").as("cell"),
            col("c.alias").as("alias"), col("c.thr").as("thr"))
        val recon = cells.select(col("cell").as("source"), col("thr"))
          .unionByName(cells.select(col("alias").as("source"),
            (col("t") - col("thr")).as("thr")))
          .groupBy("source").agg(sum("thr").as("mass"))
        val scaled = cnts.crossJoin(broadcast(cnts.agg(
            count(lit(1)).as("nn"))))
          .select(col("source"), expr("cnt * nn").as("scaled"))
        cells.join(recon.withColumnRenamed("source", "cell"), Seq("cell"))
          .join(scaled.withColumnRenamed("source", "cell")
            .withColumnRenamed("scaled", "own_scaled"), Seq("cell"))
          .select(col("cell"), col("alias"), col("thr"),
            col("own_scaled"),
            (col("mass") === col("own_scaled")).as("reconstruct_ok"))
          .orderBy("cell")
      },
      Some("""WITH RECURSIVE c AS (SELECT source, CAST(count(*) AS BIGINT)
        |    AS cnt FROM documents GROUP BY 1),
        |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS n FROM c),
        |r0 AS (SELECT list_sort(list(struct_pack(
        |      scaled := cnt * (SELECT n FROM tt), name := source))) AS rem
        |  FROM c),
        |w AS (
        |  SELECT 0 AS k, r0.rem AS rem,
        |    CAST([] AS STRUCT(cell VARCHAR, alias VARCHAR,
        |      thr BIGINT)[]) AS cells
        |  FROM r0
        |  UNION ALL
        |  SELECT w.k + 1,
        |    list_append(srt[2:len(srt) - 1], struct_pack(
        |      scaled := srt[-1].scaled - ((SELECT t FROM tt)
        |        - srt[1].scaled),
        |      name := srt[-1].name)),
        |    list_append(w.cells, struct_pack(cell := srt[1].name,
        |      alias := srt[-1].name, thr := srt[1].scaled))
        |  FROM (SELECT k, list_sort(rem) AS srt, cells FROM w) w
        |  WHERE len(w.srt) > 1),
        |fin AS (SELECT list_append(cells, struct_pack(
        |      cell := rem[1].name, alias := rem[1].name,
        |      thr := (SELECT t FROM tt))) AS cells
        |  FROM w WHERE len(rem) = 1),
        |cells AS (SELECT u.cell, u.alias, u.thr
        |  FROM (SELECT unnest(cells) AS u FROM fin)),
        |recon AS (SELECT source, CAST(sum(thr) AS BIGINT) AS mass FROM (
        |    SELECT cell AS source, thr FROM cells
        |    UNION ALL
        |    SELECT alias, (SELECT t FROM tt) - thr FROM cells)
        |  GROUP BY 1)
        |SELECT cells.cell, cells.alias, cells.thr,
        |  c.cnt * (SELECT n FROM tt) AS own_scaled,
        |  recon.mass = c.cnt * (SELECT n FROM tt) AS reconstruct_ok
        |FROM cells JOIN recon ON recon.source = cells.cell
        |  JOIN c ON c.source = cells.cell
        |ORDER BY cells.cell""".stripMargin))
  )
}
