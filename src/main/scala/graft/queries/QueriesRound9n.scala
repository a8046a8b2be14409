package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 fourteenth batch: 2D prefix sums (integral image) — the
  * vision-preprocessing primitive as two window passes.
  */
object QueriesRound9n {

  val defs: Seq[QueryDef] = Seq(

    // ---- q517: integral image + box-filter readout ---------------------------
    // The summed-area table (Crow '84; every box-blur / Haar-feature /
    // patch-mean pipeline runs on it): ii(x,y) = Σ px≤x,py≤y. As a
    // distributed plan this is TWO window passes over the pixel frame
    // — row-cums partitioned by (img, y) ordered by x, then column
    // cums of those partitioned by (img, x) ordered by y — i.e. 2D
    // separability made explicit; no per-image UDF, no driver loop,
    // partitions scale with image count. Two box readouts (8×8
    // center, 4×4 corner) come off FOUR corner cells each via the
    // inclusion-exclusion identity, and the same boxes are ALSO
    // summed directly — `ii_eq` pins the identity inside the hash
    // gate (the q398 self-proving-merge discipline). Pixels are the
    // q218 deterministic class patterns, so the lane needs no image
    // codec (the Spark-side plumbing is the point).
    QueryDef("q517_integral_image",
      (s, d) => {
        val px = part(s, d).where(col("p_partkey") <= 120)
          .select(col("p_partkey").as("img"), (col("p_partkey") % 17).as("v0"))
          .select(col("img"), explode(sequence(lit(0), lit(255))).as("i"),
            col("v0"))
          .select(col("img"), expr("i div 16").as("y"), expr("i % 16").as("x"),
            expr("(v0 * 37 + i * i * 13) % 256").as("v"))
        val wRow = Window.partitionBy("img", "y").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wCol = Window.partitionBy("img", "x").orderBy("y")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ii = px
          .withColumn("rowcum", sum("v").over(wRow))
          .withColumn("ii", sum("rowcum").over(wCol))
        // inclusion-exclusion corners for box [x1..x2]×[y1..y2]
        def corner(x: Int, y: Int) =
          max(when(col("x") === x && col("y") === y, col("ii")))
        def boxIi(x1: Int, y1: Int, x2: Int, y2: Int) = {
          val base = corner(x2, y2)
          val left = if (x1 > 0) corner(x1 - 1, y2) else lit(0L)
          val top = if (y1 > 0) corner(x2, y1 - 1) else lit(0L)
          val diag = if (x1 > 0 && y1 > 0) corner(x1 - 1, y1 - 1) else lit(0L)
          coalesce(base, lit(0L)) - coalesce(left, lit(0L)) -
            coalesce(top, lit(0L)) + coalesce(diag, lit(0L))
        }
        def boxDirect(x1: Int, y1: Int, x2: Int, y2: Int) =
          sum(when(col("x").between(x1, x2) && col("y").between(y1, y2),
            col("v")).otherwise(0L))
        ii.groupBy("img").agg(
          boxIi(4, 4, 11, 11).as("center_ii"),
          boxDirect(4, 4, 11, 11).as("center_direct"),
          boxIi(0, 0, 3, 3).as("corner_ii"),
          boxDirect(0, 0, 3, 3).as("corner_direct"),
          max(when(col("x") === 15 && col("y") === 15, col("ii")))
            .as("total"))
          .select(col("img"), col("center_ii"), col("corner_ii"), col("total"),
            (col("center_ii") === col("center_direct") &&
              col("corner_ii") === col("corner_direct")).cast("long")
              .as("ii_eq"))
          .orderBy("img")
      },
      Some("""WITH k AS (SELECT p_partkey AS img, p_partkey % 17 AS v0
        |  FROM part WHERE p_partkey <= 120),
        |px AS (SELECT img, i // 16 AS y, i % 16 AS x,
        |    (v0 * 37 + i * i * 13) % 256 AS v
        |  FROM k, (SELECT unnest(generate_series(0, 255)) AS i)),
        |ic AS (SELECT img, x, y, v,
        |    sum(v) OVER (PARTITION BY img, y ORDER BY x) AS rowcum
        |  FROM px),
        |ii AS (SELECT img, x, y, v,
        |    sum(rowcum) OVER (PARTITION BY img, x ORDER BY y) AS ii
        |  FROM ic),
        |ag AS (SELECT img,
        |    max(CASE WHEN x = 11 AND y = 11 THEN ii END)
        |      - max(CASE WHEN x = 3 AND y = 11 THEN ii END)
        |      - max(CASE WHEN x = 11 AND y = 3 THEN ii END)
        |      + max(CASE WHEN x = 3 AND y = 3 THEN ii END) AS center_ii,
        |    sum(CASE WHEN x BETWEEN 4 AND 11 AND y BETWEEN 4 AND 11
        |      THEN v ELSE 0 END) AS center_direct,
        |    max(CASE WHEN x = 3 AND y = 3 THEN ii END) AS corner_ii,
        |    sum(CASE WHEN x <= 3 AND y <= 3 THEN v ELSE 0 END)
        |      AS corner_direct,
        |    max(CASE WHEN x = 15 AND y = 15 THEN ii END) AS total
        |  FROM ii GROUP BY 1)
        |SELECT img, CAST(center_ii AS BIGINT) AS center_ii,
        |  CAST(corner_ii AS BIGINT) AS corner_ii,
        |  CAST(total AS BIGINT) AS total,
        |  CAST(CASE WHEN center_ii = center_direct
        |    AND corner_ii = corner_direct THEN 1 ELSE 0 END AS BIGINT)
        |    AS ii_eq
        |FROM ag ORDER BY img""".stripMargin))
  )
}
