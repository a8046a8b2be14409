package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k for a bounded query set —
  * broadcast the queries, stream the corpus once, per-partition top-k
  * via window rank. Scale path: sign-random-projection LSH buckets
  * (deterministic hyperplanes) so the corpus join becomes bucket-local.
  *
  * The inner loop uses graft_dot, a native codegen'd Catalyst
  * expression (graft.functions.DotProduct); the zip_with/aggregate
  * formulations are kept as the portable reference semantics. Norms
  * are precomputed per side before any join so each candidate pair
  * costs exactly one dot product.
  */
object Similarity {

  /** Dot product via built-in higher-order functions — the reference
    * semantics (interpreted; use dotNative in hot paths). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd variants (require GraftFunctions.register — every
    * DataFrame entry point below does it). */
  def dotNative(a: Column, b: Column): Column = GraftFunctions.dotNative(a, b)
  def normNative(a: Column): Column = sqrt(dotNative(a, a))
  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (normNative(a) * normNative(b))

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast); the corpus is streamed
    * exactly once — at 100 TB this is the map-side-only plan you want
    * for a bounded query batch. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      normNative(col(vecCol)).as("__qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      normNative(col(vecCol)).as("__cn"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        round(dotNative(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** Deterministic pseudo-random hyperplane matrix: `nPlanes` x `dim`,
    * components in [-1, 1), seeded — reproducible across runs/engines. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-random-projection bucket id: one bit per hyperplane.
    * (Plane literals are float arrays so graft_dot applies.) */
  def srpBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(v => lit(v.toFloat)): _*)
      when(dotNative(vec, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: corpus and queries are hashed to
    * SRP buckets; candidates are bucket-colocated (equi-join — shuffle
    * on bucket id, no cross join). Recall grows with fewer planes /
    * multiple tables; this single-table variant is the scale skeleton. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 8, seed: Long = 42,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val dim = 64
    val planes = hyperplanes(nPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      normNative(col(vecCol)).as("__cn"), srpBucket(col(vecCol), planes).as("__bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      normNative(col(vecCol)).as("__qn"), srpBucket(col(vecCol), planes).as("__bucket"))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        round(dotNative(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select("query_id", "neighbor_id", "cosine")
  }

  /** Exact embedding near-duplicate pairs: all pairs above a cosine
    * threshold. Norms precomputed per side; each pair costs one dot.
    * (At scale prefer cosineNearDupPairsLsh.) */
  def cosineNearDupPairsExact(df: DataFrame, threshold: Double,
                              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      normNative(col(vecCol)).as("__na"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      normNative(col(vecCol)).as("__nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(dotNative(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 4))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Embedding-cosine near-duplicate pairs, SRP-bucketed: the
    * self-join is bucket-local (equi-join on bucket id — linear
    * shuffle, no cross join). Approximate: pairs split by a hyperplane
    * are missed; use multiple tables (seeds) to raise recall. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         nPlanes: Int = 6, seed: Long = 42,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val planes = hyperplanes(nPlanes, 64, seed)
    val h = df.select(col(idCol), col(vecCol),
      normNative(col(vecCol)).as("__n"), srpBucket(col(vecCol), planes).as("__bucket"))
    val a = h.select(col("__bucket"), col(idCol).as("id_a"), col(vecCol).as("__va"), col("__n").as("__na"))
    val b = h.select(col("__bucket"), col(idCol).as("id_b"), col(vecCol).as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq("__bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(dotNative(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 4))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }
}
