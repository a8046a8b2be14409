package graft.queries

import graft.Tables._
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Embedding similarity-search queries (north-star operators):
  * brute-force cosine top-k (oracle-checked with explicit double
  * math), exact threshold near-dup pairs, per-label norm stats, and
  * the SRP-LSH approximate variant (rows-only — the scale path).
  */
object QueriesSimilarity {

  private val Dim = 64

  val defs: Seq[QueryDef] = Seq(

    // ---- q50: brute-force cosine top-k for a bounded query set ------
    QueryDef("q50_cosine_topk",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 20), k = 5)
          .orderBy("query_id", "neighbor_id")
      },
      Some {
        val cos = DuckSql.cosine("q.embedding", "c.embedding", Dim)
        s"""SELECT query_id, neighbor_id, cosine FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round($cos, 4) AS cosine,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round($cos, 4) DESC, c.vec_id) AS rn
        |  FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        |  WHERE q.vec_id < 20)
        |WHERE rn <= 5 ORDER BY query_id, neighbor_id""".stripMargin
      }),

    // ---- q51: exact embedding near-dup pairs above threshold --------
    QueryDef("q51_cosine_neardup",
      (s, d) => Similarity.cosineNearDupPairsExact(embeddings(s, d), 0.4)
        .orderBy("id_a", "id_b"),
      Some {
        val cos = DuckSql.cosine("a.embedding", "b.embedding", Dim)
        s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cos, 4) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round($cos, 4) >= 0.4
        |ORDER BY 1, 2""".stripMargin
      }),

    // ---- q52: per-label embedding norm statistics -------------------
    QueryDef("q52_embedding_stats",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        embeddings(s, d)
          .withColumn("nrm", Similarity.normNative(col("embedding")))
        .groupBy(col("label").cast("bigint").as("label"))
        .agg(count(lit(1)).as("n"),
          // order-insensitive: snap each norm to decimal(18,6) before the
          // sum so partial-agg merge order can't move the 4th decimal
          round(sum(col("nrm").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 4).as("avg_norm"),
          round(min(col("nrm")), 4).as("min_norm"),
          round(max(col("nrm")), 4).as("max_norm"))
        .orderBy("label")
      },
      Some {
        val nrm = s"sqrt(${DuckSql.dot("embedding", "embedding", Dim)})"
        s"""SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
        |  round(CAST(sum(CAST($nrm AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_norm,
        |  round(min($nrm), 4) AS min_norm,
        |  round(max($nrm), 4) AS max_norm
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- q53: SRP-LSH approximate top-k (the 100 TB scale path) -----
    // Bucketed equi-join instead of a cross join; rows-only check (the
    // hyperplane literals are impractical to mirror in oracle SQL).
    QueryDef("q53_lsh_topk",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.lshTopK(emb, emb.where(col("vec_id") < 20), k = 5, nPlanes = 4)
          .orderBy("query_id", "neighbor_id")
      },
      None),

    // ---- q54: IVF approximate top-k (rows-only; recall vs q50 is
    // asserted in SimilaritySpec) -------------------------------------
    QueryDef("q54_ivf_topk",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.ivfTopK(emb, emb.where(col("vec_id") < 20), k = 5)
          .orderBy("query_id", "neighbor_id")
      },
      None))
}
