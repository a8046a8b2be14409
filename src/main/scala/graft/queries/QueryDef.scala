package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: the Spark implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB
  * over the same parquet tables (SparkEntry contract). `oracle = None`
  * records the weaker rows-only check.
  */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
