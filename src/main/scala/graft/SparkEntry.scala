package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` is the complete operator surface (SURVEY.md §2 inventory +
  * north-star extensions); `oracleSql` holds the DuckDB-equivalent SQL
  * for every SQL-expressible query (same parquet tables, same column
  * aliases — the driver compares by column name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * distributed DBSCAN over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("dbscan_events")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Clustering.queries ++
      graft.queries.NorthStar.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Clustering.oracles ++
      graft.queries.NorthStar.oracles
}
