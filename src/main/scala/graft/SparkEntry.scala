package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipelines.CallsPipeline
import graft.queries._

/** Driver contract — see SURVEY.md §7 and FIXTURES.md §4.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 (reference
  * surface), the relational superset (§2.6), or a north-star extension,
  * expressed over the driver's parquet tables; `oracleSql` holds the
  * equivalent DuckDB SQL the driver hash-compares against at sf0.01.
  *
  * Conventions shared by query + oracle (drift here = hash mismatch):
  *   - every computed column aliased identically on both sides;
  *   - row order is irrelevant (the driver sorts before comparing), so
  *     queries carry no trailing ORDER BY — a global sort would cost an
  *     extra range-partitioning pass; only top-k queries sort, semantically;
  *   - doubles floored/rounded into exact integer types (cents) before
  *     aggregation, so float summation order can never flip a hash;
  *   - timestamps emitted as formatted strings (UTC session TZ).
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2): the reference's two topologies
    * composed end-to-end. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    CallsPipeline.callsEnriched(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ RelationalQueries.queries ++ NorthStarQueries.queries

  def oracleSql: Map[String, String] =
    ReferenceQueries.oracleSql ++ RelationalQueries.oracleSql ++ NorthStarQueries.oracleSql
}
