package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** CSV source/sink — the other boundary format (annotation exports,
  * spreadsheet-born metadata, legacy dumps). Same stance as [[Jsonl]]:
  * thin wrappers over Spark's reader/writer that pin the policies which
  * matter at ingest scale, never an operand store.
  *
  * Policies pinned here:
  *   - EXPLICIT schema, always (inference = an extra full pass, and
  *     type-unstable across batches).
  *   - RFC-4180 quoting (`"` quoted, doubled to escape) so text columns
  *     containing commas/quotes survive the round trip byte-exactly —
  *     Spark's default backslash escape is NOT what spreadsheet tooling
  *     writes.
  *   - Corrupt rows (wrong arity, unparseable numerics) follow the S8
  *     LogAndContinue policy: counted drops, never job failures.
  *   - No header: headers are per-FILE rows that break splittability
  *     accounting and re-appear mid-dataset on concatenated dumps;
  *     column identity lives in the explicit schema.
  *
  * The jsonl caveat applies here too: a query over
  * [[readLogAndContinue]]'s result must reference ≥1 data column (count
  * survivors with `agg(count(col("<data col>")))`).
  */
object Csv {

  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("header", "false")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(dir)

  /** Read with an explicit schema, keeping corrupt rows in
    * `_corrupt_record` (PERMISSIVE — the diagnosable form).
    *
    * Caveat: CSV corruption is detected while PARSING, and Spark only
    * parses referenced columns — a row whose only bad value sits in a
    * column the query prunes away is NOT flagged. A drop-the-corrupt
    * pipeline must therefore reference every data column at the boundary
    * (as [[readLogAndContinue]] callers that project immediately do
    * implicitly only for their own columns — project the full schema
    * once at ingest if full-row validation is the contract). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", "false")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)

  /** Read CSV, dropping corrupt rows (S8 LogAndContinue, batch form). */
  def readLogAndContinue(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    read(spark, dir, schema)
      .filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
}
