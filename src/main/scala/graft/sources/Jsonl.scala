package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the interchange format every LLM-data pipeline
  * meets at its edges (crawl dumps, annotation exports, eval sets arrive as
  * jsonl; parquet is the internal format). The operators here are thin by
  * design: Spark's own json reader/writer does the work, and this module
  * pins the two policies that matter at scale.
  *
  * Scale shape (100 TB): jsonl is line-splittable, so a directory of files
  * fans out across executors at `files.maxPartitionBytes` granularity like
  * any text source — but it is ~3-8× the bytes of the same data in parquet
  * with zero column pruning or predicate pushdown (`ReadSchema` is the
  * whole line regardless of projection). The intended use is
  * ingest-once / export-once at the pipeline boundary, never as the
  * operand store — [[graft.ops.Layout]] owns the internal layout.
  *
  * Policies pinned here:
  *   - EXPLICIT schema, always. Schema inference is a full extra pass over
  *     the data before the real one — unacceptable at ingest scale, and
  *     silently type-unstable (a batch whose `id`s all look numeric infers
  *     differently than one with a stray string).
  *   - Corrupt records follow the engine's LogAndContinue stance (SURVEY
  *     §2.1 S8, same as the Avro and media decoders): a malformed line
  *     becomes a counted drop, never a job failure.
  */
object Jsonl {

  /** Export a frame as jsonl. One file per partition — size partitions
    * upstream (`repartition`/[[graft.ops.Layout]]) to control file count. */
  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  /** Read jsonl with an explicit schema, keeping corrupt lines: rows that
    * fail to parse have every data column null and the raw line in
    * `_corrupt_record` (PERMISSIVE — the diagnosable form). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)

  /** Read jsonl, dropping corrupt lines (the S8 LogAndContinue policy in
    * its batch form): parsed rows only, data columns only.
    *
    * Caveat (Spark limitation): a downstream query must reference at
    * least one DATA column — a bare `count()` prunes the scan to
    * `_corrupt_record` alone, which Spark rejects with
    * UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN (the corrupt
    * column only materializes while parsing data columns). A plain
    * projection does NOT survive count()'s pruning — count survivors
    * with `.agg(count(col("<data col>")))` instead. */
  def readLogAndContinue(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    read(spark, dir, schema)
      .filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
}
