package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  * Reads are plain `spark.read.parquet` so Catalyst predicate pushdown /
  * column pruning reach the scan untouched.
  */
object Tables {
  /** Inferred schema per parquet path. Schema INFERENCE is the only part
    * of `spark.read.parquet` that dispatches a driver job (a footer-read
    * per call); the data scan itself stays lazy. A board of ~170 queries
    * averaging 3 table loads × 3 bench reps was paying ~40% of its total
    * driver-job dispatch on re-inferring the same static schemas — on a
    * busy cluster scheduler the same dispatch floor applies. Passing the
    * schema explicitly skips the inference job while leaving pushdown/
    * pruning untouched.
    *
    * The cache keys on (path, modification fingerprint): a parquet file
    * REGENERATED in the same JVM (bench/scale-curve tooling rewrites
    * test data) gets a fresh inference rather than a stale schema —
    * Spark fills columns absent from the footer with nulls when the
    * schema is user-specified, so a stale hit would mis-read silently,
    * not fail loudly. The fingerprint is one local stat (file: mtime ×
    * length; directory: max child mtime × child count — parquet dirs
    * replace part files on rewrite); a non-local URI stats as 0 and
    * degrades to path-only keying, the acceptable trade on an immutable
    * object store. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), org.apache.spark.sql.types.StructType]()
  private def modFingerprint(path: String): Long = {
    val f = new java.io.File(path)
    if (f.isDirectory) {
      // sorted so directory-listing order can't fake a modification
      val kids = Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
      kids.foldLeft(kids.length.toLong)((a, k) => a * 1000003L + k.lastModified())
    } else if (f.isFile) f.lastModified() * 1000003L + f.length()
    else 0L
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The driver's parquet has shifted formats across rounds: TIMESTAMP(NANOS)
    // (rejected by default — read as long via nanosAsLong), and currently
    // naive timestamp[us] (isAdjustedToUTC=false), which Spark 4 would infer
    // as TIMESTAMP_NTZ. Disable NTZ inference so naive micros read as plain
    // TimestampType micros-since-epoch — with the UTC session timezone this
    // matches both prior rounds' values and DuckDB's naive-timestamp oracle.
    // Both confs are runtime-settable SQL confs, set here so they also hold
    // when the driver calls entry() with its own session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent((path, modFingerprint(path)),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** `ts` arrives as nanos-since-epoch long (see load); convert to
    * TimestampType via integer division — `DIV 1000` stays exact on longs
    * where a double division would lose precision above 2^53. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Belt-and-braces for a pre-existing session where NTZ inference
        // already ran: NTZ→timestamp under the UTC session tz is exact.
        raw.withColumn("ts", raw("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
