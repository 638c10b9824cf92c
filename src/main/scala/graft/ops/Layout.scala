package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-layout helpers for shuffle-free joins at scale.
  *
  * A join between two tables bucketed by the join keys into the same
  * number of buckets needs NO exchange at read time: Spark's bucketing
  * metadata (catalog tables, `bucketBy`) lets the planner line buckets up
  * one-to-one, so a 100 TB fact ⋈ fact join runs as a per-bucket
  * sort-merge with zero network. Sorting within buckets (`sortBy`)
  * additionally lets the merge start without a per-task sort when each
  * bucket is a single file (one writer task per bucket).
  *
  * This is the write-side half of the engine's co-location story (the
  * read side is just `spark.table(...)` + a plain join — the planner does
  * the rest); the salting in [[ScaleOps]] is the complementary tool for
  * keys too hot to co-locate.
  */
object Layout {

  /** Write `df` as a bucketed (and optionally bucket-sorted) catalog
    * table. Buckets = `numBuckets` on `keys`; pick the bucket count so a
    * bucket of the LARGER table fits an executor's memory at target
    * scale. Repartitioning by the keys first gives one writer task per
    * bucket, so each bucket is one file and `sortBy` yields fully-sorted
    * buckets (the no-sort merge path). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int, sorted: Boolean = true,
      mode: SaveMode = SaveMode.ErrorIfExists,
      extraSortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "need at least one bucket key")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(extraSortCols.isEmpty || sorted,
      "extraSortCols need sorted = true (they extend the bucket sort order)")
    val cols = keys.map(org.apache.spark.sql.functions.col)
    val sortKeys = keys ++ extraSortCols
    val w = df.repartition(numBuckets, cols: _*)
      .write.mode(mode).bucketBy(numBuckets, keys.head, keys.drop(1): _*)
    (if (sorted) w.sortBy(sortKeys.head, sortKeys.drop(1): _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (plain catalog read — the bucketing
    * metadata rides along and the planner uses it in joins). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write the corpus as ordered training shards: directory-partitioned
    * by [[graft.operators.Splits.trainingOrder]]'s shard assignment, each
    * shard's rows stored in their training order. This is the scalable
    * form of the t20 contract — `repartition(shard) +
    * sortWithinPartitions(shard, pos)` keeps each shard whole inside one
    * task (one task per shard when `spark.sql.shuffle.partitions` ≥
    * nShards; otherwise a task writes several shards, still exactly ONE
    * ordered file per shard directory), with NO global sort and no
    * driver state; a trainer streams `shard=K/` files in file order and
    * sees exactly the deterministic salted-hash order. `pos` rides along so a resumed read
    * can seek (and so the layout is audit-able against the t20 query).
    *
    * `df` must already carry `shard` and `pos` (from `trainingOrder` —
    * the split keeps fit and write as separately testable stages). */
  def writeTrainingShards(df: DataFrame, dir: String): Unit = {
    require(Seq("shard", "pos").forall(df.columns.contains),
      "writeTrainingShards expects trainingOrder output (shard, pos columns)")
    import org.apache.spark.sql.functions.col
    df.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy("shard")
      .parquet(dir)
  }

  /** Write an event table date-partitioned (`day=YYYY-MM-DD/`
    * directories) — THE layout for time-series facts at 100 TB: a query
    * filtering on `day` (or on the timestamp it derives from, via the
    * derived-column filter the caller adds) reads ONLY the matching
    * directories; everything else is pruned at planning time, before a
    * single byte of parquet opens. One writer wave, at most
    * `maxFilesPerDay` files per partition (repartition on (day, slice) —
    * without it every input task writes every day: tiny-file explosion).
    *
    * Readers get pruning through [[readDayPartitioned]]; LayoutSpec pins
    * `PartitionFilters` carrying the day predicate and the unpruned
    * directory count. */
  def writeDayPartitioned(df: DataFrame, tsCol: String, dir: String,
      maxFilesPerDay: Int = 1): Unit = {
    require(maxFilesPerDay > 0, s"maxFilesPerDay must be positive, got $maxFilesPerDay")
    require(!df.columns.contains("day"),
      "writeDayPartitioned derives a 'day' partition column; the input already " +
        "has one — rename it first (silently overwriting would destroy it in the layout)")
    import org.apache.spark.sql.functions._
    df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("day"), pmod(spark_partition_id(), lit(maxFilesPerDay)))
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy("day")
      .parquet(dir)
  }

  /** Read a [[writeDayPartitioned]] table. Filter on `day` (string
    * 'yyyy-MM-dd') for partition pruning — a predicate on the raw
    * timestamp column alone cannot prune directories. */
  def readDayPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Cluster `df` by the z-order (Morton) key of two columns — the
    * multi-dimensional layout pass behind Delta/Iceberg's OPTIMIZE
    * ZORDER. Range-partition on the key (`numFiles` output slices with
    * disjoint z ranges, one sampling pass — the only exchange), then sort
    * within each slice; written as parquet, every file's row-group
    * min/max stats are tight in BOTH dimensions, so a 2-D predicate
    * prunes files/row-groups on either axis — a single-column sort can
    * only ever prune one. The z key rides along as `z_key` for audit and
    * as the natural sort key of any later compaction.
    *
    * 100 TB shape: one range exchange (sampled boundaries, skew-tolerant)
    * + local sorts; no global sort, no driver state. `bits`=16 gives a
    * 65536×65536 grid — plenty below parquet row-group granularity; raise
    * it only if a dimension's cardinality genuinely exceeds 2^16 AFTER
    * dictionary-ranking it. */
  def clusterZOrder(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    import org.apache.spark.sql.functions.col
    df.withColumn("z_key",
        graft.expressions.BitExpressions.zorder(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("z_key"))
      .sortWithinPartitions(col("z_key"))
  }
}
