package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session builder for the engine — the configuration a
  * 100 TB deployment wants, pre-wired:
  *
  *   - AQE on (default in Spark 4) with skew-join splitting and partition
  *     coalescing: runtime re-planning replaces hand-tuned partition
  *     counts; `shufflePartitions` is the *upper bound* AQE coalesces from,
  *     so size it to cluster cores, not data volume.
  *   - UTC session timezone: the reference's SimpleDateFormat used JVM-local
  *     time (CallCustomerJoiner.java:33); pinning UTC makes window bounds
  *     and formatted timestamps deterministic across clusters.
  *   - graft SQL functions registered (GraftExtensions), so spark.sql and
  *     the Column API expose the same surface.
  *
  * `spark.sql.files.maxPartitionBytes` (default 128 MB) is deliberately
  * untouched: with codegen'd per-row kernels the scan is CPU-balanced at
  * the default split size; lower it only when decode-heavy multimodal
  * columns make splits CPU-bound.
  */
object GraftSession {

  def builder(appName: String = "graft", master: Option[String] = None,
      shufflePartitions: Option[Int] = None,
      rocksDbState: Boolean = false): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // Streaming state at scale: the default HDFSBackedStateStoreProvider
    // keeps every key in executor heap — fine for the test-sized topologies
    // here, an OOM source once latestPerKey/streamingLshNearDup state grows
    // to hundreds of millions of keys. RocksDB spills to local disk with
    // changelog checkpointing, the production setting (reference analogue:
    // Kafka Streams' RocksDB state stores, CallsAggregationApp.java:58).
    if (rocksDbState) {
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      b.config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }
    master.foreach(b.master)
    shufflePartitions.foreach(n => b.config("spark.sql.shuffle.partitions", n.toString))
    b
  }

  /** Build + register the graft SQL functions. */
  def create(appName: String = "graft", master: Option[String] = None,
      shufflePartitions: Option[Int] = None): SparkSession = {
    val s = builder(appName, master, shufflePartitions).getOrCreate()
    GraftExtensions.register(s)
    s
  }
}
