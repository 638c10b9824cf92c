package graft


import org.apache.spark.sql.functions._

/** Bucketing = the "pre-shuffle once, join many times shuffle-free"
  * strategy for repeated big-big joins at 100 TB (SURVEY.md scale notes):
  * both sides bucketed by the join key into the same bucket count join
  * with NO exchange on either side — the shuffle was paid once at write
  * time and amortizes over every subsequent join.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("writeTrainingShards: one ordered file per shard dir, rows in training order") {
    import graft.operators.Splits
    import graft.ops.Layout
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select(col("doc_id"))
    val ordered = Splits.trainingOrder(docs, "doc_id", nShards = 4, salt = "w0")
    val dir = java.nio.file.Files.createTempDirectory("train-shards").toString + "/out"
    Layout.writeTrainingShards(ordered, dir)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length === 4, s"expected 4 shard dirs, got ${shardDirs.length}")
    val want = ordered.select(col("shard"), col("pos"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    shardDirs.foreach { sd =>
      val shard = sd.getName.stripPrefix("shard=").toLong
      val parts = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"shard $shard has ${parts.length} files — not one writer task")
      // a single parquet file preserves row order: the file order IS the
      // training order, which is the whole point of the layout
      val rows = spark.read.parquet(parts.head.getPath)
        .select(col("pos"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq, s"shard $shard not pos-ordered")
      assert(rows.map(r => (shard, r._1, r._2)).toSet === want(shard).toSet, s"shard $shard content")
    }
    // guard: refuses frames that don't carry the trainingOrder contract
    intercept[IllegalArgumentException] {
      Layout.writeTrainingShards(docs, dir + "2")
    }
  }

  test("co-bucketed tables join without a shuffle on either side") {
    // warehouse dir is a temp dir set by SparkTestBase (static conf)
    val sf = "/root/testdata/sf0.001"

    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the join must pick a shuffle-or-bucket strategy
    val plan = withNoBroadcast {
      joined.queryExecution.executedPlan.toString()
    }
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")

    // and it computes the same rows as the unbucketed join
    val expected = Tables.lineitem(spark, sf).join(
      Tables.orders(spark, sf),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === expected)
  }

  private def withNoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }
}
