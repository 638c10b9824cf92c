package graft


import org.apache.spark.sql.functions._

/** Bucketing = the "pre-shuffle once, join many times shuffle-free"
  * strategy for repeated big-big joins at 100 TB (SURVEY.md scale notes):
  * both sides bucketed by the join key into the same bucket count join
  * with NO exchange on either side — the shuffle was paid once at write
  * time and amortizes over every subsequent join.
  */
class BucketedJoinSpec extends SparkTestBase {

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
