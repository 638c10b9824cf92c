package graft

import graft.ops.PlanScope
import org.apache.spark.sql.functions._

/** The plan scope is what makes wrapping operators in conf overrides safe
  * for callers: the isolated form must never leak confs to the caller's
  * session (a concurrent query plans under AQE as usual, mid-scope), and
  * the legacy mutating form must restore exactly — on success, on
  * exception, under nesting, for previously-UNSET keys — and fail loudly
  * on cross-thread entry instead of racing the restore. */
class PlanScopeSpec extends SparkTestBase {

  private val Key = "spark.sql.adaptive.enabled"

  test("staticBatch disables AQE inside and restores the prior value after") {
    val before = spark.conf.get(Key)
    val inside = PlanScope.staticBatch(spark) { spark.conf.get(Key) }
    assert(inside === "false")
    assert(spark.conf.get(Key) === before)
  }

  test("confs restore even when the body throws") {
    val before = spark.conf.get(Key)
    intercept[RuntimeException] {
      PlanScope.staticBatch(spark) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(Key) === before)
  }

  test("confs restore when a SET itself throws mid-sequence") {
    // the second key is non-modifiable: its set() throws AFTER the first
    // key was already applied — the first key must not stay pinned on
    // the session forever (the restore has to cover the sets, not just
    // the body)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    intercept[Exception] {
      PlanScope.withConf(spark,
        "spark.sql.shuffle.partitions" -> (before.toInt + 1).toString,
        "spark.sql.warehouse.dir" -> "/definitely/not/applied") { () }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before,
      "a failed set sequence left an earlier key pinned")
  }

  test("nested scopes unwind in order (fixpoints inside pipelines)") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    PlanScope.withConf(spark, "spark.sql.shuffle.partitions" -> "7") {
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "7")
      PlanScope.withConf(spark, "spark.sql.shuffle.partitions" -> "3") {
        assert(spark.conf.get("spark.sql.shuffle.partitions") === "3")
      }
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "7")
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
  }

  test("a key with no explicit value is restored by UNSET, not pinned") {
    // AQE is not set by the test session builder, so it reports as
    // not-explicitly-set (conf.contains reads explicit settings only)
    assume(!spark.conf.getAll.contains(Key), s"$Key unexpectedly pre-set")
    PlanScope.staticBatch(spark) { assert(spark.conf.get(Key) === "false") }
    assert(!spark.conf.getAll.contains(Key),
      "restore must unset a previously-unset key, not pin its resolved default")
    assert(spark.conf.get(Key) === "true")
  }

  test("cross-thread entry into the mutating scope fails loudly") {
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var fromOtherThread: Option[Throwable] = None
    val holder = new Thread(() =>
      PlanScope.staticBatch(spark) { entered.countDown(); release.await() })
    holder.start()
    entered.await()
    try {
      val e = intercept[IllegalStateException] {
        PlanScope.staticBatch(spark) { fail("must not enter") }
      }
      assert(e.getMessage.contains("already scoped"))
    } finally { release.countDown(); holder.join() }
    // after the holder exits, entry works again (guard entry released)
    PlanScope.staticBatch(spark) { assert(spark.conf.get(Key) === "false") }
    assert(fromOtherThread.isEmpty)
  }

  test("a mutating entry fails loudly while another thread's NO-OP scope is in flight") {
    // the two-phase reader guard: a no-op scope (values already hold)
    // stays concurrent with other no-op scopes, but a MUTATING entry —
    // whose restore would change the values mid-body — must collide
    // loudly with it instead of interleaving silently. Dedicated key so
    // suite ordering can't make the "mutating" arm a no-op.
    val KeyB = "spark.sql.cbo.enabled"
    // the no-op check compares EXPLICIT values (get(k, null)) — set one
    // so the reader's entry is genuinely a no-op
    val cur = spark.conf.get(KeyB)
    spark.conf.set(KeyB, cur)
    val flipped = if (cur == "true") "false" else "true"
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val reader = new Thread(() =>
      PlanScope.withConf(spark, KeyB -> cur) { // values hold → no-op path
        entered.countDown(); release.await()
      })
    reader.start()
    entered.await()
    try {
      val e = intercept[IllegalStateException] {
        PlanScope.withConf(spark, KeyB -> flipped) { fail("must not enter") }
      }
      assert(e.getMessage.contains("no-op scope"))
    } finally { release.countDown(); reader.join() }
    // reader gone → mutation enters fine, and restores
    PlanScope.withConf(spark, KeyB -> flipped) {
      assert(spark.conf.get(KeyB) === flipped)
    }
    assert(spark.conf.get(KeyB) === cur)
    spark.conf.unset(KeyB)
  }

  test("same-thread nesting: a mutating scope inside an own no-op scope still works") {
    val KeyB = "spark.sql.cbo.enabled"
    val cur = spark.conf.get(KeyB)
    spark.conf.set(KeyB, cur) // explicit, so the outer is a true no-op
    val flipped = if (cur == "true") "false" else "true"
    try PlanScope.withConf(spark, KeyB -> cur) { // no-op outer
      PlanScope.withConf(spark, KeyB -> flipped) { // mutating inner, same thread
        assert(spark.conf.get(KeyB) === flipped)
      }
      assert(spark.conf.get(KeyB) === cur)
    } finally spark.conf.unset(KeyB)
  }

  test("loopPartitions rounds up to a power of two below the session cap") {
    import graft.operators.Graphs.loopPartitions
    assert(loopPartitions(32, nEdges = 1L, nNodes = 1L) === 1)
    // 3 size units → 4 (pow2 round-up), capped by the session value
    assert(loopPartitions(32, nEdges = 3L << 22, nNodes = 1L) === 4)
    assert(loopPartitions(32, nEdges = 100L << 22, nNodes = 1L) === 32)
    assert(loopPartitions(3, nEdges = 3L << 22, nNodes = 1L) === 3) // cap wins
    // the reachable values are {1,2,4,...} ∪ {sessionSp} — bounded pool
    val vals = (1L to 40L).map(f => loopPartitions(32, f << 22, 1L)).toSet
    assert(vals.subsetOf(Set(1, 2, 4, 8, 16, 32)))
  }

  test("isolated scope: the caller's session keeps AQE mid-scope") {
    val df = spark.range(100).toDF("x")
    PlanScope.isolatedStatic(spark) { clone =>
      assert(clone.conf.get(Key) === "false")
      // the caller's session is untouched — a concurrent query there
      // still plans adaptively while the scope is live
      assert(spark.conf.get(Key) === "true")
      val concurrent = df.groupBy(col("x") % 7).count()
      assert(concurrent.queryExecution.executedPlan.toString
        .contains("AdaptiveSparkPlan"))
      // clone semantics match the caller (seeded conf): same timezone,
      // same shuffle partitions
      assert(clone.conf.get("spark.sql.session.timeZone")
        === spark.conf.get("spark.sql.session.timeZone"))
      assert(clone.conf.get("spark.sql.shuffle.partitions")
        === spark.conf.get("spark.sql.shuffle.partitions"))
    }
    assert(spark.conf.get(Key) === "true")
  }

  test("rebind re-plans a caller frame under the clone's conf") {
    val df = spark.range(1000).toDF("x").withColumn("k", col("x") % 13)
    val (rows, adaptive) = PlanScope.isolatedStatic(spark) { clone =>
      val re = PlanScope.rebind(df, clone)
      val agg = re.groupBy("k").agg(sum("x").as("s"))
      (agg.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1),
        agg.queryExecution.executedPlan.toString.contains("AdaptiveSparkPlan"))
    }
    assert(!adaptive, "plan built on the clone must be static (AQE off)")
    val oracle = df.groupBy("k").agg(sum("x").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows === oracle)
    // the temp-view hop cleaned up after itself
    assert(spark.catalog.listTables("global_temp").count() === 0)
  }

  test("isolated clones POOL by conf fingerprint and reuse in-scope") {
    // same confs → the same clone session (its conf is immutable, so
    // sharing is safe and the SessionState warmup is paid once); a scope
    // opened on a session that already satisfies the confs runs THERE
    // (operator composition re-uses the enclosing scope's clone)
    val (a, b, nested) = PlanScope.isolatedStatic(spark) { c1 =>
      val inner = PlanScope.isolatedStatic(c1) { c2 => c2 }
      (c1, PlanScope.isolatedStatic(spark) { c2 => c2 }, inner)
    }
    assert(a eq b, "equal fingerprints must share one pooled clone")
    assert(nested eq a, "a satisfied scope must run on the enclosing clone")
    val other = PlanScope.isolated(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "2") { c => c }
    assert(!(other eq a), "different fingerprints get their own clone")
  }

  test("sizedPartitions: plan-estimate sizing, power-of-2, session cap") {
    import spark.implicits._
    // a tiny local frame sizes to 1 partition
    assert(PlanScope.sizedPartitions(Seq(1L, 2L, 3L).toDF("x")) === 1)
    // a huge estimate is capped by the session's own setting
    val sessionSp = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val big = Seq.fill(64)("y" * 1024).toDF("t")
    assert(PlanScope.sizedPartitions(big, bytesPerPartition = 16) === sessionSp)
    // between the extremes the count rounds UP to a power of two, so the
    // clone pool stays bounded as data grows
    val mid = PlanScope.sizedPartitions(big, bytesPerPartition = 40000)
    assert(mid >= 1 && mid <= sessionSp && Integer.bitCount(mid) === 1)
  }

  test("rebind of a PERSISTED frame keeps the cache (rows hop, no re-plan)") {
    val df = spark.range(200).toDF("x").persist()
    df.count()
    val re = PlanScope.isolatedStatic(spark) { clone =>
      PlanScope.rebind(df, clone)
    }
    // the hop is the RDD route: a flat scan, not a re-analyzed view (the
    // view wrapper would defeat the CacheManager's canonicalized match
    // and silently recompute the plan inside the scope)
    assert(re.queryExecution.analyzed.getClass.getSimpleName === "LogicalRDD")
    assert(re.collect().length === 200)
    df.unpersist()
  }

  test("rebindRows hands a clone-planned result back without the clone") {
    val out = PlanScope.isolatedStatic(spark) { clone =>
      val re = PlanScope.rebind(spark.range(50).toDF("x"), clone)
        .groupBy((col("x") % 5).as("k")).agg(count(lit(1)).as("n"))
      PlanScope.rebindRows(re, spark)
    }
    // materializes AFTER the scope ended, under the caller's session,
    // replaying the clone-planned lineage
    assert(out.sparkSession eq spark)
    assert(out.schema.fieldNames.toSeq === Seq("k", "n"))
    assert(out.collect().map(_.getLong(1)).sum === 50L)
  }
}
