package graft


import org.apache.spark.sql.functions._

/** Bucketing = the "pre-shuffle once, join many times shuffle-free"
  * strategy for repeated big-big joins at 100 TB (SURVEY.md scale notes):
  * both sides bucketed by the join key into the same bucket count join
  * with NO exchange on either side — the shuffle was paid once at write
  * time and amortizes over every subsequent join.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("writeDayPartitioned: day filters prune to matching directories only") {
    import graft.ops.Layout
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"))
    val dir = java.nio.file.Files.createTempDirectory("day-part").toString + "/out"
    Layout.writeDayPartitioned(ev, "ts", dir)
    val back = Layout.readDayPartitioned(spark, dir)
    // lossless round trip (day is additive)
    assert(back.count() === ev.count())
    // partition values read back type-inferred (DATE here)
    val dayVal = back.select(col("day")).distinct().orderBy(col("day"))
      .limit(1).collect()(0).get(0)
    val day = dayVal.toString // directory form: yyyy-MM-dd
    val pruned = back.filter(col("day") === lit(dayVal))
    // collect() runs the dataset's OWN cached queryExecution (count()
    // would plan a separate aggregate whose metrics we can't reach)
    assert(pruned.collect().nonEmpty)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    // the day predicate rides as a PARTITION filter (planning-time prune,
    // not a post-read filter) ...
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "day")),
      s"day predicate not in partition filters: ${scan.partitionFilters}")
    // ... and the executed scan opened exactly that day's single file
    // (maxFilesPerDay = 1), out of ~31 day directories written
    assert(scan.metrics("numFiles").value === 1L,
      s"expected 1 file read for day=$day, got ${scan.metrics("numFiles").value}")
    assert(back.inputFiles.length > 1)
    intercept[IllegalArgumentException] {
      Layout.writeDayPartitioned(ev, "ts", dir + "2", maxFilesPerDay = 0)
    }
  }

  test("day-partitioned fact ⋈ filtered dim triggers dynamic partition pruning") {
    import graft.ops.Layout
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"))
    val dir = java.nio.file.Files.createTempDirectory("day-dpp").toString + "/out"
    Layout.writeDayPartitioned(ev, "ts", dir)
    val fact = Layout.readDayPartitioned(spark, dir)
    // a dim whose filter picks ONE day — the classic star-join shape
    // where the fact's partitions to read are only known at runtime
    import spark.implicits._
    // the dim must be a real source (a LocalRelation's filter constant-
    // folds away and DPP sees no selective predicate to derive from)
    val dimDir = java.nio.file.Files.createTempDirectory("day-dim").toString + "/dim"
    Seq(("2024-01-01", "launch"), ("2024-01-03", "promo"), ("2024-01-05", "sale"))
      .toDF("d", "label").select(to_date($"d").as("day"), $"label")
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter($"label" === "launch"), Seq("day"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in the fact scan:\n$plan")
    // and the runtime result is exactly that day's rows
    val expect = fact.filter($"day" === to_date(lit("2024-01-01"))).count()
    assert(joined.count() === expect && expect > 0)
  }

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

  test("zorder kernel: worked examples and bit-by-bit builtin parity") {
    import graft.expressions.BitKernels.interleave
    // x occupies odd (higher) positions: x=0b11,y=0 -> 0b1010; y-only -> 0b0101
    assert(interleave(3L, 0L, 2) === 10L)
    assert(interleave(0L, 3L, 2) === 5L)
    assert(interleave(1L, 1L, 1) === 3L)
    assert(interleave(0L, 0L, 16) === 0L)
    // masking: only the low `bits` bits participate
    assert(interleave(1L << 20, 0L, 16) === 0L)
    // parity with an unrolled builtin-shift computation on real keys
    import org.apache.spark.sql.functions._
    val bitTerms = (0 until 16).map { i =>
      shiftleft(shiftright(col("x"), i).bitwiseAND(1L), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(col("y"), i).bitwiseAND(1L), 2 * i))
    }.reduce(_.bitwiseOR(_))
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
      .select((col("o_custkey") % 65536).as("x"), (col("o_orderkey") % 65536).as("y"))
    val diffs = df.select(
        graft.expressions.BitExpressions.zorder(col("x"), col("y"), 16).as("fast"),
        bitTerms.cast("long").as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diffs === 0L)
  }

  test("zorder: the major dimension's top bit dominates the key") {
    import graft.expressions.BitKernels.interleave
    // any x >= 2^15 outranks any x < 2^15 regardless of y (16-bit grid)
    val lowMax = (for (x <- 0 until 32; y <- 0 until 65536 by 4093)
      yield interleave(x.toLong, y.toLong, 16)).max
    val hiMin = (for (x <- 32768 until 32800; y <- 0 until 65536 by 4093)
      yield interleave(x.toLong, y.toLong, 16)).min
    assert(lowMax < (1L << 31) && hiMin >= (1L << 31))
  }

  test("clusterZOrder: disjoint z slices with 2-D locality on a full grid") {
    import org.apache.spark.sql.functions._
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    val out = graft.ops.Layout.clusterZOrder(grid, "x", "y", numFiles = 4, bits = 6)
    val parts = out
      .select(spark_partition_id().as("p"), col("z_key"))
      .groupBy("p").agg(
        min("z_key").as("zlo"), max("z_key").as("zhi"), count(lit(1)).as("n"))
      .collect()
    assert(parts.length === 4 && parts.map(_.getAs[Long]("n")).sum === 4096L)
    // slices carve the curve into disjoint, ordered z ranges — the file
    // min/max stats a reader prunes against never overlap
    val sorted = parts.sortBy(_.getAs[Long]("zlo"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("zhi") < b.getAs[Long]("zlo"))
    case _ => }
    // the property that makes those stats prune in 2-D: every 8-aligned
    // 8x8 box is ONE contiguous z run (len 64), so a 2-D predicate's rows
    // land in the minimal span of slices instead of striping across all
    // of them the way a single-axis sort's secondary dimension does
    import graft.expressions.BitKernels.interleave
    for (bx <- 0 until 64 by 8; by <- 0 until 64 by 8) {
      val zs = for (x <- bx until bx + 8; y <- by until by + 8)
        yield interleave(x.toLong, y.toLong, 6)
      assert(zs.max - zs.min === 63L && zs.distinct.size === 64,
        s"box ($bx,$by) is not one contiguous z run")
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
