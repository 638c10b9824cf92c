package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Splits}

/** Split-operator invariants: determinism, totality, fence proportions,
  * salt decorrelation, and the leakage-safety property that near-dup
  * components never straddle a split boundary. */
class SplitsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val w955 = Seq("train" -> 900, "val" -> 50, "test" -> 50)

  test("split operators reject caller-owned output columns; extra components columns cannot leak") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Splits.hashSplit(docs.withColumn("split", lit("train")), "doc_id",
        Seq("train" -> 1000))
    }
    intercept[IllegalArgumentException] {
      Splits.leakageSafeSplit(docs.withColumn("component", lit(9L)),
        Seq((1L, 1L)).toDF("doc_id", "component"), Seq("train" -> 1000))
    }
    // a components frame carrying extra columns must not leak them out
    val comps = Seq((1L, 1L, "junk")).toDF("doc_id", "component", "extra")
    val out = Splits.leakageSafeSplit(docs, comps, Seq("train" -> 1000))
    assert(!out.columns.contains("extra"))
  }

  test("hashSplit is deterministic, total, and lands near its fences") {
    val docs = Tables.documents(spark, sf)
    val a = Splits.hashSplit(docs, "doc_id", w955)
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1))
    val b = Splits.hashSplit(docs, "doc_id", w955)
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(a.sorted.toSeq === b.sorted.toSeq)
    assert(a.forall(_._2 != null)) // total: every row lands in a split
    val byName = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byName.keySet === Set("train", "val", "test"))
    // md5 is uniform: 500 docs at 900‰ expect ~450 train; allow wide noise
    assert(byName("train") > 350 && byName("train") < 500)
  }

  test("salt decorrelates assignments; same salt reproduces them") {
    val docs = Tables.documents(spark, sf)
    def assign(salt: String) = Splits.hashSplit(docs, "doc_id", w955, salt)
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s0 = assign("run-a")
    assert(assign("run-a") === s0)
    val s1 = assign("run-b")
    assert(s0.keySet === s1.keySet)
    assert(s0.exists { case (k, v) => s1(k) != v }, "salts did not decorrelate")
  }

  test("leakageSafeSplit: no near-dup component straddles a split fence") {
    val docs = Tables.documents(spark, sf)
    val comps = Dedup.components(docs, Dedup.minhashLshPairs(docs))
    val out = Splits.leakageSafeSplit(docs.select($"doc_id"), comps, w955)
    assert(out.count() === docs.count()) // every doc assigned exactly once
    val straddlers = out.groupBy($"component")
      .agg(count_distinct($"split").as("n_splits"))
      .filter($"n_splits" > 1).count()
    assert(straddlers === 0L)
    // and the split is genuinely component-keyed: some component has >1 doc
    assert(out.groupBy($"component").count().filter($"count" > 1).count() > 0L)
  }

  test("null keys land deterministically in a split (totality under nulls)") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("doc_id")
    val out = Splits.hashSplit(df, "doc_id", w955).collect()
    assert(out.length === 3)
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("split"))))
    // the null-key assignment is stable run to run
    val again = Splits.hashSplit(df, "doc_id", w955)
      .filter($"doc_id".isNull).select($"split").head().getString(0)
    assert(out.find(_.isNullAt(0)).get.getAs[String]("split") === again)
  }

  test("leakageSafeSplit keeps docs absent from a stale components table") {
    val docs = Seq(10L, 11L, 12L).toDF("doc_id")
    val staleComps = Seq((10L, 10L), (11L, 10L)).toDF("doc_id", "component")
    val out = Splits.leakageSafeSplit(docs, staleComps, w955)
      .select($"doc_id", $"component", $"split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.size === 3) // nothing silently dropped
    assert(out(10L)._1 === 10L && out(11L)._1 === 10L)
    assert(out(10L)._2 === out(11L)._2) // same component, same split
    assert(out(12L)._1 === 12L) // fallback: own singleton component
    assert(out(12L)._2 != null)
  }

  test("trainingOrder: dense per-shard positions ordered by hash, deterministic, salt-decorrelated") {
    val docs = Tables.documents(spark, sf).select($"doc_id")
    val out = Splits.trainingOrder(docs, "doc_id", nShards = 4, salt = "e0")
      .select($"doc_id", $"shard", $"pos")
    val rows = out.as[(Long, Long, Long)].collect()
    assert(rows.length === docs.count())
    // every shard's positions are exactly 0..n-1
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (0L until rs.length).toSeq, s"shard $shard")
    }
    // pos order within a shard follows the salted hash (ties by key)
    val hashed = docs.select($"doc_id",
        graft.functions.TextFunctions.hash60(concat(lit("e0:"), $"doc_id".cast("string"))).as("h"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val byPos = rs.sortBy(_._3).map(r => (hashed(r._1), r._1))
      assert(byPos.toSeq === byPos.sortBy(identity).toSeq, s"shard $shard hash order")
    }
    // deterministic across runs; a different salt yields a different order
    val again = Splits.trainingOrder(docs, "doc_id", nShards = 4, salt = "e0")
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
    val epoch1 = Splits.trainingOrder(docs, "doc_id", nShards = 4, salt = "e1")
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    assert(epoch1.sortBy(_._1).toSeq !== rows.sortBy(_._1).toSeq)
    // guards: reserved output columns and non-positive shard counts
    intercept[IllegalArgumentException] {
      Splits.trainingOrder(docs.withColumn("shard", lit(1)), "doc_id", 4)
    }
    intercept[IllegalArgumentException] {
      Splits.trainingOrder(docs, "doc_id", 0)
    }
  }

  test("split weights must be positive and sum to 1000 permille") {
    intercept[IllegalArgumentException] {
      Splits.splitColumn(lit(1L), Seq("a" -> 500, "b" -> 400))
    }
    intercept[IllegalArgumentException] {
      Splits.splitColumn(lit(1L), Seq("a" -> 1000, "b" -> 0))
    }
    intercept[IllegalArgumentException] {
      Splits.splitColumn(lit(1L), Seq.empty)
    }
  }

  test("salt containing the ':' separator is rejected (frozen v1 hash scheme)") {
    // salt "a:b" + key "c" would hash identically to salt "a" + key "b:c"
    intercept[IllegalArgumentException] {
      Splits.splitColumn(lit(1L), w955, salt = "a:b")
    }
  }
}
