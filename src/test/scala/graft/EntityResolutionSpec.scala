package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

class EntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("fuzzyPairs finds substitution, insertion, and deletion at dist 1") {
    val df = Seq(
      (1L, "kitten"), (2L, "mitten"),   // substitution
      (3L, "pale"), (4L, "pales"),      // insertion at the end
      (5L, "abcd"), (6L, "abd"),        // deletion in the middle
      (7L, "zzzzz"))                    // no neighbor
      .toDF("id", "name")
    val got = pairs(EntityResolution.fuzzyPairs(df, "id", "name", maxDist = 1))
    assert(got === Set((1L, 2L, 1L), (3L, 4L, 1L), (5L, 6L, 1L)))
  }

  test("fuzzyPairs maxDist=2 reaches distance-2 pairs, not distance-3") {
    val df = Seq(
      (1L, "saturday"), (2L, "satrday"),  // 1 deletion
      (3L, "sunday"),                     // lev(saturday, sunday)=3 — out
      (4L, "sturdy"))                     // lev(saturday, sturdy)=3 — out
      .toDF("id", "name")
    val d2 = pairs(EntityResolution.fuzzyPairs(df, "id", "name", maxDist = 2))
    // saturday~satrday = 1 (one deletion); saturday~sturdy = 2; everything
    // touching sunday is 3, and lev(satrday, sturdy) = 3 too — both out
    assert(d2 === Set((1L, 2L, 1L), (1L, 4L, 2L)))
  }

  test("fuzzyPairs: empty strings and nulls") {
    val df = Seq((1L, ""), (2L, ""), (3L, "a"), (4L, null))
      .toDF("id", "name")
    val got = pairs(EntityResolution.fuzzyPairs(df, "id", "name", maxDist = 1))
    // "" ≡ "" at 0; "a" is one insertion from ""; null never matches
    assert(got === Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("fuzzyPairs ≡ all-pairs Levenshtein on real customer names") {
    val cust = Tables.customer(spark, "/root/testdata/sf0.001")
    val got = pairs(EntityResolution.fuzzyPairs(cust, "c_custkey", "c_name"))
    val a = cust.select($"c_custkey".as("id_a"), $"c_name".as("na"))
    val b = cust.select($"c_custkey".as("id_b"), $"c_name".as("nb"))
    val naive = a.join(b, $"id_a" < $"id_b")
      .withColumn("dist", levenshtein($"na", $"nb").cast("long"))
      .filter($"dist" <= 1).select($"id_a", $"id_b", $"dist")
    assert(got === pairs(naive) && got.nonEmpty)
  }

  test("fuzzyLink ≡ all-pairs cross Levenshtein; equal ids on opposite sides are distinct entities") {
    // left catalog and a mutated right catalog sharing id values on
    // purpose — cross-corpus linkage must not self-exclude on id equality
    val left = Seq((1L, "acme corp"), (2L, "bolt ltd"), (3L, "cairn plc"))
      .toDF("id", "name")
    val right = Seq(
      (1L, "acme corpx"),  // id collides with left 1, dist 1 — must link
      (2L, "bolt ltdxy"),  // dist 2 — must NOT link at maxDist=1
      (9L, "cairn plc"),   // exact copy, dist 0
      (10L, "zzz")).toDF("id", "name")
    val got = EntityResolution.fuzzyLink(left, "id", "name", right, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = left.select($"id".as("lid"), $"name".as("ln"))
      .crossJoin(right.select($"id".as("rid"), $"name".as("rn")))
      .withColumn("dist", levenshtein($"ln", $"rn").cast("long"))
      .filter($"dist" <= 1)
      .collect().map(r => (r.getAs[Long]("lid"), r.getAs[Long]("rid"), r.getAs[Long]("dist"))).toSet
    assert(got === naive)
    assert(got === Set((1L, 1L, 1L), (3L, 9L, 0L)))
  }

  test("maxBucket drops only pairs that relied on a hot key") {
    // ten strings sharing the hot full-string key "dup" plus one clean
    // pair; capping at 5 kills the dup-group pairs, keeps the clean pair
    val rows = (1L to 10L).map(i => (i, "dup")) :+ (20L, "pale") :+ (21L, "pales")
    val df = rows.toDF("id", "name")
    val capped = pairs(EntityResolution.fuzzyPairs(df, "id", "name",
      maxDist = 1, maxBucket = 5))
    assert(capped.contains((20L, 21L, 1L)))
    assert(!capped.exists(p => p._1 <= 10L))
    val exact = pairs(EntityResolution.fuzzyPairs(df, "id", "name", maxDist = 1))
    assert(capped.subsetOf(exact) && exact.size == 45 + 1)
  }

  test("DEFAULT fence: hot cluster fenced with full recall elsewhere, audit reports the dropped mass") {
    // 100 identical names — every deletion-variant bucket lands at 100,
    // above DefaultMaxBucket=64, so the whole cluster is fenced by
    // default — plus two clean pairs that must keep full recall
    val rows = (1L to 100L).map(i => (i, "hotname")) ++
      Seq((200L, "pale"), (201L, "pales"), (300L, "kitten"), (301L, "mitten"))
    val df = rows.toDF("id", "name")
    val fenced = pairs(EntityResolution.fuzzyPairs(df, "id", "name")) // defaults
    val exact = pairs(EntityResolution.fuzzyPairs(df, "id", "name", maxBucket = 0))
    assert(fenced.contains((200L, 201L, 1L)) && fenced.contains((300L, 301L, 1L)))
    assert(fenced.subsetOf(exact))
    // recall accounting: the ONLY lost pairs are the hot cluster's own
    // C(100,2) — the fence never touches a pair outside the hot buckets
    val lost = exact -- fenced
    assert(lost.forall(p => p._1 <= 100L && p._2 <= 100L))
    assert(lost.size === 100 * 99 / 2)
    // the audit names every dropped bucket: size + example members
    val audit = EntityResolution.fuzzyHotBuckets(df, "name")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(audit.nonEmpty &&
      audit.forall { case (n, a, b) => n == 100L && a == "hotname" && b == "hotname" })
    // nothing to audit on a benign catalog
    assert(EntityResolution.fuzzyHotBuckets(
      Seq((1L, "pale"), (2L, "pales")).toDF("id", "name"), "name").count() === 0L)
  }

  test("fence firing is observable at run time: dropped-bucket metric piggybacks, zero extra jobs") {
    // the fence's observe() hook reports drops through QueryExecution's
    // observed metrics — an accumulator on the fence aggregate, no
    // count() job — so production runs see the recall trade without
    // asking for the audit. Capture with our own listener.
    val seen = new java.util.concurrent.atomic.AtomicLong(-1L)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_fuzzy_fence_")) seen.set(row.getLong(0))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val rows = (1L to 100L).map(i => (i, "hotname")) :+ (200L, "pale") :+ (201L, "pales")
      EntityResolution.fuzzyPairs(rows.toDF("id", "name"), "id", "name").count()
      // execution listeners post asynchronously; poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (seen.get() < 0 && System.nanoTime() < deadline) Thread.sleep(50)
      // "hotname" (7 chars) indexes under 8 deletion variants, every one
      // a 100-row bucket above the default fence of 64
      assert(seen.get() === 8L, s"observed dropped_buckets = ${seen.get()}")
    } finally spark.listenerManager.unregister(listener)
  }
}
