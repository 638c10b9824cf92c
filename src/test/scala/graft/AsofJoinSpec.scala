package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  private val quotes = Seq(
    (1L, ts("09:00:00"), 100L),
    (1L, ts("10:00:00"), 110L),
    (1L, ts("11:00:00"), 120L),
    (2L, ts("10:30:00"), 500L)
  ).toDF("key", "qts", "px")

  private val trades = Seq(
    (10L, 1L, ts("08:59:59")), // before any quote -> null
    (11L, 1L, ts("10:00:00")), // exactly at a quote -> that quote (rts <= ts)
    (12L, 1L, ts("10:59:59")), // between -> 10:00 quote
    (13L, 2L, ts("12:00:00")), // different key -> its own quote
    (14L, 3L, ts("12:00:00")) // key with no right rows -> null
  ).toDF("trade_id", "key", "tts")

  test("asof join picks the latest right row at-or-before each left ts") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts", Seq("px"))
      .orderBy("trade_id")
      .select($"trade_id", $"asof_px", $"asof_ts")
      .collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(1)))) === Array(
      10L -> None, 11L -> Some(110L), 12L -> Some(110L), 13L -> Some(500L), 14L -> None))
    assert(out(1).getTimestamp(2) === ts("10:00:00"))
    assert(out(3).getTimestamp(2) === ts("10:30:00"))
  }

  test("asof join keeps every left row and every left column") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts", Seq("px"))
    assert(out.count() === trades.count())
    assert(out.columns.toSeq === (trades.columns.toSeq ++ Seq("asof_px", "asof_ts")))
  }

  test("asof join ≡ naive greatest-rts-at-or-before join on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val l = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id".as("u"), $"ts".as("rts"))
      .agg(max($"value").as("v"))
    val fast = AsofJoin.asofJoin(l, r.withColumnRenamed("u", "user_id"),
        Seq("user_id"), "ts", "rts", Seq("v"))
      .select($"event_id", $"asof_v", $"asof_ts")
      .collect()
      .map(row => row.getLong(0) ->
        (Option(row.get(1)), Option(row.get(2)))).toMap
    // definitional ground truth, computed per left row on the driver
    // (spec scale): the max rts <= ts for that user, and its value
    val rightByUser = r.collect()
      .map(row => (row.getLong(0), row.getTimestamp(1), row.getDouble(2)))
      .groupBy(_._1)
    val lefts = l.collect().map(row => (row.getLong(0), row.getLong(1), row.getTimestamp(2)))
    assert(fast.size === lefts.length)
    lefts.foreach { case (eid, uid, lts) =>
      val best = rightByUser.getOrElse(uid, Array.empty)
        .filter(!_._2.after(lts)).sortBy(_._2.getTime).lastOption
      assert(fast(eid) === ((best.map(_._3), best.map(_._2))),
        s"event $eid user $uid at $lts")
    }
  }

  test("a NULL right value wins atomically — never an older row's value") {
    // the 11:00 row genuinely carries NULL; ASOF semantics return
    // (11:00, NULL), not 10:00's value paired with 11:00's timestamp
    val rights = Seq(
      (1L, ts("10:00:00"), Some(100L)),
      (1L, ts("11:00:00"), Option.empty[Long])
    ).toDF("key", "qts", "px")
    val l = Seq((20L, 1L, ts("11:30:00"))).toDF("trade_id", "key", "tts")
    val out = AsofJoin.asofJoin(l, rights, Seq("key"), "tts", "qts", Seq("px"))
      .select($"asof_px", $"asof_ts").collect()(0)
    assert(out.isNullAt(0), s"older row's value resurrected: $out")
    assert(out.getTimestamp(1) === ts("11:00:00"))
  }

  test("bucketed asof ≡ plain asof on real events, across bucket widths") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val l = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts".as("rts"))
      .agg(max($"value").as("v"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"asof_v", $"asof_ts").collect()
        .map(row => row.getLong(0) -> (Option(row.get(1)), Option(row.get(2)))).toMap
    val plain = canon(AsofJoin.asofJoin(l, r, Seq("user_id"), "ts", "rts", Seq("v")))
    // widths smaller than, comparable to, and larger than the data span:
    // each exercises a different carry-in/bucket-boundary mix
    for (width <- Seq("30 minutes", "2 hours", "7 days")) {
      val bucketed = canon(AsofJoin.asofJoinBucketed(
        l, r, Seq("user_id"), "ts", "rts", Seq("v"), width))
      assert(bucketed === plain, s"width $width diverges from plain asof")
    }
  }

  test("bucketed asof: in-bucket sort on toy data, bucket column in the plan") {
    // toy rows land in distinct buckets with carry-ins crossing several
    // empty buckets — the exact boundary semantics asofJoin pins
    val out = AsofJoin.asofJoinBucketed(
        trades, quotes, Seq("key"), "tts", "qts", Seq("px"), "15 minutes")
      .orderBy("trade_id")
      .select($"trade_id", $"asof_px", $"asof_ts")
      .collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(1)))) === Array(
      10L -> None, 11L -> Some(110L), 12L -> Some(110L), 13L -> Some(500L), 14L -> None))
    assert(out(1).getTimestamp(2) === ts("10:00:00"))
    // the hot-key split is real: the main window partitions on the
    // bucket column, not on the key alone
    val plan = AsofJoin.asofJoinBucketed(
        trades, quotes, Seq("key"), "tts", "qts", Seq("px"), "15 minutes")
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"), s"bucket column missing from plan:\n$plan")
  }

  test("asof join rejects reserved-name collisions and empty keys") {
    intercept[IllegalArgumentException] {
      // a left column named like an output column would be silently shadowed
      AsofJoin.asofJoin(trades.withColumnRenamed("trade_id", "asof_px"),
        quotes, Seq("key"), "tts", "qts", Seq("px"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades.withColumnRenamed("trade_id", "__ts"),
        quotes, Seq("key"), "tts", "qts", Seq("px"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, quotes, Seq.empty, "tts", "qts", Seq("px"))
    }
  }
}
