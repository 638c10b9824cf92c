package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Temporal

class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("peakConcurrency: midnight carry, touching intervals don't overlap, end-only days report") {
    import org.apache.spark.sql.functions._
    // A crosses midnight; B overlaps A on day 1 (peak 2); on day 2 the
    // carried A overlaps C (peak 2), D starts exactly when C and A end
    // (touching, not concurrent), leaving D alone (1)
    val iv = Seq(
      (ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")), // A
      (ts("2024-01-01 23:30:00"), ts("2024-01-01 23:45:00")), // B
      (ts("2024-01-02 00:30:00"), ts("2024-01-02 01:00:00")), // C
      (ts("2024-01-02 01:00:00"), ts("2024-01-02 01:30:00"))  // D
    ).toDF("s", "e")
    val got = graft.ops.Temporal.peakConcurrency(iv, col("s"), col("e"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got === Map("2024-01-01" -> 2L, "2024-01-02" -> 2L))
    // an interval whose end is the only delta on its day: the day still
    // reports, at the carried-in level before the end drains it — the
    // session WAS open from midnight to 06:00, so the peak is 1, not 0
    val tail = Seq((ts("2024-01-03 12:00:00"), ts("2024-01-04 06:00:00"))).toDF("s", "e")
    val got2 = graft.ops.Temporal.peakConcurrency(tail, col("s"), col("e"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got2 === Map("2024-01-03" -> 1L, "2024-01-04" -> 1L))
  }

  private def log = Seq(
    // key 1: x, x (no change), y, x — three value runs
    (1L, ts("2024-01-01 00:00:00"), 1L, "x"),
    (1L, ts("2024-01-01 01:00:00"), 2L, "x"),
    (1L, ts("2024-01-01 02:00:00"), 3L, "y"),
    (1L, ts("2024-01-01 03:00:00"), 4L, "x"),
    // key 2: single row — one open-ended current interval
    (2L, ts("2024-01-01 05:00:00"), 5L, "z")
  ).toDF("k", "ts", "seq", "v")

  test("scd2: consecutive unchanged rows collapse into one validity interval") {
    val out = Temporal.scd2(log, Seq("k"), "ts", Seq("seq"), Seq("v"))
      .orderBy($"k", $"version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4), r.getLong(5)))
    assert(out === Array(
      (1L, "x", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 02:00:00")), 1L, 0L),
      (1L, "y", ts("2024-01-01 02:00:00"), Some(ts("2024-01-01 03:00:00")), 2L, 0L),
      (1L, "x", ts("2024-01-01 03:00:00"), None, 3L, 1L),
      (2L, "z", ts("2024-01-01 05:00:00"), None, 1L, 1L)))
  }

  test("scd2: null-safe change detection — null runs get their own interval") {
    val withNull = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Some("x")),
      (1L, ts("2024-01-01 01:00:00"), 2L, None),
      (1L, ts("2024-01-01 02:00:00"), 3L, None), // unchanged null — same run
      (1L, ts("2024-01-01 03:00:00"), 4L, Some("x"))
    ).toDF("k", "ts", "seq", "v")
    val out = Temporal.scd2(withNull, Seq("k"), "ts", Seq("seq"), Seq("v"))
      .orderBy($"version").select($"v", $"version").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)))
    assert(out === Array((Some("x"), 1L), (None, 2L), (Some("x"), 3L)))
  }

  test("scd2: same-timestamp changes order by the tie column") {
    val sameTs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:00:00"), 1L, "a")
    ).toDF("k", "ts", "seq", "v")
    val out = Temporal.scd2(sameTs, Seq("k"), "ts", Seq("seq"), Seq("v"))
      .orderBy($"version").select($"v", $"is_current").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out === Array(("a", 0L), ("b", 1L)))
  }

  test("scd2: reserved output names are rejected loudly") {
    intercept[IllegalArgumentException] {
      Temporal.scd2(log.withColumn("version", lit(1)),
        Seq("k"), "ts", Seq("seq"), Seq("v"))
    }
  }

  test("funnelStages: greedy subsequence per key, order by (ts, tie)") {
    val ev = Seq(
      // key 1 completes: view ... click ... purchase (with noise between)
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "error"),
      (1L, ts("2024-01-01 02:00:00"), 3L, "click"),
      (1L, ts("2024-01-01 03:00:00"), 4L, "purchase"),
      // key 2: purchase BEFORE view/click — order matters, stage stops at 2
      (2L, ts("2024-01-01 00:00:00"), 5L, "purchase"),
      (2L, ts("2024-01-01 01:00:00"), 6L, "view"),
      (2L, ts("2024-01-01 02:00:00"), 7L, "click"),
      // key 3: never enters
      (3L, ts("2024-01-01 00:00:00"), 8L, "error"),
      // key 4: same-ts tie — seq decides (view before click at one instant)
      (4L, ts("2024-01-01 00:00:00"), 10L, "click"),
      (4L, ts("2024-01-01 00:00:00"), 9L, "view")
    ).toDF("k", "ts", "seq", "v")
    val got = Temporal.funnelStages(ev, "k", "ts", "seq", "v",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 2L))
    intercept[IllegalArgumentException] {
      Temporal.funnelStages(ev, "k", "ts", "seq", "v", Seq("view", "view"))
    }
    intercept[IllegalArgumentException] {
      Temporal.funnelStages(ev, "k", "ts", "seq", "v", Seq.empty)
    }
  }

  test("applyChanges: last-writer-wins upsert/insert/delete/pass-through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val changes = Seq(
      // key 1: upsert then delete — delete wins (later ts)
      (1L, ts("2024-01-01 00:00:00"), 1L, "U", "a2"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "D", "zz"),
      // key 2: delete then upsert — upsert wins
      (2L, ts("2024-01-01 00:00:00"), 3L, "D", "zz"),
      (2L, ts("2024-01-01 01:00:00"), 4L, "U", "b2"),
      // key 3: same-ts tie — higher tie wins
      (3L, ts("2024-01-01 00:00:00"), 6L, "U", "c-win"),
      (3L, ts("2024-01-01 00:00:00"), 5L, "U", "c-lose"),
      // key 5: insert (absent from base)
      (5L, ts("2024-01-01 00:00:00"), 7L, "U", "e"),
      // key 6: delete of a key never in base — stays absent
      (6L, ts("2024-01-01 00:00:00"), 8L, "D", "zz")
    ).toDF("k", "ts", "seq", "op", "v")
    val got = Temporal.applyChanges(base, changes,
        keyCols = Seq("k"), tsCol = "ts", tieCols = Seq("seq"), opCol = "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // key 4 passes through untouched; 1 and 6 deleted
    assert(got === Map(2L -> "b2", 3L -> "c-win", 4L -> "d", 5L -> "e"))
    intercept[IllegalArgumentException] {
      Temporal.applyChanges(base, changes.drop("op"),
        Seq("k"), "ts", Seq("seq"), "op")
    }
    intercept[IllegalArgumentException] {
      Temporal.applyChanges(base.select("k"), changes,
        Seq("k"), "ts", Seq("seq"), "op")
    }
  }

  test("cohortRetention: first-day cohorts, distinct-day offsets, one count per key") {
    val ev = Seq(
      // user 1: first day Jan 1, back Jan 2 and Jan 4 (twice on Jan 2 —
      // must still count once per (cohort, offset))
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 23:00:00")),
      (1L, ts("2024-01-04 01:00:00")),
      // user 2: same cohort day, never returns
      (2L, ts("2024-01-01 23:59:59")),
      // user 3: later cohort, returns next day
      (3L, ts("2024-01-03 00:00:00")),
      (3L, ts("2024-01-04 12:00:00"))
    ).toDF("u", "ts")
    val got = Temporal.cohortRetention(ev, "u", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> 2L, // users 1 and 2 on their own day-0
      ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 3L) -> 1L,
      ("2024-01-03", 0L) -> 1L,
      ("2024-01-03", 1L) -> 1L))
  }

  test("snapshotDiff: added/removed/changed/same with null-safe compares") {
    import graft.ops.RelationalOps
    val a = Seq((1L, Some("x")), (2L, Some("y")), (3L, None: Option[String]),
      (4L, Some("z"))).toDF("k", "v")
    val b = Seq((1L, Some("x")), (2L, Some("CHANGED")), (3L, Some("now-set")),
      (5L, Some("new"))).toDF("k", "v")
    val got = RelationalOps.snapshotDiff(a, b, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "same", 2L -> "changed",
      3L -> "changed", // null -> value IS a change under <=>
      4L -> "removed", 5L -> "added"))
    intercept[IllegalArgumentException] {
      RelationalOps.snapshotDiff(a, b.withColumnRenamed("v", "w"), Seq("k"))
    }
  }

  test("resampleDailyFfill: dense span grid, intraday close, gaps forward-fill") {
    val ev = Seq(
      // key 1: days 1 (two events — later wins), 2 missing, 3 present
      (1L, ts("2024-01-01 09:00:00"), 1L, 10L),
      (1L, ts("2024-01-01 18:00:00"), 2L, 20L),
      (1L, ts("2024-01-03 12:00:00"), 3L, 30L),
      // key 2: single day
      (2L, ts("2024-01-05 00:00:00"), 4L, 77L)
    ).toDF("k", "ts", "seq", "v")
    val got = Temporal.resampleDailyFfill(ev, "k", "ts", "seq", "v")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._2))
    assert(got === Seq(
      (1L, "2024-01-01", Some(20L), Some(20L)), // intraday close = later event
      (1L, "2024-01-02", None, Some(20L)),      // gap forward-fills
      (1L, "2024-01-03", Some(30L), Some(30L)),
      (2L, "2024-01-05", Some(77L), Some(77L))))
  }

  test("eventPaths: ordered n-grams per key; short keys contribute nothing") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 02:00:00"), 3L, "c"),
      (1L, ts("2024-01-01 03:00:00"), 4L, "d"),
      // key 2: exactly n-1 events — no path
      (2L, ts("2024-01-01 00:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 01:00:00"), 6L, "b"),
      // key 3: same-ts tie ordered by event_id
      (3L, ts("2024-01-01 00:00:00"), 9L, "z"),
      (3L, ts("2024-01-01 00:00:00"), 7L, "x"),
      (3L, ts("2024-01-01 00:00:00"), 8L, "y")
    ).toDF("k", "ts", "seq", "v")
    val got = Temporal.eventPaths(ev, "k", "ts", "seq", "v", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a>b>c"), (1L, "b>c>d"), (3L, "x>y>z")))
    val two = Temporal.eventPaths(ev, "k", "ts", "seq", "v", n = 2)
      .filter($"k" === 2L).collect().map(_.getString(1)).toSeq
    assert(two === Seq("a>b"))
    intercept[IllegalArgumentException] {
      Temporal.eventPaths(ev, "k", "ts", "seq", "v", n = 1)
    }
  }

  test("asOfTime: point-in-time lookup returns exactly the covering version") {
    val hist = Temporal.scd2(log, Seq("k"), "ts", Seq("seq"), Seq("v"))
    // mid-run: 01:30 inside [00:00, 02:00) → version 1 value x
    val mid = hist.filter($"k" === 1L)
      .filter(Temporal.asOfTime(hist, lit(ts("2024-01-01 01:30:00"))))
      .collect()
    assert(mid.length === 1 && mid(0).getAs[String]("v") === "x" &&
      mid(0).getAs[Long]("version") === 1L)
    // at a boundary: 02:00 starts version 2 (intervals are [from, to))
    val edge = hist.filter($"k" === 1L)
      .filter(Temporal.asOfTime(hist, lit(ts("2024-01-01 02:00:00"))))
      .collect()
    assert(edge.length === 1 && edge(0).getAs[Long]("version") === 2L)
    // far future: current row matches
    val fut = hist.filter($"k" === 1L)
      .filter(Temporal.asOfTime(hist, lit(ts("2030-01-01 00:00:00"))))
      .collect()
    assert(fut.length === 1 && fut(0).getAs[Long]("is_current") === 1L)
  }
}
