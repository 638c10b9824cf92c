package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal versioning operators — the warehouse half of a change-log:
  * turning an append-only event stream into SCD-type-2 validity intervals
  * ("what was this entity's attribute value at time T?"). The reference's
  * KTable models only the LATEST value per key (CoreOps.latestByKey); SCD2
  * is the history-preserving generalization every lakehouse dimension
  * table needs.
  */
object Temporal {

  /** Slowly-changing-dimension type-2 history from an append-only change
    * log: per key, collapse consecutive rows whose tracked values are
    * unchanged, then emit one row per VALUE RUN with its validity interval
    * `[valid_from, valid_to)` (`valid_to` null = still current), a dense
    * per-key `version`, and an `is_current` flag.
    *
    * Change detection is null-safe (`<=>` over a struct of the tracked
    * columns), so a value changing to/from null opens a new interval
    * rather than vanishing into three-valued logic.
    *
    * Scale shape: ONE shuffle on `keyCols`; both windows (the lag that
    * finds change points, the lead/row_number over change rows) share the
    * same partitioning, and the second runs over the CHANGE rows only —
    * per-key cost is a local sort, never a global one. A key's history
    * lives in one partition, which is the right layout for the downstream
    * as-of probe ([[graft.operators.AsofJoin]]).
    *
    * @param tieCols  deterministic within-timestamp order (e.g. a change
    *                 sequence number) — required so same-timestamp changes
    *                 replay identically on any engine
    * @return keyCols ++ valueCols ++ (valid_from, valid_to: raw timestamp,
    *         version: long starting at 1, is_current: long 0/1)
    */
  def scd2(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    require(valueCols.nonEmpty, "scd2 needs at least one tracked value column")
    val reserved = Seq("__prev", "valid_from", "valid_to", "version", "is_current")
      .filter(df.columns.contains)
    require(reserved.isEmpty, s"scd2 reserves column names: ${reserved.mkString(", ")}")
    val keys = keyCols.map(col)
    val order: Seq[Column] = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val tracked = struct(valueCols.map(col): _*)
    val changes = df
      .withColumn("__prev", lag(tracked, 1).over(w))
      // first row per key (lag null-literal) or any tracked value differing:
      // NOT(a <=> b) is true for null-vs-value and false for null-vs-null
      .filter(col("__prev").isNull || !(tracked <=> col("__prev")))
      .drop("__prev")
    val wc = Window.partitionBy(keys: _*).orderBy(order: _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wc))
      .withColumn("version", row_number().over(wc).cast("long"))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
      .select((keyCols ++ valueCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version"), col("is_current")): _*)
  }

  /** Ordered-sequence funnel analysis: per key, the furthest stage of
    * `stages` reachable as a SUBSEQUENCE of the key's events in
    * (`tsCol`, `tieCol`) order — "view → click → purchase", the
    * behavioral-analytics staple SQL engines bolt on as MATCH_RECOGNIZE.
    * Greedy earliest-match is used (fold over the ordered events); greedy
    * matching decides subsequence existence exactly, so the result is
    * order-theoretic, not heuristic.
    *
    * Scale shape: ONE exchange on the key; the per-key aggregate buffers
    * that key's own events (the same per-group bound as tf-idf's per-doc
    * token set), then the stage is one fold per key — no window over the
    * corpus, no self-joins per stage (the k-join SQL formulation pays
    * k-1 joins; this pays none).
    *
    * @return one row per key: (keyCol, stage) with stage in
    *         [0, stages.length] — 0 = never entered the funnel
    */
  def funnelStages(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelStages needs at least one stage")
    require(stages.distinct.size == stages.size,
      "funnelStages: repeated stage names make the greedy fold ambiguous to read — " +
        "model repeat steps as distinct stage labels upstream")
    val ordered = df
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col(tsCol), col(tieCol), col(typeCol))))
        .as("__seq"))
    val step = (st: Column, e: Column) =>
      stages.zipWithIndex.foldLeft(st) { case (acc, (name, i)) =>
        when(st === i && e.getField(typeCol) === name, lit(i + 1)).otherwise(acc)
      }
    ordered.select(col(keyCol),
      aggregate(col("__seq"), lit(0), step).cast("long").as("stage"))
  }

  /** MERGE-style CDC apply: fold a change log (upserts + deletes) into a
    * base snapshot — the batch equivalent of `MERGE INTO base USING
    * changes` with last-writer-wins semantics. Per key, the LATEST change
    * in (`tsCol`, `tieCols`) order decides: `deleteOp` removes the key,
    * any other op replaces the key's value columns (insert if the key was
    * absent from base); keys with no change pass through untouched.
    *
    * Value columns are inferred as base's non-key columns; `changes` must
    * carry the same key + value columns plus (`opCol`, `tsCol`,
    * `tieCols`). Intermediate change states are never materialized — the
    * per-key reduction is ONE `max_by` aggregate (map-side partial, so
    * the shuffle carries one row per changed key, not the change
    * volume), then ONE key-equi join against base. A delta-sized change
    * set broadcast-joins under AQE; SCD2 ([[scd2]]) is the
    * history-preserving sibling when intermediate states must survive.
    *
    * @return base schema: keyCols ++ value columns, post-merge
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCols: Seq[String], opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    val valueCols = base.columns.filterNot(keyCols.contains).toSeq
    require(valueCols.nonEmpty, "base must have at least one non-key value column")
    require(!valueCols.contains("__c") && !base.columns.contains("__c"),
      "applyChanges reserves column name __c")
    val missing = (keyCols ++ valueCols ++ Seq(opCol, tsCol) ++ tieCols)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes is missing columns: ${missing.mkString(", ")}")
    val keys = keyCols.map(col)
    val latest = changes
      .groupBy(keys: _*)
      .agg(max_by(
        struct((valueCols :+ opCol).map(col): _*),
        struct((tsCol +: tieCols).map(col): _*)).as("__c"))
    val hasChange = col("__c").isNotNull
    base.join(latest, keyCols, "full_outer")
      .filter(!hasChange || col("__c").getField(opCol) =!= deleteOp)
      .select(keys ++ valueCols.map(v =>
        when(hasChange, col("__c").getField(v)).otherwise(col(v)).as(v)): _*)
  }

  /** Cohort retention analysis: assign every key to the cohort of its
    * FIRST active day, then count how many of each cohort's keys were
    * active again `day_offset` days later — the product-analytics
    * retention triangle ("of users who first appeared on day D, how many
    * came back on D+k?").
    *
    * Scale shape: ONE exchange on the key. The per-key aggregate collects
    * the key's DISTINCT active days (bounded by the calendar span of the
    * data, not by event volume — a 31-day month caps the set at 31
    * entries no matter how many billions of events a key produced); the
    * cohort day is the set's min, offsets explode from the same set, and
    * the final (cohort, offset) rollup is a tiny second aggregate over
    * ≤ span² group rows per partition. No self-join of activity against
    * first-activity — the classic two-scan formulation pays a second
    * shuffle of the full activity table for the same answer.
    *
    * @return (cohort_day: 'yyyy-MM-dd' string, day_offset: long ≥ 0,
    *         n_users: long) — each key counts at most once per
    *         (cohort_day, day_offset) because offsets come from a set
    */
  def cohortRetention(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df
      .select(col(keyCol).as("__k"), to_date(col(tsCol)).as("__day"))
      .groupBy(col("__k"))
      .agg(collect_set(col("__day")).as("__days"))
      .select(array_min(col("__days")).as("__cohort"),
        explode(col("__days")).as("__day"))
      .groupBy(
        date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("__day"), col("__cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))

  /** Daily resampling with forward fill — the gap-filling pass that turns
    * an irregular event stream into the dense per-key daily series
    * time-series consumers (features, charts, SCD reads) expect: per key,
    * one row per calendar day of the key's own [first, last] active
    * span, carrying the day's CLOSING value (latest by (ts, tie) within
    * the day) and the forward-filled value (last close at or before the
    * day — gaps inherit, days before the first observation stay null
    * only never: day one is an observation by construction).
    *
    * Scale shape: the daily close is ONE exchange on (key, day) with a
    * max_by (map-side partials — intraday volume collapses before the
    * shuffle); the grid explodes from each key's (min, max) day pair
    * (span-bounded, like [[cohortRetention]]'s set); the fill is a
    * running `last(ignoreNulls)` over each key's OWN grid rows — a
    * window over |span| rows per key, never over raw events.
    *
    * @return (keyCol, day: date, close_cents-style raw value: nullable,
    *         filled: forward-filled value)
    */
  def resampleDailyFfill(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(max_by(col(valueCol), struct(col(tsCol), col(tieCol))).as("close"))
    val grid = df
      .groupBy(col(keyCol))
      .agg(min(to_date(col(tsCol))).as("__d0"), max(to_date(col(tsCol))).as("__d1"))
      .select(col(keyCol), explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("filled", last(col("close"), ignoreNulls = true).over(w))
  }

  /** Sequential path extraction: every length-`n` run of consecutive
    * event types per key, in (`tsCol`, `tieCol`) order, joined with '>'
    * — the "what do users do next" n-gram view behavioral analytics
    * builds top-paths reports from (downstream: `groupBy(path).count`,
    * top-k).
    *
    * Scale shape: ONE exchange on the key (the same grouped ordered
    * collect as [[funnelStages]], per-key state bounded by the key's own
    * events); paths then explode from each key's sequence as a per-row
    * transform. The window-lag formulation computes the same rows but
    * re-sorts every partition for each of the n-1 leads.
    *
    * @return (keyCol, path) — one row per position where a full n-gram
    *         fits; keys with fewer than `n` events contribute nothing
    */
  def eventPaths(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, n: Int = 3): DataFrame = {
    require(n >= 2, s"eventPaths needs n >= 2, got $n")
    val ordered = df
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col(tsCol), col(tieCol), col(typeCol))))
        .as("__seq"))
      .select(col(keyCol),
        expr(s"transform(__seq, x -> x.$typeCol)").as("__types"))
      .filter(size(col("__types")) >= n)
    val gram = (0 until n).map(o => s"element_at(__types, i + $o + 1)").mkString(", ")
    ordered
      .select(col(keyCol), explode(expr(
        s"transform(sequence(0, size(__types) - $n), i -> concat_ws('>', $gram))"))
        .as("path"))
  }

  /** Point-in-time lookup against an [[scd2]] history: the value row
    * whose interval contains `at` (`valid_from <= at < valid_to`,
    * open-ended current rows match any later time). A pure filter over
    * the history — partition pruning and predicate pushdown apply. */
  def asOfTime(history: DataFrame, at: Column): Column =
    col("valid_from") <= at && (col("valid_to").isNull || col("valid_to") > at)

  /** Per-day PEAK concurrency of half-open intervals `[start, end)` — the
    * sweep line every capacity/occupancy question reduces to (how many
    * sessions/calls/jobs were open at the worst moment of each day).
    *
    * Distributed sweep, NOT one global ordered window (the textbook
    * single-partition formulation dies at corpus scale): ±1 deltas are
    * summed WITHIN each day by a day-partitioned running window (state
    * bounded by the day's events), while cross-day carry-in is a
    * day-level prefix sum over the per-day delta totals — #days rows, so
    * its single-partition window is microscopic by construction. Peak =
    * max(carry, max(within-day running sum + carry)) — the bare carry is
    * the day-START level (sessions still open at midnight, before the
    * day's first delta) and must compete: a day whose first delta is an
    * interval END would otherwise under-report. Touching intervals don't
    * overlap: at equal timestamps the `delta` sort key drains -1 ends
    * before +1 starts; ties among EQUAL (t, delta) rows permute freely
    * but cannot change a max. Days that only ever see interval ENDS
    * (tails crossing midnight past the last start) still report — their
    * peak is the carry itself (the level before the end drains it).
    *
    * @return (day: date, peak_concurrency: long), one row per day any
    *         delta lands on
    */
  def peakConcurrency(df: DataFrame, startCol: Column, endCol: Column): DataFrame = {
    val deltas = df.select(startCol.as("t"), lit(1L).as("delta"))
      .unionByName(df.select(endCol.as("t"), lit(-1L).as("delta")))
      .withColumn("day", to_date(col("t")))
    val carries = deltas.groupBy(col("day")).agg(sum(col("delta")).as("day_sum"))
      .withColumn("carry", coalesce(
        sum(col("day_sum")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("day"), col("carry"))
    deltas
      .withColumn("run", sum(col("delta")).over(
        Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(carries, Seq("day"))
      .groupBy(col("day"))
      .agg(greatest(max(col("run") + col("carry")), max(col("carry")))
        .as("peak_concurrency"))
  }
}
