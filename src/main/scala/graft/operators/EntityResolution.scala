package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string matching / entity resolution.
  *
  * The reference engine matches records only on exact keys
  * (CallCustomerJoiner.java:15-40 joins on the phone-number string); a
  * curation pipeline additionally needs the *approximate* form — the same
  * entity spelled slightly differently across sources (typos, OCR noise,
  * truncation). The classic scale trap is the all-pairs edit-distance
  * join; this module uses symmetric-delete blocking (the SymSpell
  * construction: Garbe's public algorithm, itself a restriction of
  * Mor-Fraenkel 1982 deletion-only dictionaries) so candidate generation
  * is a pure equi-join.
  *
  * Why deletes suffice: if lev(a, b) ≤ d, then deleting ≤ d characters
  * from a and ≤ d from b reaches a common string (delete the substituted/
  * inserted positions on each side). So indexing every string under all
  * of its ≤ d-deletion variants guarantees every true pair shares at
  * least one key — completeness by construction; precision comes from an
  * exact Levenshtein verify over candidates only.
  *
  * 100 TB shape: the exploded index carries (hash60(variant), id, s) —
  * O(rows × len^d) rows but only a long key plus the short string; the
  * candidate step is an equi-join on the long key (hash-partitioned, AQE
  * skew-splittable), `distinct` collapses multi-key collisions before the
  * O(len²) verify ever runs, and nothing is ever quadratic in the corpus.
  * Identical strings all collide on their full-string key — run exact
  * dedup first (d01) or cap pathological buckets with `maxBucket`, the
  * same hot-key fence as the shingle caps in [[Dedup]].
  */
object EntityResolution {

  /** Default hot-key fence: candidate keys indexing more than this many
    * rows are dropped before the candidate join. ON BY DEFAULT — the
    * 30× ScaleCurve decade measured the unfenced operator's marginal
    * scaling exponent at α = 1.40 under a 5%-hot-name skew (the
    * within-block quadratic) vs α = 0.88 with the fence at 64, which was
    * also absolutely faster (19.1 s → 10.4 s at 30×); a skewed corpus
    * hits the quadratic precisely when the caller didn't know to ask.
    * 64 sits above every bucket the benign board catalogs produce
    * (measured via [[fuzzyHotBuckets]]: max 40 on the 1.5k-name sf0.01
    * catalogs, 58 on the 15k-name sf0.1 d22 right side — near-constant
    * in corpus size, since a deletion-variant bucket collects only
    * ≤ maxDist-away neighbors), so the fence engages only on
    * pathological key mass — near-identical string clusters, which
    * [[fuzzyHotBuckets]] audits and exact dedup (d01) removes upstream.
    * `maxBucket = 0` restores the exact (unfenced) operator.
    *
    * MIGRATION NOTE (the default flipped from 0 to 64): this is a
    * semantic change, not just a plan change — callers that relied on
    * the exact default get bounded recall loss on near-identical
    * clusters. Oracle-pinned exactness tests must pass `maxBucket = 0`
    * explicitly (d14/d22 do). When the fence actually drops buckets at
    * run time, a one-line warning is logged via a zero-job observed
    * metric (see [[fenceObserved]]), so the recall trade is visible
    * without the caller thinking to run the audit. */
  val DefaultMaxBucket = 64

  /** Attach a zero-cost observed metric to the hot-bucket frame and log a
    * one-line warning when the fence DROPS anything: `observe` piggybacks
    * an accumulator on the fence aggregate (no extra job, unlike a
    * `count()`), and a once-per-session QueryExecutionListener reads it
    * after each action. Names carry a serial — Spark requires observation
    * names unique within a query, and [[fuzzyLink]] fences two sides. */
  private val fenceSerial = new java.util.concurrent.atomic.AtomicLong(0)
  // weak keys: registration must not pin pooled/cloned sessions in memory
  private val fenceListenerSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]()))
  private def fenceObserved(hot: DataFrame, maxBucket: Int): DataFrame = {
    val spark = hot.sparkSession
    if (fenceListenerSessions.add(spark)) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_fuzzy_fence_") && row.getLong(0) > 0L) {
              // name format: graft_fuzzy_fence_<maxBucket>_<serial>
              val cap = name.split('_').lift(3).getOrElse("?")
              System.err.println(s"[graft] WARN fuzzy-ER fence dropped " +
                s"${row.getLong(0)} hot bucket(s) at maxBucket=$cap " +
                s"(bounded recall loss) — audit with " +
                s"EntityResolution.fuzzyHotBuckets, or dedup exact copies " +
                s"upstream (d01)")
            }
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    }
    hot.observe(
      s"graft_fuzzy_fence_${maxBucket}_${fenceSerial.incrementAndGet()}",
      count(lit(1)).as("dropped_buckets"))
  }

  /** All distinct strings reachable from `s` by at most `maxDist`
    * character deletions (including `s` itself) — one codegen'd kernel
    * call (`TextKernels.deletionVariants`) instead of the interpreted
    * transform/sequence/substring lambda tree it replaces, which
    * re-evaluated O(len) two-substring concats plus an array_union per
    * row (TextExprSpec pins kernel ≡ HOF on ASCII, unicode, and empty
    * strings). */
  private def deletionKeys(maxDist: Int): Column =
    graft.functions.TextFunctions.deletionVariants(col("s"), maxDist)

  /** All pairs `(id_a, id_b, dist)` with `lev(str_a, str_b) <= maxDist`
    * and `id_a < id_b`, found via symmetric-delete blocking + exact
    * verify. `maxDist` ∈ {1, 2} (the useful ER range — beyond 2 the
    * deletion index fans out as len², and a token-level matcher like
    * n-gram Jaccard (d04) is the right tool). `maxBucket > 0` drops
    * candidate keys indexing more than that many rows — the hot-key
    * fence that caps join fan-out at the price of bounded recall loss
    * on near-identical clusters, ON by default ([[DefaultMaxBucket]];
    * pass 0 for the exact unfenced operator, and see
    * [[fuzzyHotBuckets]] for the dropped-bucket audit). Null strings
    * are dropped (no match semantics).
    */
  /** Pairs travel as longs (minimum-width candidate shuffle), so the id
    * column must be integral: a plain cast would CRASH on non-numeric ids
    * under ANSI (the session default) or, ANSI off, null them out and
    * silently drop those rows from the pair set — and distinct strings
    * casting to one long ('01' vs '1') would silently merge entities. */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    val t = df.schema(idCol).dataType.typeName
    require(Seq("byte", "short", "integer", "long").contains(t),
      s"$op needs an integral id column; '$idCol' is $t — map string/uuid " +
        "ids to a dense long surrogate first")
  }

  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist must be 1 or 2, got $maxDist")
    requireIntegralId(df, idCol, "fuzzyPairs")
    // entry spread (PlanScope.spreadIfSmall): the deletion-variant explode
    // is O(len·maxDist) kernel work per row and runs in ONE task when the
    // input arrives as a single parquet split — spread the projected
    // (id, s) rows first; no-op at scale. The fetch joins below re-read
    // `base` cheaply either way.
    val base = graft.ops.PlanScope.spreadIfSmall(df
      .select(col(idCol).cast("long").as("id"), col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull), "id")
    val keyed0 = base
      .select(col("id"), col("s"), explode(deletionKeys(maxDist)).as("v"))
      .select(col("id"), col("s"),
        graft.functions.TextFunctions.hash60(col("v")).as("k"))
    val keyed = fenceHotKeys(keyed0, maxBucket)
    // Candidates stay (id, id) longs through the join + distinct — the
    // candidate shuffle is the dominant exchange, so it runs at minimum
    // row width, and the distinct both collapses multi-key collisions
    // before the verify and gives AQE a materialized, right-sized frame
    // to plan the fetch joins over. Two alternatives measured SLOWER on
    // the 15k-name corpus despite looking cheaper on paper: carrying the
    // strings through the candidate join to verify inline (1.6× — the
    // wide shuffle costs more than the fetch joins save) and deferring
    // the distinct past the verify (1.6× — the candidate stream's unknown
    // stats degrade every downstream join plan for a ~2% row saving).
    val a = keyed.select(col("k"), col("id").as("id_a"))
    val b = keyed.select(col("k"), col("id").as("id_b"))
    val cand = a.join(b, Seq("k")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // Banded verify: the threshold form computes only the 2·maxDist+1
    // diagonal band and bails at -1 the moment a row's minimum exceeds
    // the bound — O(len·maxDist) per pair instead of the full O(len²)
    // matrix, with identical distances for every kept pair (lossless,
    // unlike first-char fences, which a position-1 substitution defeats).
    // Candidates need no length fence: both sides delete ≤ maxDist chars
    // to reach a shared key, so |len_a − len_b| ≤ maxDist already holds
    // for every candidate by construction.
    cand
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Cross-source record LINKAGE: all pairs `(left_id, right_id, dist)`
    * with `lev(left_str, right_str) <= maxDist` — [[fuzzyPairs]]' blocking
    * applied across TWO catalogs (the master-data reconciliation shape:
    * link a vendor feed to the canonical entity table). Id spaces are
    * independent (no ordering constraint between sides, and equal ids on
    * opposite sides are distinct entities — same cross-corpus stance as
    * bitext mining). Same completeness argument: a true pair reaches a
    * common ≤ maxDist-deletion key from both sides, so candidates are an
    * equi-join of the two deletion indexes; exact banded-Levenshtein
    * verify restores precision. `maxBucket` fences keys hot on EITHER
    * side (join fan-out is the per-key product) — ON by default
    * ([[DefaultMaxBucket]], 0 = exact); audit each side with
    * [[fuzzyHotBuckets]]. */
  def fuzzyLink(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int = 1, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist must be 1 or 2, got $maxDist")
    requireIntegralId(left, leftId, "fuzzyLink")
    requireIntegralId(right, rightId, "fuzzyLink")
    // same entry spread as fuzzyPairs: the deletion-variant explode over
    // a one-split input would otherwise run single-task
    def prep(df: DataFrame, id: String, s: String) =
      graft.ops.PlanScope.spreadIfSmall(df
        .select(col(id).cast("long").as("id"), col(s).cast("string").as("s"))
        .filter(col("s").isNotNull), "id")
    def keyed(base: DataFrame) = base
      .select(col("id"), explode(deletionKeys(maxDist)).as("v"))
      .select(col("id"), graft.functions.TextFunctions.hash60(col("v")).as("k"))
    val lb = prep(left, leftId, leftStr)
    val rb = prep(right, rightId, rightStr)
    val lk = fenceHotKeys(keyed(lb), maxBucket).select(col("k"), col("id").as("left_id"))
    val rk = fenceHotKeys(keyed(rb), maxBucket).select(col("k"), col("id").as("right_id"))
    val cand = lk.join(rk, Seq("k"))
      .select(col("left_id"), col("right_id")).distinct()
    cand
      .join(lb.select(col("id").as("left_id"), col("s").as("s_a")), Seq("left_id"))
      .join(rb.select(col("id").as("right_id"), col("s").as("s_b")), Seq("right_id"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("left_id"), col("right_id"), col("dist"))
  }

  /** THE hot-key fence, shared by [[fuzzyPairs]] and [[fuzzyLink]]:
    * drop rows whose deletion-index key `k` indexes more than `maxBucket`
    * rows in THIS keyed frame. One grouped count (map-side partials);
    * an equi-anti-join on k keeps it shuffle-aligned with the candidate
    * join that follows (broadcasting the hot set back is wrong at scale
    * — the key set is O(corpus)). No-op at maxBucket <= 0 (exact mode).
    * One definition so the pair and link operators' recall behavior can
    * never silently diverge. */
  private def fenceHotKeys(keyed: DataFrame, maxBucket: Int): DataFrame =
    if (maxBucket <= 0) keyed
    else keyed.join(
      fenceObserved(
        keyed.groupBy(col("k")).agg(count(lit(1)).as("n"))
          .filter(col("n") > maxBucket).select(col("k")),
        maxBucket),
      Seq("k"), "left_anti")

  /** Dropped-hot-bucket AUDIT for the default fence (the d16 pattern:
    * every silent cap ships its census): the deletion-index keys
    * [[fuzzyPairs]] would fence at this `maxBucket`, with the bucket
    * size and two example member strings — what a pipeline logs next to
    * a fenced ER run so the recall trade is visible, and what tells an
    * operator the corpus needed exact dedup (d01) upstream. For
    * [[fuzzyLink]], audit each catalog separately (its fence is
    * per-side). Cost: the same keyed explode as the operator plus ONE
    * grouped aggregate (count + min/max — O(1) state per key, never a
    * per-bucket collect); empty when nothing would be fenced.
    *
    * @return (key_h60: long, n_rows: long, example_a: string,
    *         example_b: string) — examples are the bucket's min/max
    *         strings (equal when one string dominates the bucket)
    */
  def fuzzyHotBuckets(df: DataFrame, strCol: String,
      maxDist: Int = 1, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist must be 1 or 2, got $maxDist")
    require(maxBucket > 0, s"maxBucket must be > 0 to audit a fence, got $maxBucket")
    df.select(col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull)
      .select(col("s"), explode(deletionKeys(maxDist)).as("v"))
      .select(col("s"), graft.functions.TextFunctions.hash60(col("v")).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("s")).as("example_a"), max(col("s")).as("example_b"))
      .filter(col("n_rows") > maxBucket)
      .select(col("k").as("key_h60"), col("n_rows"),
        col("example_a"), col("example_b"))
  }
}
