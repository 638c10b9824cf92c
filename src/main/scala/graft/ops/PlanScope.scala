package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-scope control for operators whose plan shape is known ahead of
  * time. Spark's AQE charges one driver job per materialized exchange
  * (each shuffle stage is submitted, measured, and re-planned before the
  * next), which is the right trade for ad-hoc corpus queries — and pure
  * overhead for a SERVING-shaped operator that re-executes the same
  * known plan per batch: a per-batch dedup admits the same band joins
  * every call, a fixpoint loop re-runs the same two exchanges every
  * round. There AQE re-planning buys no information while charging a
  * driver walk plus a job dispatch per exchange per call — on a
  * dispatch-floor-bound host (or a busy cluster scheduler) that floor IS
  * the latency. Measured on the board: d12_delta_dedup 45 → ~4 driver
  * jobs with identical results.
  *
  * Static planning deliberately gives up two AQE behaviors, both
  * irrelevant to the shapes this is used for: runtime join-strategy
  * switches (the operators' joins are on DERIVED frames whose static
  * size estimates would never broadcast anyway, or on frames the
  * operator already pre-partitioned) and skew-split (LSH band / minhash
  * bucket keys are uniform by construction).
  *
  * The primary entry point is [[isolated]]: the scope runs on a fresh
  * `newSession()` CLONE — isolated SQLConf, shared SparkContext, cache
  * manager and global-temp-view catalog — so a concurrent query on the
  * caller's session NEVER observes the scope's confs (it plans under AQE
  * as usual while the scope runs). Input frames cross into the clone via
  * [[rebind]] (re-planned under the clone's conf) or [[rebindRows]]
  * (keeping the caller-planned lineage); results cross back the same
  * way. The legacy same-session [[withConf]]/[[staticBatch]] remain for
  * driver-side fit loops whose bodies only collect, guarded by a loud
  * cross-thread fail-fast (same-thread nesting allowed) so an
  * interleaved restore can never silently pin a conf on the session. */
object PlanScope {

  /** One clone per (caller session, effective-conf fingerprint), never
    * mutated after creation: scopes with the same confs share it (safe —
    * its conf is read-only for life), frames returned from a scope keep
    * planning under the conf they were built with, and the ~0.5 s
    * first-action SessionState warmup a fresh session costs (measured on
    * the board: analyzer/planner instantiation plus catalog init,
    * charged to the first two actions) is paid once, not per call.
    *
    * The outer map is WEAK-KEYED on the caller session (synchronized
    * WeakHashMap): a pooled clone references the shared SparkContext,
    * never the caller session object, so once a caller session becomes
    * unreachable its whole clone sub-pool is collectable — a long-lived
    * process cycling through sessions doesn't accumulate dead pools. */
  private val clonePool = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      SparkSession, java.util.concurrent.ConcurrentHashMap[String, SparkSession]]())

  /** Run `f` against a conf-isolated clone of `spark`: same
    * SparkContext, cache manager and global-temp views, but its own
    * SQLConf — the caller's current explicitly-set MODIFIABLE conf
    * values (so timezone / ANSI / shuffle-partition semantics match
    * exactly) with `confs` applied on top. No concurrent query on
    * `spark` can ever observe the overrides, and nothing is restored —
    * the clone's conf is immutable (pooled by fingerprint; a body that
    * needs different confs mid-operator opens a second scope rather
    * than calling `clone.conf.set`). Frames bound to `spark` cross in
    * via [[rebind]]/[[rebindRows]]; frames crossing back out may simply
    * be returned — planning on them stays under the clone's (immortal,
    * immutable) conf — or re-bound via [[rebindRows]] when the caller
    * needs its own planning conf downstream. */
  def isolated[T](spark: SparkSession, confs: (String, String)*)(
      f: SparkSession => T): T = {
    // Scope reuse: when `spark` already holds every requested conf (an
    // operator composed inside another operator's scope — e.g. the IVF
    // fit inside a probe wrapper), it IS a suitable scope — run there.
    // rebind() against the same session is the identity hop. Routed
    // through withConf so the body registers as a no-op READER: a bare
    // f(spark) here would let a concurrent mutating withConf flip the
    // very confs this scope just verified, mid-body.
    if (confs.forall { case (k, v) => spark.conf.get(k, null) == v })
      return withConf(spark, confs: _*)(f(spark))
    val seed = spark.conf.getAll.filter { case (k, _) => spark.conf.isModifiable(k) }
    val eff = seed ++ confs // overrides win
    val fp = eff.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("\u0000")
    val pool = clonePool.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[String, SparkSession]())
    val clone = pool.computeIfAbsent(fp, _ => {
      val c = spark.newSession()
      eff.foreach { case (k, v) => if (c.conf.isModifiable(k)) c.conf.set(k, v) }
      c
    })
    f(clone)
  }

  /** [[isolated]] with AQE off — one driver job per action instead of
    * one per exchange, visible only to plans built on the clone. */
  def isolatedStatic[T](spark: SparkSession)(f: SparkSession => T): T =
    isolated(spark, "spark.sql.adaptive.enabled" -> "false")(f)

  /** Shuffle-partition count sized to `df`'s optimizer size estimate at
    * ~64 MB per partition, rounded UP to a power of two (so the
    * [[isolated]] clone pool stays bounded as data grows) and capped by
    * the session's own `spark.sql.shuffle.partitions` (the caller sized
    * that for the corpus). Costs no job — the estimate is the plan
    * statistic (file sizes for scans, accurate stats for cached frames);
    * when no estimate exists the session value stands. Static scopes
    * need this because nothing coalesces post-shuffle partitions with
    * AQE off: a small corpus through session-width exchanges pays one
    * near-empty task per partition per exchange — measured at 4-5× an
    * operator's whole compute on a dispatch-floor-bound host. */
  def sizedPartitions(df: DataFrame, bytesPerPartition: Long = 64L << 20): Int = {
    val sessionSp = scala.util.Try(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(200)
    val est = scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes).toOption
    est match {
      case Some(bytes) if bytes >= 0 && bytes < BigInt(Long.MaxValue) =>
        val raw = ((bytes + bytesPerPartition - 1) / bytesPerPartition).max(1)
        val pow2 = if (raw < (1 << 30)) Integer.highestOneBit(raw.toInt * 2 - 1)
          else sessionSp
        math.max(1, math.min(sessionSp, pow2))
      case _ => math.max(1, sessionSp)
    }
  }

  /** Spread a provably SMALL input across the session's cores before a
    * kernel-heavy chain. The driver's tables are single-row-group parquet
    * files, so a scan is ONE task no matter the split config — every
    * narrow kernel stage over it (minhash banding, shingling, quality
    * scoring, heavy partial aggregation) serializes on one core while 31
    * idle. One deterministic hash exchange on the row key spreads it; a
    * big or unknown-size input returns untouched — this must never become
    * an unconditional full-text exchange at 100 TB, where the scan
    * already fans out with its file splits. The smallness test is the
    * optimizer SIZE ESTIMATE (the Dedup.bandFrame rule: under ~4 file
    * splits is genuinely under-split for a 32-core kernel stage), never
    * `.rdd` — materializing an adaptive plan's RDD executes upstream
    * stages just to read a partition count. Hash-partitioning on the
    * unique row key (not round-robin): deterministic row placement under
    * task retry (SPARK-38388), no round-robin pre-shuffle local sort,
    * and downstream equi-joins on the same key can REUSE the exchange.
    * Callers must not route the spread claim into both branches of a
    * union that later co-partition-joins (reproduced SMJ zip failure in
    * the curation domain stage — the spread there sits after the union). */
  def spreadIfSmall(df: DataFrame, keyCol: String): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val est = scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes).toOption
    est match {
      case Some(b) if b < BigInt(4L) * conf.filesMaxPartitionBytes =>
        df.repartition(conf.numShufflePartitions,
          org.apache.spark.sql.functions.col(keyCol))
      case _ => df
    }
  }

  /** [[spreadIfSmall]] keyed on a MULTI-column key — for spreading
    * straight into a downstream `groupBy(cols…)`: the hash exchange this
    * adds already satisfies the aggregation's distribution requirement,
    * so the spread costs no extra exchange, it just moves the one the
    * aggregate would have paid BELOW the heavy partial-aggregation work
    * (the r16 q28 case: a (group, value) histogram whose partial agg
    * barely reduces ran on the scan's 3 row-group tasks; spread first,
    * the whole aggregate runs at session width and the plan's exchange
    * count is unchanged). Same estimate gate and determinism rationale
    * as the single-key overload; no-op at scale. */
  def spreadIfSmall(df: DataFrame, keyCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val est = scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes).toOption
    est match {
      case Some(b) if b < BigInt(4L) * conf.filesMaxPartitionBytes =>
        df.repartition(conf.numShufflePartitions, keyCols: _*)
      case _ => df
    }
  }

  /** [[spreadIfSmall]] for frames WITHOUT a usable row key (a bare text
    * projection): round-robin instead of hash-by-key. The pre-shuffle
    * local sort (SPARK-23207, on by default) keeps row placement
    * deterministic under task retry; the sort itself is bounded because
    * the spread only fires on provably small inputs. */
  def spreadIfSmall(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val est = scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes).toOption
    est match {
      case Some(b) if b < BigInt(4L) * conf.filesMaxPartitionBytes =>
        df.repartition(conf.numShufflePartitions)
      case _ => df
    }
  }

  /** The static scope most operators want: AQE off AND shuffle
    * partitions sized to the dominant input frame (see
    * [[sizedPartitions]]). */
  def isolatedStaticFor[T](df: DataFrame)(f: SparkSession => T): T =
    isolated(df.sparkSession,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> sizedPartitions(df).toString)(f)

  private val rebindCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Re-bind `df`'s LOGICAL PLAN onto `target` (a session sharing the
    * same SparkContext), so downstream planning — AQE on/off, shuffle
    * partitions, broadcast thresholds — happens under `target`'s conf.
    * The hop is a global temp view (the one session-shared catalog
    * surface): the view inlines at analysis, is dropped immediately, and
    * costs no job. Use for INPUT frames entering an [[isolated]] scope
    * whose whole derivation should plan under the scope's conf.
    *
    * A frame that is itself PERSISTED hops via [[rebindRows]] instead:
    * view resolution wraps the stored plan in a `View` node, which
    * defeats the CacheManager's canonicalized-plan match — measured on
    * the board, a cached corpus derivation silently RE-EXECUTED inside
    * the scope (1.8 s recompute vs a 40 ms cached read). The RDD hop
    * reads the cached blocks directly. (Persisted SUBTREES under an
    * uncached top are still at risk — cross such frames explicitly with
    * [[rebindRows]], or materialize and pass the persisted frame
    * itself.) */
  def rebind(df: DataFrame, target: SparkSession): DataFrame = {
    if (df.sparkSession eq target) return df
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      return rebindRows(df, target)
    val name = s"graft_planscope_${rebindCounter.incrementAndGet()}"
    df.createOrReplaceGlobalTempView(name)
    try {
      val gdb = target.conf.get("spark.sql.globalTempDatabase", "global_temp")
      target.table(s"`$gdb`.`$name`")
    } finally {
      df.sparkSession.catalog.dropGlobalTempView(name); ()
    }
  }

  /** Re-bind `df` onto `target` keeping its CURRENT plan as concrete
    * lineage: the frame `target` sees is an RDD scan whose recompute
    * replays the plan exactly as `df`'s own session would have run it.
    * Use at the exit boundary of an [[isolated]] scope (the returned
    * frame must not plan under the discarded clone's conf) or to feed a
    * caller-planned derivation into a scope without re-planning it.
    * Costs no job at bind time; the Row↔InternalRow hop it adds is paid
    * by whatever materializes the result — size the call accordingly
    * (|V|-sized loop results, per-batch serving outputs). */
  def rebindRows(df: DataFrame, target: SparkSession): DataFrame =
    target.createDataFrame(df.rdd, df.schema)

  // --- legacy same-session scope (driver-side fit loops) ---------------

  /** Cross-thread guard for the mutating scope: one owner thread per
    * session (nesting on the owner thread allowed). A second thread
    * entering would interleave snapshot/restore and could permanently
    * pin an override on the session — fail loudly instead. */
  private val owners =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, (Thread, Int)]()

  /** Concurrent no-op entrants per session (see the no-op short-circuit
    * in [[withConf]]): registered BEFORE the owner check, so the pair of
    * checks can never interleave silently — a mutating entry that races a
    * no-op entry sees `noopReaders > 0` and fails loudly, and a no-op
    * entry that races a mutating entry sees the owner slot taken and
    * fails loudly. Either way the conf race the guard exists to prevent
    * is impossible; the cost is a loud abort in a window that current
    * call sites (no-op scopes on immutable pooled clones) never hit. */
  private val noopReaders = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, Integer]()

  /** This thread's own in-flight no-op registrations (per session) —
    * subtracted in the mutating path's reader check so same-thread
    * nesting (a no-op scope whose body opens a mutating scope) keeps
    * working: the thread's own scopes are sequenced, only OTHER threads'
    * no-op bodies can race a mutation. */
  private val ownNoops = ThreadLocal.withInitial[
    java.util.Map[SparkSession, Integer]](() => new java.util.HashMap)

  /** Run `f` with the given SQL confs set ON THE SESSION, restoring the
    * prior state after — including unsetting keys that had no explicit
    * value, so a later default change or RESET still behaves as if the
    * scope never ran. Session-global: concurrent queries on `spark`
    * plan under these values while `f` runs, so entry is restricted to
    * one thread at a time (re-entrant on that thread); a second thread
    * gets an IllegalStateException instead of a silent conf race. For
    * operator-internal scopes prefer [[isolated]]. */
  def withConf[T](spark: SparkSession, confs: (String, String)*)(f: => T): T = {
    // No-op short-circuit: when every requested conf already holds its
    // target value (e.g. a fit loop running on an [[isolated]] clone that
    // is already static), there is nothing to mutate — skip the set and
    // the restore, so such scopes stay safely concurrent. The entrant
    // registers in [[noopReaders]] BEFORE checking the owner slot
    // (two-phase, see the field doc): a concurrent mutating entry —
    // whose eventual restore would change the values mid-body — is
    // guaranteed to collide loudly with this scope in one direction or
    // the other, never to interleave silently. A same-thread owner skips
    // registration: its own restore is sequenced after this body.
    val me = Thread.currentThread()
    val effective = confs.filter { case (k, v) => spark.conf.get(k, null) != v }
    if (effective.isEmpty) {
      val cur0 = owners.get(spark)
      if (cur0 != null && (cur0._1 eq me)) return f
      // merge/compute keep the count atomic per key AND remove the entry
      // at zero — an AtomicInteger value could only be removed racily
      // (another thread may still hold the orphaned counter), and a
      // never-removed entry strongly pins dead sessions (plus their
      // whole clone sub-pools) for the life of the process
      noopReaders.merge(spark, 1, (a, b) => a + b)
      ownNoops.get.merge(spark, 1, (a, b) => a + b)
      try {
        val cur = owners.get(spark)
        if (cur != null && !(cur._1 eq me)) throw new IllegalStateException(
          s"PlanScope.withConf: session already scoped by thread '${cur._1.getName}' — " +
            "its restore could change these confs mid-body; serialize these " +
            "operators or use PlanScope.isolated")
        return f
      } finally {
        noopReaders.compute(spark,
          (_, a) => if (a == null || a <= 1) null else a - 1)
        ownNoops.get.merge(spark, -1, (a, b) =>
          if (a + b <= 0) null else a + b)
      }
    }
    owners.compute(spark, (_, cur) => cur match {
      case null => (me, 1)
      case (t, n) if t eq me => (t, n + 1)
      case (t, _) => throw new IllegalStateException(
        s"PlanScope.withConf: session already scoped by thread '${t.getName}' — " +
          "the mutating scope is single-threaded per session; serialize these " +
          "operators or use PlanScope.isolated")
    })
    // second phase of the two-phase guard: OTHER threads' no-op entrants
    // registered before our compute() above must finish before any
    // mutation — abort (and release the just-acquired slot) while any
    // are in flight; this thread's own nested no-op scopes don't count
    val inFlight = Option(noopReaders.get(spark)).map(_.intValue).getOrElse(0) -
      Option(ownNoops.get.get(spark)).map(_.intValue).getOrElse(0)
    if (inFlight > 0) {
      owners.compute(spark, (_, cur) => cur match {
        case (t, 1) => null
        case (t, n) => (t, n - 1)
      })
      throw new IllegalStateException(
        s"PlanScope.withConf: $inFlight concurrent no-op scope(s) hold this " +
          "session's current conf values — mutating them mid-body would race; " +
          "serialize these operators or use PlanScope.isolated")
    }
    try {
      // None = key had no explicit value (session default) → restore by
      // unset, not by pinning the resolved default. getAll lists the
      // explicitly-set entries only. The SETS run inside the restoring
      // try: a set() that throws mid-sequence (non-modifiable key, value
      // validator) must not leave the keys already set pinned on the
      // session forever.
      val explicit = spark.conf.getAll
      val prev = effective.map { case (k, _) =>
        k -> (if (explicit.contains(k)) Some(spark.conf.get(k)) else None)
      }
      try {
        effective.foreach { case (k, v) => spark.conf.set(k, v) }
        f
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    } finally {
      owners.compute(spark, (_, cur) => cur match {
        case (t, 1) => null // removes the entry — no session leak
        case (t, n) => (t, n - 1)
      })
      ()
    }
  }

  /** Same-session static scope: AQE off for the duration of `f`. For
    * driver-side fit loops (Lloyd rounds, BPE merge passes) whose bodies
    * collect bounded aggregates; whole-operator scopes should use
    * [[isolatedStatic]] instead. */
  def staticBatch[T](spark: SparkSession)(f: => T): T =
    withConf(spark, "spark.sql.adaptive.enabled" -> "false")(f)
}
