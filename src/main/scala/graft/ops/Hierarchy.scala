package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Hierarchy traversal — the `WITH RECURSIVE` shape Spark has no native
  * operator for, expressed as the bounded iterative-join fixpoint every
  * distributed engine actually runs underneath (Catalyst has no recursion;
  * a driver loop over joins IS the plan, with the same per-level cost
  * model as DuckDB/Postgres recursive CTE evaluation).
  *
  * Both entry points run on a conf-ISOLATED session clone
  * ([[PlanScope.isolatedStatic]]): AQE off — a fixpoint re-executes the
  * same known shape every round, so re-planning buys nothing and charges
  * a driver job per exchange per round — while a concurrent query on the
  * caller's session plans under its own untouched conf (no restore, no
  * race; the clone dies with the returned frame). Broadcasts stay ON: a
  * small forest's parent map broadcasts from its static size estimate
  * (zero exchanges per round — measured faster than both the 1-partition
  * and the session-width shuffle-join variants, which pay this host's
  * per-task scheduling floor per round), while a corpus-sized map's
  * estimate exceeds the threshold and the static planner falls back to
  * the shuffle join against the cached pre-partitioned map — the shape
  * the repartition below exists for.
  *
  * The returned frame is persisted, materialized, and bound to the
  * scope's isolated session: consuming it (including any further plan
  * built on top) plans STATICALLY, which for the |nodes|-sized results
  * this produces is at worst a couple of AQE coalesce steps forgone —
  * and the caller's own session never observes a conf change.
  * `unpersist()` and [[graft.operators.Graphs.detachSmall]] release it
  * regardless of binding.
  */
object Hierarchy {

  /** Frontier climb shared by both entry points, built on frames already
    * bound to the scoped session. Returns the per-level frames (level 0 =
    * self-pairs, each later level cached) and the frames to release once
    * the closure's single consumer has materialized. The climb is
    * frontier-driven: round i joins the still-climbing frontier (one row
    * per node whose current ancestor has a parent) against the parent map
    * and emits the next ancestor level; the loop stops when the frontier
    * drains, so depth is discovered, never assumed. The initial frontier
    * is NOT pre-counted — round 1's convergence count materializes it
    * (an all-roots forest just pays one empty-join job), keeping the loop
    * at exactly one convergence action per level. */
  private def climb(nodes: DataFrame): (Vector[DataFrame], Vector[DataFrame]) = {
    // pre-hung on the join key at the session's shuffle partitioning (the
    // caller sized that for the corpus): when the map is too big to
    // broadcast, each round then shuffles only the frontier
    val parentMap = nodes
      .select(col("id").as("__cid"), col("parent").as("__pp"))
      .repartition(col("__cid"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var levels = Vector(nodes.select(col("id").as("node"), col("id").as("anc")))
    var frontier = nodes.filter(col("parent").isNotNull)
      .select(col("id").as("node"), col("parent").as("cur"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var spent = Vector(frontier)
    var remaining = 1L // sentinel — the first counted round materializes it
    var round = 0
    while (remaining > 0) {
      round += 1
      levels :+= frontier.select(col("node"), col("cur").as("anc"))
      // shuffle_hash pinned: the cached parentMap's partitioning already
      // satisfies the join (no exchange on the map side), so each round
      // shuffles ONLY the frontier — which is also the only plan that
      // exists at scale (the map is too big to broadcast there), and it
      // drops the per-round broadcast-build driver job a small map would
      // otherwise pay (census: that job doubled the climb's dispatch)
      val next = frontier
        .join(parentMap.hint("shuffle_hash"), frontier("cur") === col("__cid"))
        .filter(col("__pp").isNotNull)
        .select(col("node"), col("__pp").as("cur"))
      // STRIDE-2 drain checks (the kCore discipline): the frontier only
      // SHRINKS as nodes reach their roots, and an empty frontier stays
      // empty — counting every second level still detects the drain, at
      // worst one lazy join over an already-empty frontier late, while
      // halving the climb's driver-job count. Odd levels stay LAZY (plan
      // depth ≤ 2 over the last counted frontier); appending an empty
      // level to the closure is a no-op rows-wise either way.
      if (round % 2 == 0) {
        val p = next.persist(StorageLevel.MEMORY_AND_DISK)
        remaining = p.count()
        frontier = p
        spent :+= p
      } else frontier = next
    }
    (levels, spent :+ parentMap)
  }

  /** All (node, ancestor) pairs of a forest, ancestors including the node
    * itself — the transitive closure UP the parent pointers.
    *
    * Scale shape: output is Σ depth(node) rows — linear in corpus for the
    * shallow hierarchies this exists for (taxonomies, directory trees,
    * org charts: depth ~O(log n) or a small constant), NOT a general
    * graph closure. Rounds = max depth, each a join keyed on the current
    * ancestor — the frontier is the only moving frame.
    *
    * Returns a persisted, materialized frame (release with `unpersist()`
    * once consumed — the [[graft.operators.Graphs.detachSmall]]
    * contract); see the object doc for its session binding.
    *
    * @param nodes (id, parent, ...) — parent null at roots
    * @return (node, anc) — one row per (node, ancestor-or-self)
    */
  def ancestorClosure(nodes: DataFrame): DataFrame =
    PlanScope.isolatedStaticFor(nodes) { scoped =>
      val n2 = PlanScope.rebind(nodes, scoped)
      val (levels, spent) = climb(n2)
      val out = levels.reduce(_ unionByName _)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // the one materialization: lands the Σdepth(node)-sized closure in
      // cache, then the per-round pins are released
      out.count()
      spent.foreach(_.unpersist(blocking = false))
      out
    }

  /** Per-node subtree rollup: for every node, the count and value sum of
    * its whole subtree (itself + all descendants) — the BOM-explosion /
    * category-total query. One frontier climb + one grouped aggregate
    * with map-side partials on the ancestor key; the closure is consumed
    * LAZILY by the rollup (a union of cached level scans), so the
    * Σ depth(node)-sized intermediate is never itself materialized into
    * cache — the rollup's single action is the only job after the climb.
    *
    * Cache-release contract (same as [[graft.operators.Graphs]]): the
    * returned |nodes|-sized frame is persisted and materialized —
    * `out.unpersist()` releases it, or
    * [[graft.operators.Graphs.detachSmall]] hands a bounded rollup over
    * as a LocalRelation leaving zero registered blocks.
    *
    * @param nodes (id, parent, value) — parent null at roots, value long
    * @return (id, n_nodes, subtree_value)
    */
  def subtreeRollup(nodes: DataFrame): DataFrame =
    PlanScope.isolatedStaticFor(nodes) { scoped =>
      val n2 = PlanScope.rebind(nodes, scoped)
      val (levels, spent) = climb(n2.select(col("id"), col("parent")))
      val pairs = levels.reduce(_ unionByName _)
      val out = pairs
        .join(n2.select(col("id").as("__vid"), col("value")),
          pairs("node") === col("__vid"))
        .groupBy(col("anc"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("value")).as("subtree_value"))
        .select(col("anc").as("id"), col("n_nodes"), col("subtree_value"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // materialize the |nodes|-sized rollup, then release the climb's pins
      out.count()
      spent.foreach(_.unpersist(blocking = false))
      out
    }
}
