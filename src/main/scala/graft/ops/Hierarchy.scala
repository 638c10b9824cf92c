package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Hierarchy traversal — the `WITH RECURSIVE` shape Spark has no native
  * operator for, expressed as the bounded iterative-join fixpoint every
  * distributed engine actually runs underneath (Catalyst has no recursion;
  * a driver loop over joins IS the plan, with the same per-level cost
  * model as DuckDB/Postgres recursive CTE evaluation).
  */
object Hierarchy {

  /** All (node, ancestor) pairs of a forest, ancestors including the node
    * itself — the transitive closure UP the parent pointers.
    *
    * The climb is frontier-driven: round i joins the still-climbing
    * frontier (one row per node whose current ancestor has a parent)
    * against the parent map and emits the next ancestor level; the loop
    * stops when the frontier drains, so depth is discovered, never
    * assumed. Each round is ONE equi-join + the convergence count
    * (components-fixpoint discipline: lazy persist per round, previous
    * round released).
    *
    * Scale shape: output is Σ depth(node) rows — linear in corpus for the
    * shallow hierarchies this exists for (taxonomies, directory trees,
    * org charts: depth ~O(log n) or a small constant), NOT a general
    * graph closure. Rounds = max depth, each a join keyed on the current
    * ancestor; the parent map (|V| rows) is persisted once and at real
    * scale broadcasts — the frontier is the only moving frame.
    *
    * @param nodes (id, parent, ...) — parent null at roots
    * @return (node, anc) — one row per (node, ancestor-or-self)
    */
  def ancestorClosure(nodes: DataFrame): DataFrame =
    // Fixpoint loop = known shape re-executed per round: AQE re-planning
    // buys nothing and charges a driver job per exchange per round
    // (PlanScope rationale; measured on q54's board config: 30 → ~8
    // driver jobs, results identical). Unlike the Graphs loops,
    // broadcasts stay ON — the parent map is the small side here and
    // static planning still broadcasts it from its size estimate.
    PlanScope.staticBatch(nodes.sparkSession) {
    val parentMap = nodes.select(col("id").as("__cid"), col("parent").as("__pp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var levels = Vector(nodes.select(col("id").as("node"), col("id").as("anc")))
    var frontier = nodes.filter(col("parent").isNotNull)
      .select(col("id").as("node"), col("parent").as("cur"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var remaining = frontier.count()
    var spent = Vector(frontier)
    while (remaining > 0) {
      levels :+= frontier.select(col("node"), col("cur").as("anc"))
      val next = frontier
        .join(parentMap, frontier("cur") === col("__cid"))
        .filter(col("__pp").isNotNull)
        .select(col("node"), col("__pp").as("cur"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      remaining = next.count()
      frontier = next
      spent :+= next
    }
    val out = levels.reduce(_ unionByName _).persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    spent.foreach(_.unpersist(blocking = false))
    parentMap.unpersist(blocking = false)
    out
    }

  /** Per-node subtree rollup: for every node, the count and value sum of
    * its whole subtree (itself + all descendants) — the BOM-explosion /
    * category-total query. One [[ancestorClosure]] + one grouped
    * aggregate with map-side partials on the ancestor key.
    *
    * Cache-release contract (same as [[graft.operators.Graphs]]): the
    * returned |nodes|-sized frame is persisted and materialized — the pin
    * is on the returned frame, so `out.unpersist()` releases it, or
    * [[graft.operators.Graphs.detachSmall]] hands a bounded rollup over
    * as a LocalRelation leaving zero registered blocks.
    *
    * @param nodes (id, parent, value) — parent null at roots, value long
    * @return (id, n_nodes, subtree_value)
    */
  def subtreeRollup(nodes: DataFrame): DataFrame = PlanScope.staticBatch(nodes.sparkSession) {
    val pairs = ancestorClosure(nodes.select(col("id"), col("parent")))
    val out = pairs
      .join(nodes.select(col("id").as("__vid"), col("value")),
        pairs("node") === col("__vid"))
      .groupBy(col("anc"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("value")).as("subtree_value"))
      .select(col("anc").as("id"), col("n_nodes"), col("subtree_value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the |nodes|-sized rollup so the Σdepth(node)-sized
    // closure (the only corpus-scale intermediate) can be released now
    // instead of staying pinned for the session
    out.count()
    pairs.unpersist(blocking = false)
    out
  }
}
