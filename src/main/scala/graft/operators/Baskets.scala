package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — the A-priori candidate step a
  * catalog/recommendation pipeline runs over order baskets, and the one
  * relational shape in the library whose cost is QUADRATIC in a per-key
  * group size (basket), not linear in rows.
  *
  * That quadratic term is why the cap parameter exists: at 100 TB one
  * degenerate "everything" basket (a crawler account, a bulk importer, a
  * default-bucket key) turns the self-join into a key-local n² blow-up
  * that no partitioning fixes. `maxBasketSize` makes the usual "baskets
  * are capped upstream" assumption ENFORCEABLE in the plan itself:
  * oversized baskets are dropped whole before pair generation — the
  * standard market-basket treatment (a basket containing everything
  * supports nothing), and SQL-expressible so capped runs stay
  * oracle-checkable too.
  */
object Baskets {

  /** Item pairs co-occurring in the same basket, with basket-support
    * counts.
    *
    * Semantics: duplicates of an item within one basket collapse first
    * (support counts baskets, not item rows); each unordered pair is
    * emitted once as `item_a < item_b`; output is one row per pair with
    * `n_baskets` = number of baskets containing both.
    *
    * Scale shape: one distinct pass, an optional per-basket size window
    * (same `basket` partitioning the self-join needs — no extra
    * exchange shape), then a self-equi-join on the basket key —
    * quadratic only in basket size (bounded by `maxBasketSize` when
    * set), linear in baskets — and a partial-aggregating support count.
    *
    * @param maxBasketSize drop baskets with more than this many DISTINCT
    *        items before pair generation; None = mine every basket (the
    *        caller asserts boundedness, as TPC-H-shaped orders do at ~7)
    */
  def copurchasePairs(
      items: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketSize: Option[Int] = None): DataFrame = {
    maxBasketSize.foreach(cap => require(cap >= 2,
      s"maxBasketSize must be >= 2 (a 1-item basket yields no pairs), got $cap"))
    // entry spread keyed on the BASKET (PlanScope.spreadIfSmall): a
    // one-split input (single-row-group parquet) runs the distinct's
    // map-side partial — a corpus-sized hash build — in ONE task.
    // Hash-partitioning by basket makes the exchange load-bearing, not
    // extra: HashPartitioning(__basket) satisfies the distinct's
    // (__basket, __item) clustering AND the self-join's basket key, so
    // the distinct, the optional cap window, the pair join, and the
    // support count's partial all run on this single exchange — one
    // fewer shuffle than the unspread plan, every stage parallel.
    // No-op at scale (estimate large; the scan fans out with its splits).
    val op = graft.ops.PlanScope.spreadIfSmall(
        items.select(col(basketCol).as("__basket"), col(itemCol).as("__item")),
        "__basket")
      .distinct()
    val bounded = maxBasketSize match {
      case Some(cap) =>
        // count-and-reject per basket: the window runs on the basket
        // partitioning the self-join shuffles to anyway, and per-basket
        // row counts are bounded by the basket domain, never corpus-wide
        op.withColumn("__bn",
            count(lit(1)).over(Window.partitionBy(col("__basket"))))
          .filter(col("__bn") <= cap)
          .drop("__bn")
      case None => op
    }
    val a = bounded.select(col("__basket"), col("__item").as("item_a"))
    val b = bounded.select(col("__basket").as("__bk"), col("__item").as("item_b"))
    a.join(b, col("__basket") === col("__bk") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
  }
}
