package graft

import org.apache.spark.sql.functions._
import graft.operators.Baskets

class BasketsSpec extends SparkTestBase {
  import spark.implicits._

  // baskets: 1 -> {10,20,30}, 2 -> {10,20}, 3 -> {40}, plus a duplicate
  // item row in basket 1 that must collapse before support counting
  private def toy = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L), (1L, 20L),
    (2L, 10L), (2L, 20L),
    (3L, 40L)).toDF("basket", "item")

  test("pairs and support match the brute-force definition; duplicates collapse") {
    val got = Baskets.copurchasePairs(toy, "basket", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (10L, 20L, 2L), // baskets 1 and 2
      (10L, 30L, 1L), (20L, 30L, 1L)))
  }

  test("maxBasketSize drops oversized baskets whole; boundary is inclusive") {
    // cap 2: basket 1 (3 distinct items) is rejected, basket 2 survives
    val capped = Baskets.copurchasePairs(toy, "basket", "item", maxBasketSize = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped === Set((10L, 20L, 1L)))
    // cap 3 keeps every basket — identical to the uncapped mine
    val at3 = Baskets.copurchasePairs(toy, "basket", "item", maxBasketSize = Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val uncapped = Baskets.copurchasePairs(toy, "basket", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(at3 === uncapped)
    // the size test counts DISTINCT items: basket 1 has 4 rows but 3
    // distinct items, so cap 3 must not reject it (asserted by at3 above
    // containing its pairs)
    assert(at3.contains((10L, 30L, 1L)))
  }

  test("degenerate caps fail loudly") {
    intercept[IllegalArgumentException] {
      Baskets.copurchasePairs(toy, "basket", "item", maxBasketSize = Some(1))
    }
  }
}
