package graft

import org.apache.spark.sql.functions._
import graft.ops.Hierarchy

class HierarchySpec extends SparkTestBase {
  import spark.implicits._

  // forest:  1            10
  //         / \            |
  //        2   3          11
  //            |
  //            4
  private def forest = Seq(
    (1L, None, 100L), (2L, Some(1L), 10L), (3L, Some(1L), 20L),
    (4L, Some(3L), 5L), (10L, None, 1L), (11L, Some(10L), 2L)
  ).toDF("id", "parent", "value")

  test("ancestorClosure emits every (node, ancestor-or-self) pair") {
    val pairs = Hierarchy.ancestorClosure(forest.select($"id", $"parent"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set(
      1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 10L -> 10L, 11L -> 11L,
      2L -> 1L, 3L -> 1L, 4L -> 3L, 4L -> 1L, 11L -> 10L))
  }

  test("subtreeRollup aggregates value and count over each subtree") {
    val out = Hierarchy.subtreeRollup(forest)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((4L, 135L)),  // 100+10+20+5
      2L -> ((1L, 10L)),
      3L -> ((2L, 25L)),   // 20+5
      4L -> ((1L, 5L)),
      10L -> ((2L, 3L)),   // 1+2
      11L -> ((1L, 2L))))
  }

  test("single-node forest (all roots) is the identity rollup") {
    val roots = Seq((1L, None: Option[Long], 7L), (2L, None: Option[Long], 9L))
      .toDF("id", "parent", "value")
    val out = Hierarchy.subtreeRollup(roots)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 7L, 2L -> 9L))
  }

  test("depth is discovered, not assumed: a 6-deep chain closes fully") {
    // 1 <- 2 <- 3 <- 4 <- 5 <- 6, value = id
    val chain = (1L to 6L).map(i =>
      (i, if (i == 1L) None else Some(i - 1), i)).toDF("id", "parent", "value")
    val out = Hierarchy.subtreeRollup(chain)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((6L, 21L)))  // whole chain
    assert(out(6L) === ((1L, 6L)))   // leaf
    assert(out(4L) === ((3L, 15L)))  // 4+5+6
  }

  test("empty input yields empty rollup") {
    val empty = Seq.empty[(Long, Option[Long], Long)].toDF("id", "parent", "value")
    assert(Hierarchy.subtreeRollup(empty).count() === 0L)
  }
}
