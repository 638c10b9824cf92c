package graft

import org.apache.spark.sql.functions._
import graft.operators.Graphs

class GraphsSpec extends SparkTestBase {
  import spark.implicits._

  // a -> b, a -> c, b -> c, c -> a : the classic 3-node cycle-with-chord
  private def triangle = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("iters=0 returns the uniform init for every node") {
    val r = ranks(Graphs.pageRank(triangle, iters = 0))
    assert(r === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("one iteration matches the hand-computed exact-integer update") {
    // od: 1->2, 2->1, 3->1; contributions (r0=1e6):
    //   node1 <- c(3)=1000000            => 150000 + 85*1000000 div 100 = 1000000
    //   node2 <- c(1)=500000             => 150000 + 85*500000  div 100 =  575000
    //   node3 <- c(1)+c(2)=1500000       => 150000 + 85*1500000 div 100 = 1425000
    val r = ranks(Graphs.pageRank(triangle, iters = 1))
    assert(r === Map(1L -> 1000000L, 2L -> 575000L, 3L -> 1425000L))
  }

  test("authority orders as expected after convergence-ish iterations") {
    // node2's single weak in-edge (half of node1's mass) keeps it strictly
    // last; nodes 1 and 3 trade full-rank mass around the cycle and both
    // dominate it. Re-running must be bit-identical (pure integer math).
    val r = ranks(Graphs.pageRank(triangle, iters = 5))
    assert(r(3L) > r(2L) && r(1L) > r(2L))
    assert(ranks(Graphs.pageRank(triangle, iters = 5)) === r)
  }

  test("sink node keeps teleport-fed rank; source node settles at teleport base") {
    // 1 -> 2 only: node1 has no in-edges => teleport base after iter 1;
    // node2 receives everything node1 has.
    val chain = Seq((1L, 2L)).toDF("src", "dst")
    val r = ranks(Graphs.pageRank(chain, iters = 2))
    assert(r(1L) === 150000L)
    // iter1: r(2) = 150000 + 85*1000000 div 100 = 1000000
    // iter2: r(2) = 150000 + 85*150000  div 100 = 277500
    assert(r(2L) === 277500L)
  }

  test("duplicate edges collapse to one (distinct contract)") {
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("src", "dst")
    val r1 = ranks(Graphs.pageRank(dup, iters = 2))
    val r2 = ranks(Graphs.pageRank(Seq((1L, 2L)).toDF("src", "dst"), iters = 2))
    assert(r1 === r2)
  }

  test("disconnected components do not interact") {
    val two = Seq((1L, 2L), (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val r = ranks(Graphs.pageRank(two, iters = 3))
    // the isolated mutual pair is symmetric: identical ranks
    assert(r(10L) === r(11L))
    // component {1,2} unaffected by {10,11}'s presence
    val solo = ranks(Graphs.pageRank(Seq((1L, 2L)).toDF("src", "dst"), iters = 3))
    assert(r(1L) === solo(1L) && r(2L) === solo(2L))
  }

  test("weighted rank matches hand-computed (r·w) div Σw update") {
    // 1 -(w3)-> 2, 1 -(w1)-> 3: node1 spreads 3/4 to 2, 1/4 to 3.
    // iter1: r(1)=150000; r(2)=150000 + 85*((1e6*3) div 4) div 100
    //        = 150000 + 85*750000 div 100 = 787500
    //        r(3)=150000 + 85*250000 div 100 = 362500
    val w = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = ranks(Graphs.pageRankWeighted(w, iters = 1))
    assert(r === Map(1L -> 150000L, 2L -> 787500L, 3L -> 362500L))
  }

  test("unit weights ≡ unweighted pageRank bit-for-bit") {
    val w1 = triangle.withColumn("w", lit(1L))
    assert(ranks(Graphs.pageRankWeighted(w1, iters = 4)) ===
      ranks(Graphs.pageRank(triangle, iters = 4)))
  }

  test("empty edge list yields an empty rank table") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graphs.pageRank(empty, iters = 3).count() === 0L)
  }
}
