package graft

import org.apache.spark.sql.functions._
import graft.queries.Serving

/** The served link-graph artifacts (queries/Serving.scala): built once
  * per session, and content-identical to the in-call ad-hoc derivation
  * the q72/q61 cross-check entries keep measured. */
class ServingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("tradePairCounts equals the ad-hoc fact-table derivation") {
    val served = Serving.tradePairCounts(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val adhoc = Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long").as("src"),
        col("c_nationkey").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    assert(served.count() > 0)
    assert(served.exceptAll(adhoc).isEmpty && adhoc.exceptAll(served).isEmpty)
  }

  test("copurchasePairCounts equals the ad-hoc self-join derivation") {
    val served = Serving.copurchasePairCounts(spark, dir)
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("src"))
    val b = op.select(col("l_orderkey").as("__ok"), col("l_partkey").as("dst"))
    val adhoc = a.join(b, col("l_orderkey") === col("__ok") && col("src") < col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n_orders"))
    assert(served.count() > 0)
    assert(served.exceptAll(adhoc).isEmpty && adhoc.exceptAll(served).isEmpty)
  }

  test("recallAtKWith over the served IVF index equals the in-call fit") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 5)
    val t = Serving.ivfIndexTable(spark, dir)
    val served = Similarity.recallAtKWith(Similarity.loadIvf(spark, t),
      emb, q, k = 3, nprobe = 2).collect()
    val adhoc = Similarity.recallAtK(emb, q, k = 3, nCells = 16, nprobe = 2).collect()
    assert(served.toSeq === adhoc.toSeq)
  }

  test("bpeMergeRules is stable across calls and non-empty") {
    val r1 = Serving.bpeMergeRules(spark, dir)
    val r2 = Serving.bpeMergeRules(spark, dir)
    assert(r1.size === 6 && r1 === r2)
  }

  test("second call is a catalog hit — same table, no rebuild") {
    // self-sufficient: build (or catalog-hit) once first, so the test
    // does not depend on suite ordering
    Serving.tradePairCounts(spark, dir).count()
    val t = Serving.servedTableName("graft_trade_pairs_", dir)
    assert(spark.catalog.tableExists(t))
    // a rebuild rewrites the warehouse files; a catalog hit must not
    // touch them — pin via file modification times, which a same-content
    // rebuild would still bump
    def fileStamps(): Map[String, Long] = {
      val wh = java.net.URI.create(
        spark.conf.get("spark.sql.warehouse.dir")).getPath
      val root = new java.io.File(wh, t)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = fileStamps()
    assert(before.nonEmpty)
    assert(Serving.tradePairCounts(spark, dir).count() > 0)
    assert(fileStamps() === before, "second call must not rewrite the artifact")
  }
}
