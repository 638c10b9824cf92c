package graft

import graft.ops.PlanScope

/** The static-plan scope is session-global state — restoring it exactly
  * (on success, on exception, and under nesting) is what makes wrapping
  * operators in it safe for callers. */
class PlanScopeSpec extends SparkTestBase {

  private val Key = "spark.sql.adaptive.enabled"

  test("staticBatch disables AQE inside and restores the prior value after") {
    val before = spark.conf.get(Key)
    val inside = PlanScope.staticBatch(spark) { spark.conf.get(Key) }
    assert(inside === "false")
    assert(spark.conf.get(Key) === before)
  }

  test("confs restore even when the body throws") {
    val before = spark.conf.get(Key)
    intercept[RuntimeException] {
      PlanScope.staticBatch(spark) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(Key) === before)
  }

  test("nested scopes unwind in order (fixpoints inside pipelines)") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    PlanScope.withConf(spark, "spark.sql.shuffle.partitions" -> "7") {
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "7")
      PlanScope.withConf(spark, "spark.sql.shuffle.partitions" -> "3") {
        assert(spark.conf.get("spark.sql.shuffle.partitions") === "3")
      }
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "7")
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
  }
}
