package graft
/** Driver-smoke replica: entry() on a FRESH DEFAULT session (no UTC TZ,
  * no graft configs) — the exact path the round driver exercises. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows = $n")
    require(n > 0, "driver smoke would fail: entry() returned 0 rows")
    spark.stop()
  }
}
