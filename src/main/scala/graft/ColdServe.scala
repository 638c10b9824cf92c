package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cold-session serving probe (not part of the driver contract): a FRESH
  * JVM pointed at an existing warehouse runs named `SparkEntry.queries`
  * entries and prints one `COLDSERVE <name> <hash>` line per query — the
  * restart-survival half of the served-artifact lifecycle test
  * (ServingSpec launches this as a child process and compares hashes
  * against the warm session that originally cut the artifacts).
  *
  * A restarting ingestion driver holds NO in-memory catalog: every
  * served table (IVF buckets, BM25 postings, release digest/band/fit
  * frames, link graph, tokenizer rules) is re-entered through
  * `Serving.ensureServedTable`, which clears the stale on-disk
  * directories the dead JVM left and rebuilds deterministically — so a
  * restarted server must serve byte-identical results, which is exactly
  * what the hash comparison pins.
  *
  * Usage: ColdServe <sfDir> <warehouseDir> <query>[,query...]
  */
object ColdServe {

  /** Order-insensitive content hash of a result: column names sorted,
    * every cell rendered to a string, rows sorted, md5 over the whole
    * block. Mirrors the driver's oracle-compare framing (sort columns by
    * name, then hash values) closely enough for an equality pin.
    * Cells join on \\u0001 and each row feeds the digest with a trailing
    * LF — without the row delimiter, the same cell bytes split at
    * different row boundaries would collide and the restart pin could
    * false-pass on a real drift. */
  def resultHash(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).mkString(""))
      .sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ColdServe <sfDir> <warehouseDir> <query,...>")
    val Array(sfDir, warehouse, nameArg) = args.take(3)
    val names = nameArg.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-coldserve")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"COLDSERVE $n ${resultHash(df)}")
    }
    spark.stop()
  }
}
