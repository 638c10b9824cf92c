package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram-Jaccard near-dup detection over a `(doc_id, text)`
  * corpus.
  *
  * Scale design (the point of these shapes at 100 TB):
  *   - No operator ever materializes the O(n²) pair space. Candidates come
  *     from equi-joins on hash buckets (LSH bands, simhash bands, shared
  *     shingles) — Catalyst plans them as shuffle hash joins keyed on the
  *     bucket, so cost tracks the number of *colliding* pairs, not n².
  *   - Everything is expression-only (no UDFs): shingling/minhashing run
  *     inside WholeStageCodegen on the scan side of the shuffle.
  *   - Hashes are md5-derived (`hash60`) — deterministic across engines and
  *     runs, so results are reproducible and oracle-checkable.
  */
object Dedup {

  /** Exact dedup: group identical texts by md5, keep the smallest doc_id as
    * the canonical representative. One shuffle on the 128-bit digest. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-3-gram shingles per doc, exploded: (doc_id, sh). */
  private def explodedShingles(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), explode(wordShingles(col("text"), n)).as("sh"))

  /** Exact pairwise intersection counts via inverted-index self-join: only
    * pairs sharing ≥1 shingle ever exist. This is also the MinHash verify
    * step — candidates are a subset of these pairs by construction. */
  private def pairIntersections(ex: DataFrame): DataFrame = {
    val a = ex.as("a")
    val b = ex.as("b")
    a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_cnt"))
  }

  private def shingleSizes(ex: DataFrame): DataFrame =
    ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))

  /** Attach union size + integer jaccard-permille and filter by threshold.
    * The filter compares `1000*inter >= permille*union` in exact integer
    * math — no float boundary can flip membership. */
  private def jaccardFilter(pairs: DataFrame, ex: DataFrame, minPermille: Int): DataFrame = {
    val sz = shingleSizes(ex)
    pairs
      .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("union_cnt", col("sa.n_sh") + col("sb.n_sh") - col("inter_cnt"))
      .filter(lit(1000) * col("inter_cnt") >= lit(minPermille) * col("union_cnt"))
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"), col("union_cnt"),
        floor(lit(1000) * col("inter_cnt") / col("union_cnt")).cast("long").as("jac_permille"))
  }

  /** MinHash + LSH banding near-dup pairs.
    *
    * numHashes minhash values (min over shingles of hash60(i++":"++sh)),
    * grouped into bands of `rowsPerBand`; docs colliding on any full band
    * become candidates; candidates are then *exactly* verified against the
    * jaccard threshold. With 12 hashes / 4 bands of 3 the capture
    * probability at j=0.8 is 1-(1-0.8³)⁴ ≈ 0.94.
    *
    * At scale the only shuffles are: shingle explode → groupBy(doc,i) for
    * signatures (combiner-friendly min), band groupBy, band-bucket join,
    * and the shared-shingle verify join — all keyed equi-joins, never a
    * cross product.
    */
  def minhashLshPairs(
      docs: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 12,
      rowsPerBand: Int = 3,
      minJaccardPermille: Int = 800): DataFrame = {
    val ex = explodedShingles(docs, shingleN)
    val mh = ex
      .crossJoin(spark_range_df(ex, numHashes))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(hash60(concat(col("i").cast("string"), lit(":"), col("sh")))).as("mh"))
    val bands = mh
      .groupBy(col("doc_id"), (col("i") / rowsPerBand).cast("long").as("band"))
      .agg(md5(array_join(transform(array_sort(collect_list(struct(col("i"), col("mh")))),
        s => s.getField("mh").cast("string")), ",")).as("bh"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val verified = pairIntersections(ex)
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
    jaccardFilter(verified, ex, minJaccardPermille)
  }

  // A 0..n-1 integer DataFrame sharing docs' session (for the hash-index
  // cross join — n rows, broadcast, negligible).
  private def spark_range_df(ref: DataFrame, n: Int): DataFrame =
    ref.sparkSession.range(0, n).toDF("i")

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    *
    * Banded exactly: the 32-bit simhash splits into `maxHamming + 1` chunks;
    * by pigeonhole any pair within the distance budget collides on ≥1 whole
    * chunk, so the chunk-equality join loses nothing while replacing the
    * O(n²) comparison with an equi-join on (chunk_idx, chunk_value).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nChunks = maxHamming + 1
    val bitsPerChunk = 32 / nChunks
    val sh = docs.select(col("doc_id"), simhash32(col("text")).as("sim"))
    val chunks = sh.select(col("doc_id"), col("sim"),
      explode(array((0 until nChunks).map { k =>
        struct(lit(k).as("k"),
          shiftright(col("sim"), k * bitsPerChunk)
            .bitwiseAND(lit((1L << bitsPerChunk) - 1)).as("v"))
      }: _*)).as("c"))
    val cand = chunks.as("x")
      .join(chunks.as("y"),
        col("x.c.k") === col("y.c.k") && col("x.c.v") === col("y.c.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sim").as("sim_a"), col("y.sim").as("sim_b"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity join via inverted index: pairs sharing
    * ≥1 shingle, filtered to jaccard ≥ threshold. The candidate space is
    * bounded by shingle co-occurrence, not n². */
  def ngramJaccardPairs(docs: DataFrame, shingleN: Int = 3, minPermille: Int = 500): DataFrame = {
    val ex = explodedShingles(docs, shingleN)
    jaccardFilter(pairIntersections(ex), ex, minPermille)
  }
}
