package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exactness baseline, and an IVF
  * (inverted-file) variant as the scale path.
  *
  * Numeric convention: elements are cast to double *before* any multiply,
  * and dot products fold left-to-right over the array — bit-identical on
  * any engine that does the same, which makes cosine scores
  * oracle-checkable after rounding to 1e-6. Norms are precomputed once per
  * vector (not per pair); `sqrt(dot(v,v))` is the same IEEE double either
  * way, so precomputation changes cost, not results.
  *
  * Scale design: brute force is O(|Q|·N·d) — fine when the query set is
  * small and broadcast; IVF first assigns every vector to its nearest
  * centroid (cells), then probes only `nprobe` cells per query, cutting the
  * scanned fraction to ~nprobe/k. Cells are a plain column, so the probe is
  * an equi-join on cell id — shuffle-partitioned by cell, skew-safe under
  * AQE. At real scale centroids come from a sampled k-means and
  * k ≈ sqrt(N); here they are taken deterministically (first k vec_ids) to
  * stay reproducible and oracle-checkable.
  */
object Similarity {

  /** Left-to-right dot product of two equal-length float arrays, in double.
    * Backed by the codegen'd DotProductFF expression — the HOF equivalent
    * (`aggregate(zip_with(...))`) computes the same value but runs
    * interpreted, ~1000× slower per pair (see graft.expressions). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotFF(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** cosine from precomputed norms, scaled to exact micro-units. */
  private def cosE6From(a: Column, b: Column, na: Column, nb: Column): Column =
    round(dot(a, b) / (na * nb) * 1e6).cast("long")

  /** cosine scaled to exact micro-units for hash-stable output. */
  def cosineE6(a: Column, b: Column): Column =
    round(cosine(a, b) * 1e6).cast("long")

  /** Spread a pair-generating (non-equi/cross) join's stream side across
    * the session's shuffle parallelism. A small parquet corpus arrives as
    * one input split, and a nested-loop join inherits the stream side's
    * partitioning — without this, every pair is scored by a single task no
    * matter how many cores exist. Round-robin keeps partitions balanced. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Brute-force cosine top-k: each query vector (small set, broadcast)
    * ranked against all others by (cosine desc, vec_id asc). */
  def bruteForceKnn(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"))
    val c = spread(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
      norm(col("embedding")).as("nn")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_e6", cosE6From(col("qv"), col("nv"), col("qn"), col("nn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_e6").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_e6"))
  }

  /** Deterministic IVF index: centroids = vectors with vec_id < nCells
    * (stand-in for sampled k-means so the structure is reproducible +
    * checkable). Every vector lands in the cell of its nearest centroid
    * (ties → lowest centroid id). */
  def ivfAssign(emb: DataFrame, nCells: Int): DataFrame = {
    val cent = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cell_cos").desc, col("cid"))
    spread(emb).crossJoin(broadcast(cent))
      .withColumn("cell_cos", cosine(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
  }

  /** IVF-probed approximate top-k: each query probes its `nprobe` closest
    * cells and runs exact cosine only inside them. */
  def ivfKnn(emb: DataFrame, queries: DataFrame, k: Int, nCells: Int, nprobe: Int): DataFrame = {
    val assigned = ivfAssign(emb, nCells)
      .withColumn("nn", norm(col("embedding")))
    val cent = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("cell_cos").desc, col("cid"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("cell_cos", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), norm(col("qv")).as("qn"), col("cid").as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_e6").desc, col("neighbor_id"))
    probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("neighbor_id", col("vec_id"))
      .withColumn("cos_e6", cosE6From(col("qv"), col("embedding"), col("qn"), col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_e6"))
  }

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ threshold.
    * Brute pair generation here (fine at test scale); the scale path is
    * bucketing first — ivfAssign, then in-bucket pairing. */
  def embeddingNearDupPairs(emb: DataFrame, minCosE6: Long): DataFrame = {
    val a = spread(emb.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      norm(col("embedding")).as("na")))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      norm(col("embedding")).as("nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos_e6", cosE6From(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos_e6") >= minCosE6)
      .select(col("id_a"), col("id_b"), col("cos_e6"))
  }
}
