package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** Deterministic dataset splitting for training pipelines: every corpus
  * that feeds a model needs a train/val/test partition that is (a) stable
  * across runs and engines — no RNG, no row order dependence — and
  * (b) leakage-safe: near-duplicate documents must land in the SAME split,
  * or held-out metrics are contaminated.
  *
  * Both operators are pure per-row functions of a key (a narrow
  * deterministic map over the corpus — no shuffle, no state), so they
  * scale to any corpus size and compose with every other operator. The
  * assignment rule (md5-derived [[hash60]] mod 1000 against cumulative
  * permille fences) is engine-portable and DuckDB-oracle-checkable.
  */
object Splits {

  /** The frozen v1 salted key string: bare key when `salt` is empty, else
    * `salt:key` with a colon-free salt (the restriction that makes the
    * (salt, key) pair unambiguous — salt "a" / key "b1" and salt "ab" /
    * key "1" cannot collide; without it, salt "a:b" / key "c" would hash
    * like salt "a" / key "b:c"). Null keys stringify as "" so every row
    * gets an assignment. THE single source of the salting recipe for
    * every deterministic-sampling operator (splits, mixture, stratified
    * sampling) — persisted assignments are only reproducible while this
    * never changes. */
  private[operators] def saltedKey(key: Column, salt: String): Column = {
    require(!salt.contains(":"),
      s"salt must not contain ':' (it is the salt/key separator in the frozen v1 hash scheme), got '$salt'")
    val keyStr = coalesce(key.cast("string"), lit(""))
    if (salt.isEmpty) keyStr else concat(lit(salt), lit(":"), keyStr)
  }

  /** The frozen v1 permille slot: `hash60(salted key) % 1000` in [0, 1000).
    * See [[saltedKey]] for the salting recipe and its freeze guarantee. */
  def slotColumn(key: Column, salt: String = ""): Column =
    pmod(hash60(saltedKey(key, salt)), lit(1000L))

  /** Split-assignment column: `hash60(salted key) % 1000` landed against
    * cumulative permille fences. `splits` maps name -> permille weight and
    * must sum to 1000 so every row lands in exactly one split. Assignment
    * follows the given order (e.g. train [0,900), val [900,950),
    * test [950,1000)). Null keys hash as the empty string, so they land
    * deterministically in one split rather than in none — totality holds
    * for every row.
    *
    * The salt decorrelates independent splits of the same corpus: two
    * splits with different salts are independent partitions, while the
    * same salt always reproduces the same assignment — the property that
    * makes ablation runs comparable across months of pipeline runs. The
    * empty default hashes the bare key, keeping the oracle-checkable
    * `hash60(key)` form; the salted form (`hash60(salt:key)`, colon-free
    * salt — see [[saltedKey]]) is the v1 scheme and must never change:
    * persisted split assignments are only reproducible while this hash
    * recipe is frozen.
    */
  def splitColumn(key: Column, splits: Seq[(String, Int)], salt: String = ""): Column = {
    require(splits.nonEmpty, "need at least one split")
    splits.foreach { case (nm, w) =>
      require(w > 0, s"split $nm weight must be positive, got $w")
    }
    require(splits.map(_._2).sum == 1000,
      s"split weights must sum to 1000 permille, got ${splits.map(_._2).sum}")
    val slot = slotColumn(key, salt)
    val fences = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    splits.zip(fences).foldRight(lit(null).cast("string")) {
      case (((nm, _), hi), elseCol) => when(slot < hi, lit(nm)).otherwise(elseCol)
    }
  }

  /** Hash-split the frame on `keyCol`: adds a `split` column. Rows sharing
    * a key always co-locate in one split. */
  def hashSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)], salt: String = ""): DataFrame = {
    require(!df.columns.contains("split"),
      "hashSplit writes column 'split', which already exists in the input; rename first")
    df.withColumn("split", splitColumn(col(keyCol), splits, salt))
  }

  /** Leakage-safe split: assigns every document the split of its near-dup
    * component representative, so a near-duplicate can never straddle the
    * train/test fence. `components` is [[Dedup.components]] output
    * (doc_id, component); the split key is the component label, joined
    * back broadcast-or-shuffle by the optimizer.
    *
    * The join is LEFT so a doc absent from the components table still
    * gets a split (keyed on its own doc_id — a singleton component)
    * instead of silently vanishing from the corpus. CAVEAT: the fallback
    * guarantees totality, NOT leakage-safety for uncovered docs — a doc
    * missing from a STALE table may be a near-dup of a covered doc and
    * land across the fence. Rebuild components from the same corpus
    * snapshot being split; audit the fallback set with
    * `filter(col("component") === col("doc_id"))` if staleness is
    * possible.
    *
    * At 100 TB this is one equi-join on doc_id against an
    * already-materialized components table — the split itself stays a
    * per-row map. */
  def leakageSafeSplit(docs: DataFrame, components: DataFrame,
      splits: Seq[(String, Int)], salt: String = ""): DataFrame = {
    // same clash policy as trainingOrder/packChunks: a docs-side
    // 'component' makes the coalesce ambiguous (AnalysisException deep in
    // the plan), and a docs-side 'split' would be silently overwritten;
    // the components frame is projected to its two contract columns so
    // extra columns can't leak into the output
    val clash = Seq("component", "split").filter(docs.columns.contains)
    require(clash.isEmpty,
      s"leakageSafeSplit writes column(s) ${clash.mkString(", ")} that already exist on docs; rename first")
    docs.join(components.select(col("doc_id"), col("component")), Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("split", splitColumn(col("component"), splits, salt))
  }

  /** Deterministic training order: a `shard` assignment and a dense
    * 0-based `pos` within each shard — the "global shuffle" that fixes a
    * training run's data order before shard writing, with no RNG and no
    * global sort. `shard = hash60(salted key) mod nShards`; `pos` ranks
    * `(hash, key)` ascending within the shard. The same salt reproduces
    * the same order bit-for-bit; different salts (e.g. per epoch) give
    * decorrelated orders — the [[saltedKey]] v1 freeze applies.
    *
    * Plan shape: ONE hash exchange on `shard`, then a per-shard external
    * sort — exactly the work an ordered shard write requires. At write
    * time `repartition(col("shard")).sortWithinPartitions(...)` without
    * the pos column does the same job; `pos` exists for consumers (and
    * oracles) that need the order as data. A 100 TB corpus at 10k shards
    * sorts ~10 GB per task — spill-safe, no driver state, and shards are
    * hash-uniform so there is no skew. Determinism of `pos` requires
    * unique keys (duplicate keys tie on `(hash, key)` and rank
    * arbitrarily among themselves). */
  def trainingOrder(df: DataFrame, keyCol: String, nShards: Int,
      salt: String = ""): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val clash = Seq("shard", "pos", "__h").filter(df.columns.contains)
    require(clash.isEmpty,
      s"trainingOrder writes columns ${clash.mkString(", ")} that already exist in the input")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__h", hash60(saltedKey(col(keyCol), salt)))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))) - 1)
        .cast("long"))
      .drop("__h")
  }
}
