package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level curation: normalize URLs to a comparable domain key,
  * drop blocklisted domains, and cap how many documents any one domain may
  * contribute — the standard web-corpus hygiene pass between ingestion and
  * quality filtering (one hot domain must not dominate the training mix,
  * and known-bad domains must not enter it at all).
  *
  * Scale shapes, in order of appearance:
  *   - [[domainOf]] is a pure per-row `regexp_extract` over codegen'd
  *     builtins — no UDF, no shuffle;
  *   - [[filterBlocklist]] is either an `isin` filter (literal list, fully
  *     pushed into the scan's residual) or a broadcast LEFT ANTI join
  *     (table-sized blocklists — millions of domains still broadcast in
  *     tens of MB, so the corpus side never shuffles);
  *   - [[capPerDomain]] is ONE grouped bounded-heap aggregate
  *     ([[graft.expressions.TopKByScore]]) with map-side partials: each
  *     input partition contributes at most `maxPerDomain` rows per domain
  *     to the exchange, where the textbook `row_number() OVER (PARTITION
  *     BY domain)` form would shuffle and sort the WHOLE corpus.
  */
object Domains {

  /** Host-normalization pattern: optional scheme, optional leading
    * `www.`, then everything up to the first `/`, `?`, `#`, or `:port`.
    * Restricted to constructs with identical semantics in Java regex
    * (Spark) and RE2 (the DuckDB oracle): non-capturing groups, one
    * capture, negated classes. Userinfo (`user@host`) is intentionally
    * out of scope — crawl URLs do not carry it.
    */
  private[graft] val UrlPrefixPattern = "^(?:[a-z][a-z0-9+.-]*://)?(?:www\\.)?"
  private[graft] val HostPattern = UrlPrefixPattern + "([^/?#:]+)"

  /** Normalized domain of a URL: lowercased, scheme/`www.`/port/path
    * stripped. Empty string when the input has no extractable host (the
    * caller decides whether empty means "quarantine" or "keep"). */
  def domainOf(url: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      domainOfExpr(org.apache.spark.sql.GraftColumnShim.expression(url)))

  /** The same normalization as a Catalyst tree — the `graft_domain_of`
    * SQL registration builds here, so SQL and Scala cannot drift.
    * NULL input coalesces to "" so the documented "empty = no
    * extractable host" contract holds for null URLs too — otherwise a
    * null url is neither "" (the caller's quarantine/bypass branch) nor
    * a real domain, and rows silently vanish from BOTH forks of a
    * domain-hygiene stage (the curate maxPerDomain bug class). */
  def domainOfExpr(url: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Coalesce, Literal, Lower, RegExpExtract, StringTrim}
    Coalesce(Seq(
      RegExpExtract(Lower(StringTrim(url)), Literal(HostPattern), Literal(1)),
      Literal("")))
  }

  /** Drop rows whose domain is on a literal blocklist. The NOT-isin
    * predicate is codegen'd and evaluated scan-side. Case: curated deny
    * lists small enough to inline (hundreds of entries). */
  def filterBlocklist(df: DataFrame, domainCol: String, blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist: nothing to filter; drop the call instead")
    df.filter(!col(domainCol).isin(blocked: _*))
  }

  /** Drop rows whose domain appears in a blocklist TABLE (first column =
    * domain). LEFT ANTI join with the blocklist broadcast: the corpus side
    * keeps its partitioning, no shuffle. Case: deny lists managed as data
    * (too large or too volatile to inline). */
  def filterBlocklist(df: DataFrame, domainCol: String, blocked: DataFrame): DataFrame = {
    val bCol = blocked.columns.head
    df.join(broadcast(blocked.select(col(bCol).as("__blocked_domain")).distinct()),
      col(domainCol) === col("__blocked_domain"), "left_anti")
  }

  /** Keep at most `maxPerDomain` rows per domain, preferring the highest
    * `priorityCol` (ties broken by smallest key — fully deterministic, so
    * a SQL oracle reproduces the survivors bit-for-bit).
    *
    * Output: `(domainCol, rank, keyCol)`, rank 1-based best-first; join
    * back on the key to recover full rows. Same bounded-heap shape as
    * [[Mixture.stratifiedSample]] (which is this with score = -hash):
    * O(partitions × domains × k) rows ever reach the exchange.
    */
  def capPerDomain(df: DataFrame, keyCol: String, domainCol: String,
      priorityCol: String, maxPerDomain: Int): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain must be positive, got $maxPerDomain")
    // TopKByScore carries ids as LONG and scores as DOUBLE; a non-integral
    // key or priority would be implicitly cast (nulling on overflow) and
    // silently dropped by the aggregate. Fail loudly instead — integral
    // priorities up to 2^52 are exact in a double.
    Seq(keyCol -> "key", priorityCol -> "priority").foreach { case (c, role) =>
      val t = df.schema(c).dataType
      require(Seq("byte", "short", "integer", "long").contains(t.typeName),
        s"capPerDomain needs an integral $role column (TopKByScore is long/double-typed); '$c' is $t")
    }
    df.groupBy(col(domainCol))
      .agg(graft.expressions.TopKByScore.topK(
        col(priorityCol).cast("double"), col(keyCol), maxPerDomain).as("top"))
      .select(col(domainCol), posexplode(col("top")).as(Seq("pos", "kv")))
      .select(col(domainCol), (col("pos") + 1).cast("int").as("rank"),
        col("kv.id").as(keyCol))
  }

  /** Canonical-URL dedup: keep the best row per normalized URL (host +
    * path, query/fragment stripped — the usual crawl recrawl key),
    * preferring highest `orderDesc` (e.g. fetch timestamp). A
    * [[graft.ops.CoreOps.latestByKey]] argmax composition: one shuffle on
    * the canonical URL, at most one row per key per partition shuffled. */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String, orderDesc: Seq[Column]): DataFrame = {
    // shares UrlPrefixPattern with domainOf so a future normalization fix
    // (scheme chars, www variants) cannot reach one and miss the other
    val canon = regexp_extract(
      lower(trim(col(urlCol))), UrlPrefixPattern + "([^?#]*)", 1)
    val clash = Seq("__canonical_url").filter(df.columns.contains)
    require(clash.isEmpty, s"column ${clash.mkString(",")} collides with dedupByCanonicalUrl's working name; rename first")
    graft.ops.CoreOps.latestByKey(
      df.withColumn("__canonical_url", canon),
      Seq(col("__canonical_url")), orderDesc)
      .drop("__canonical_url")
  }
}
