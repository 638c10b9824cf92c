package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expressions.TextExpressions

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, token counting, language ID, quality scoring, document
  * fingerprinting, shingling, and a portable 60-bit hash.
  *
  * The per-token kernels (tokens/shingles/hash/fingerprint/simhash and the
  * token-array statistics) are custom codegen'd Catalyst expressions
  * (graft.expressions) — Spark's higher-order functions
  * (transform/filter/aggregate) evaluate their lambda interpreted per
  * element, which made text processing the bench bottleneck. The builtin
  * HOF equivalents live on as `*Hof` for the equivalence specs; both forms
  * are bit-identical, so either is DuckDB-oracle-checkable.
  *
  * Engine-portability convention: hashes are derived from `md5` hex (same
  * bytes on any engine) so DuckDB oracles can reproduce them exactly —
  * `hash60` ≡ DuckDB `('0x'||substr(md5(x),1,15))::BIGINT`.
  */
object TextFunctions {

  /** 60-bit deterministic hash: first 15 hex chars of md5 as a long.
    * Positive, portable across engines; used by minhash/simhash/fingerprint. */
  def hash60(c: Column): Column = TextExpressions.hash60(c)

  private[graft] def hash60Hof(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens, empties dropped. */
  def tokens(c: Column): Column = TextExpressions.tokens(c)

  private[graft] def tokensHof(c: Column): Column =
    filter(split(c, " "), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * other non-space chars — the pre-tokenization regex shape used by
    * byte-pair encoders, kept POSIX-simple so Java and RE2 agree. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Distinct word n-gram shingles (the unit for Jaccard/minhash dedup). */
  def wordShingles(c: Column, n: Int): Column = TextExpressions.wordShingles(c, n)

  private[graft] def wordShinglesHof(c: Column, n: Int): Column = {
    val ws = tokensHof(c)
    val grams = transform(sequence(lit(0), size(ws) - n), i =>
      concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*))
    array_distinct(
      when(size(ws) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** `[total, distinct, max-count]` word n-gram repetition counts — the raw
    * form of the Gopher repetition quality signals (duplicate-n-gram and
    * top-n-gram fractions). Counted by exact n-gram string, one pass. */
  def ngramRepetition(c: Column, n: Int): Column = TextExpressions.ngramRepetition(c, n)

  /** `[emails, ipv4s, phones]` PII token counts over whitespace tokens —
    * the flag/audit form of PII scrubbing (route docs to review, bound
    * redaction volume). Token-level anchored rules, one codegen'd pass;
    * see TextKernels for the exact regex-equivalent semantics. */
  def piiStats(c: Column): Column = TextExpressions.piiStats(c)

  /** Redacted text: every email/IPv4/phone token replaced by `<EMAIL>`/
    * `<IP>`/`<PHONE>`, all other bytes (whitespace runs included)
    * preserved verbatim. The normalize form of PII scrubbing — run
    * between quality filtering and packing. */
  def scrubPii(c: Column): Column = TextExpressions.piiScrub(c)

  /** Canonical text normalization: NFC + ROOT lowercase + ASCII
    * whitespace collapse/trim (see TextKernels.normalizeText). */
  def normalizeText(c: Column): Column = TextExpressions.normalizeText(c)

  /** Text with every repeat of an earlier line in the SAME document
    * dropped ('\n' segments, empties kept, first occurrence wins) — the
    * intra-document exact dedup stage (C4-style repeated-line removal),
    * a pure per-row map that runs before any corpus-wide dedup.
    * Complements [[graft.operators.Dedup.dedupLines]], which drops lines
    * frequent ACROSS the corpus and needs a shuffle; this one needs none. */
  def dedupLinesInDoc(c: Column): Column = TextExpressions.dedupLinesInDoc(c)

  /** ALL word n-grams in document order, repeats kept — the counting form
    * of [[wordShingles]] (which is the distinct set form). Feed to an
    * explode + grouped count for pair/gram frequency passes (the BPE
    * merge-rule inner loop). */
  def ngramList(c: Column, n: Int): Column = TextExpressions.ngramList(c, n)
  def deletionVariants(c: Column, maxDist: Int): Column =
    TextExpressions.deletionVariants(c, maxDist)

  /** Raw-deflate byte count of the UTF-8 text (level 6, thread-local
    * Deflater) — the compression-ratio quality signal: templated or
    * repetitive text compresses far below prose, mojibake barely
    * compresses at all. Pair with `octet_length` for a permille ratio.
    * Deterministic within a JVM; exact counts are zlib-version-dependent,
    * so its query is rows-only-checked rather than hash-compared. */
  def deflateLen(c: Column): Column = TextExpressions.deflateLen(c)

  /** `[n_features, score_sum]` of the hashed-feature linear quality model
    * (unigrams + bigrams → `nBuckets` weight slots, milli-unit weights). */
  def hashedLinearScore(c: Column, nBuckets: Int = 1 << 16): Column =
    TextExpressions.hashedLinearScore(c, nBuckets)

  private[graft] def ngramRepetitionHof(c: Column, n: Int): Column = {
    val ws = tokensHof(c)
    val grams = when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
    val maxCount = coalesce(
      array_max(transform(array_distinct(grams), g =>
        size(filter(grams, x => x === g)))).cast("long"), lit(0L))
    array(size(grams).cast("long"), size(array_distinct(grams)).cast("long"), maxCount)
  }

  /** Stopword profiles for the n-gram/stopword language heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "a", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"))

  private def profileHits(ws: Column, profile: Seq[String]): Column =
    TextExpressions.countInSet(ws, profile)

  /** Language ID: most stopword hits wins; earlier profile wins ties;
    * zero hits everywhere → "unknown". Deterministic, oracle-replicable. */
  def langId(c: Column): Column = {
    val ws = tokens(c)
    val scores = langProfiles.map { case (lang, prof) => lang -> profileHits(ws, prof) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown")) { case ((lang, score), el) =>
      when(score === best && score > 0, lit(lang)).otherwise(el)
    }
  }

  /** Quality heuristics, all exact-integer (per-mille) so results hash
    * identically across engines:
    *   - stop_permille: stopword tokens / tokens
    *   - alpha_permille: purely alphabetic tokens / tokens
    *   - avg_token_len_permille: 1000 * Σ len(token) / n_tokens
    *   - quality: 500 if token count in a sane band, plus stopword signal
    */
  def stopPermille(c: Column): Column = {
    val ws = tokens(c)
    val hits = profileHits(ws, langProfiles.flatMap(_._2).distinct)
    floor(lit(1000) * hits / greatest(size(ws), lit(1))).cast("long")
  }

  def alphaPermille(c: Column): Column = {
    val ws = tokens(c)
    floor(lit(1000) * TextExpressions.countAlpha(ws) / greatest(size(ws), lit(1))).cast("long")
  }

  private[graft] def alphaPermilleHof(c: Column): Column = {
    val ws = tokensHof(c)
    val alpha = size(filter(ws, t => t.rlike("^[a-z]+$")))
    floor(lit(1000) * alpha / greatest(size(ws), lit(1))).cast("long")
  }

  def avgTokenLenPermille(c: Column): Column = {
    val ws = tokens(c)
    floor(lit(1000) * TextExpressions.sumLen(ws) / greatest(size(ws), lit(1))).cast("long")
  }

  private[graft] def avgTokenLenPermilleHof(c: Column): Column = {
    val ws = tokensHof(c)
    val total = aggregate(ws, lit(0L), (acc, t) => acc + length(t).cast("long"))
    floor(lit(1000) * total / greatest(size(ws), lit(1))).cast("long")
  }

  def qualityScore(c: Column): Column = {
    val nt = tokenCount(c)
    // stepwise integer division (floor each term) so an engine computing
    // with integer `//` gets the identical value
    (when(nt.between(10, 10000), lit(500L)).otherwise(lit(0L))
      + floor(stopPermille(c) / 2).cast("long")
      + floor(alphaPermille(c) / 4).cast("long"))
  }

  /** Rolling-hash document fingerprint: position-weighted token hashes,
    * folded mod p = 1e9+7. Equals `(Σ (hash60(t_i) mod p) * ((i mod 31)+1))
    * mod p` — mod distributes over the fold, so an engine summing first and
    * reducing once gets the same value. */
  val FpMod = 1000000007L
  def fingerprint(c: Column): Column = TextExpressions.fingerprint(tokens(c))

  private[graft] def fingerprintHof(c: Column): Column = {
    val ws = tokensHof(c)
    val terms = transform(ws, (t, i) =>
      pmod(hash60Hof(t), lit(FpMod)) * (pmod(i.cast("long"), lit(31L)) + 1L))
    pmod(aggregate(terms, lit(0L), (acc, x) => pmod(acc + x, lit(FpMod))), lit(FpMod))
  }

  /** 32-bit SimHash over whitespace tokens (term frequency implicitly
    * weighted: repeated tokens vote repeatedly). Bit j is the sign of
    * Σ_tokens (±1 by bit j of hash60(token)). */
  def simhash32(c: Column): Column = TextExpressions.simhash32(tokens(c))

  private[graft] def simhash32Hof(c: Column): Column = {
    val th = transform(tokensHof(c), t => hash60Hof(t))
    (0 until 32).map { j =>
      val votes = aggregate(th, lit(0L), (acc, h) =>
        acc + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
