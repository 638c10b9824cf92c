package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the codegen'd text expressions. Generated code calls
  * these static forwarders directly, so the work happens in tight compiled
  * loops instead of per-element Catalyst lambda interpretation (the
  * higher-order-function route costs ~1ms/doc; these are ~1µs/doc).
  *
  * Every kernel is bit-compatible with the builtin-expression form it
  * replaces (asserted by TextExprSpec), keeping the DuckDB oracles valid:
  *   - tokens      ≡ filter(split(s, " "), len > 0)
  *   - shingles    ≡ array_distinct(transform(sequence(...), concat_ws(" ", ...)))
  *   - hash60      ≡ conv(substring(md5(s), 1, 15), 16, 10) :: long
  *   - fingerprint ≡ pmod-weighted fold of hash60 over tokens
  *   - simhash32   ≡ 32 sign-of-vote bits over token hash60s
  */
object TextKernels {

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 (15 hex chars parsed base-16) — identical to
    * `conv(substring(md5(x),1,15),16,10)::long` and to DuckDB
    * `('0x'||substr(md5(x),1,15))::BIGINT`. */
  def hash60(s: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(s.getBytes)
    // first 15 hex nibbles = first 8 bytes big-endian, dropping the low nibble
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Non-empty chunks of `s` split on single spaces. */
  def tokens(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    val len = str.length
    while (i < len) {
      if (str.charAt(i) == ' ') i += 1
      else {
        var j = i + 1
        while (j < len && str.charAt(j) != ' ') j += 1
        out.add(UTF8String.fromString(str.substring(i, j)))
        i = j
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct word n-grams joined by " ", first-occurrence order. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = str.length
    while (i < len) {
      if (str.charAt(i) == ' ') i += 1
      else {
        var j = i + 1
        while (j < len && str.charAt(j) != ' ') j += 1
        toks.add(str.substring(i, j))
        i = j
      }
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var k = 0
    while (k < m) {
      val sb = new java.lang.StringBuilder(toks.get(k))
      var j = 1
      while (j < n) { sb.append(' ').append(toks.get(k + j)); j += 1 }
      seen.add(sb.toString)
      k += 1
    }
    val arr = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct word n-gram shingles, each hash60'd, sorted ascending and
    * deduplicated — the set-as-sorted-long-array representation used by the
    * Jaccard join. Hashing shrinks the shuffled bytes ~4× vs the strings
    * and makes set intersection a primitive merge; a 60-bit collision
    * perturbs one pair's count by 1 with probability ~n²/2^61 — negligible
    * against the corpus sizes where exact dedup is even computed. */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val sh = shingles(s, n)
    val m = sh.numElements()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = hash60(sh.getUTF8String(i)); i += 1 }
    java.util.Arrays.sort(hs)
    // dedupe (only differs from the string set on a hash collision)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    val out = new Array[Long](w)
    System.arraycopy(hs, 0, out, 0, w)
    new GenericArrayData(out)
  }

  /** MinHash signature of the document's distinct word n-gram shingles:
    * `sig[i] = min over shingles of hash60(i + ":" + shingle)` — the
    * SAME values the exploded `groupBy(doc_id).agg(min(hash60(concat(i,
    * ":", sh))))` form produced (identical UTF-8 bytes into the same
    * md5 path), computed in ONE row pass so LSH banding never pays a
    * corpus exchange for signatures. Empty shingle sets return an empty
    * array (the exploded form produced no row — callers filter). */
  def minhashSig(s: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val sh = shingles(s, n)
    val m = sh.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    // md5("k:" ++ shingle) built incrementally: the "k:" prefixes encode
    // once per call and each shingle's UTF-8 bytes once per shingle —
    // the naive string-concat form re-encoded the shingle numHashes
    // times and dominated the kernel
    val prefixes = Array.tabulate(numHashes)(k =>
      (k.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val d = md5Local.get()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val sb = sh.getUTF8String(i).getBytes
      var k = 0
      while (k < numHashes) {
        d.reset()
        d.update(prefixes(k))
        d.update(sb)
        val h = d.digest()
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
        val hv = v >>> 4
        if (hv < sig(k)) sig(k) = hv
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** LSH band hashes from a [[minhashSig]] signature: band `b` =
    * lowercase-hex md5 of the comma-joined DECIMAL signature rows
    * `sig[b*r] .. sig[b*r+r-1]` — exactly the `md5(concat_ws(","))` of
    * the shared bandStructs rule (BandRuleSpec pins the two in
    * lockstep). One kernel call per row: exposing the signature as a
    * column and slicing it per band re-evaluates the signature kernel
    * once PER BAND COLUMN after projection collapse (the s09 lesson,
    * measured 2.5× on d02). Empty signature → empty array (no bands,
    * like the agg form's absent row). */
  def minhashBands(s: UTF8String, n: Int, numHashes: Int, rowsPerBand: Int): ArrayData = {
    val sig = minhashSig(s, n, numHashes)
    if (sig.numElements() == 0) return new GenericArrayData(Array.empty[Any])
    val numBands = numHashes / rowsPerBand
    val d = md5Local.get()
    val hexDigits = "0123456789abcdef"
    val out = new Array[AnyRef](numBands)
    var b = 0
    while (b < numBands) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < rowsPerBand) {
        if (j > 0) sb.append(',')
        sb.append(sig.getLong(b * rowsPerBand + j))
        j += 1
      }
      d.reset()
      val h = d.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hx = new Array[Char](32)
      var q = 0
      while (q < 16) {
        hx(q * 2) = hexDigits.charAt((h(q) >> 4) & 0xf)
        hx(q * 2 + 1) = hexDigits.charAt(h(q) & 0xf)
        q += 1
      }
      out(b) = UTF8String.fromString(new String(hx))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Size of the intersection of two ascending long arrays (merge walk). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    var i = 0
    var j = 0
    var c = 0L
    val n = a.numElements()
    val m = b.numElements()
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Per-word occurrence counts of a fixed word list in a token array —
    * one pass over the tokens, result aligned with `words`. The BM25
    * term-frequency primitive: the HOF spelling (one `filter` lambda per
    * query term) re-walks the token array per term, interpreted. */
  def termFreqs(arr: ArrayData, words: Array[UTF8String]): ArrayData = {
    val counts = new Array[Long](words.length)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      var j = 0
      while (j < words.length) {
        if (words(j).equals(t)) counts(j) += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Count of array elements equal to any word in `words` (small linear set). */
  def countInSet(arr: ArrayData, words: Array[UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      var j = 0
      var hit = false
      while (j < words.length && !hit) { if (words(j).equals(t)) hit = true; j += 1 }
      if (hit) c += 1
      i += 1
    }
    c
  }

  /** Count of purely-[a-z] non-empty elements (≡ rlike "^[a-z]+$"). */
  def countAlpha(arr: ArrayData): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val b = arr.getUTF8String(i).getBytes
      var ok = b.length > 0
      var j = 0
      while (j < b.length && ok) { if (b(j) < 'a' || b(j) > 'z') ok = false; j += 1 }
      if (ok) c += 1
      i += 1
    }
    c
  }

  /** Σ length(element) in characters (≡ aggregate(ws, 0L, acc + length)). */
  def sumLen(arr: ArrayData): Long = {
    var s = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) { s += arr.getUTF8String(i).numChars(); i += 1 }
    s
  }

  /** Rolling-hash fingerprint over a token array (TextFunctions.FpMod). */
  def fingerprint(arr: ArrayData): Long = {
    val Mod = 1000000007L
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val term = (hash60(arr.getUTF8String(i)) % Mod) * ((i % 31) + 1)
      acc = (acc + term) % Mod
      i += 1
    }
    acc
  }

  /** `[total n-grams, distinct n-grams, max single-n-gram count]` over the
    * whitespace tokens of `s` — the raw counts behind Gopher-style
    * repetition quality signals (duplicate-n-gram fraction = (total −
    * distinct) / total, top-n-gram fraction = max / total). One pass, one
    * per-doc hash map bounded by document length; `[0,0,0]` when the doc
    * has fewer than `n` tokens. Counting is by exact n-gram STRING (no
    * hashing), so a DuckDB `unnest → GROUP BY` oracle reproduces it
    * verbatim. */
  def ngramRepetition(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = str.length
    while (i < len) {
      if (str.charAt(i) == ' ') i += 1
      else {
        var j = i + 1
        while (j < len && str.charAt(j) != ' ') j += 1
        toks.add(str.substring(i, j))
        i = j
      }
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, java.lang.Long]()
    var maxC = 0L
    var k = 0
    while (k < m) {
      val key =
        if (n == 1) toks.get(k)
        else {
          val sb = new java.lang.StringBuilder(toks.get(k))
          var j = 1
          while (j < n) { sb.append(' ').append(toks.get(k + j)); j += 1 }
          sb.toString
        }
      val prev = counts.get(key)
      val now = if (prev == null) 1L else prev.longValue() + 1L
      counts.put(key, java.lang.Long.valueOf(now))
      if (now > maxC) maxC = now
      k += 1
    }
    new GenericArrayData(Array[Any](m.toLong, counts.size.toLong, maxC))
  }

  // ---- PII detection (token-level, regex-equivalent rules) ----
  //
  // Classification is per whitespace token, by rules written to be EXACTLY
  // the anchored RE2 regexes the DuckDB oracle uses (t13), so counts and
  // redacted text hash-match across engines:
  //   email ≡ ^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+$
  //   ipv4  ≡ ^(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(\.(...)){3}$
  //           (i.e. four 1-3 digit groups, each value <= 255)
  //   phone ≡ ^\+?[0-9](-?[0-9]){6,14}$   (7-15 digits, single dashes)
  // Token-level rules are the curation trade-off: no partial-token spans
  // (a trailing "," glued to an email hides it), in exchange for exact
  // cross-engine reproducibility and a single-pass scanner with no
  // per-row java.util.regex cost. Run after punctuation normalization if
  // the corpus glues punctuation to tokens.

  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isAsciiAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** 0 = none, 1 = email, 2 = ipv4, 3 = phone (first match wins; the
    * alphabets make the classes disjoint anyway). */
  private def piiClass(t: String): Int = {
    if (isEmail(t)) 1
    else if (isIpv4(t)) 2
    else if (isPhone(t)) 3
    else 0
  }

  private def isEmail(t: String): Boolean = {
    val n = t.length
    val at = t.indexOf('@')
    if (at <= 0 || at == n - 1 || t.indexOf('@', at + 1) >= 0) return false
    var i = 0
    while (i < at) {
      val c = t.charAt(i)
      if (!(isAsciiAlpha(c) || isAsciiDigit(c) || c == '.' || c == '_' ||
            c == '%' || c == '+' || c == '-')) return false
      i += 1
    }
    var lastDot = -1
    i = at + 1
    while (i < n) {
      val c = t.charAt(i)
      if (c == '.') lastDot = i
      else if (!(isAsciiAlpha(c) || isAsciiDigit(c) || c == '-')) return false
      i += 1
    }
    // >= 1 domain char before the chosen dot, >= 2 all-letter chars after
    if (lastDot <= at + 1 || n - lastDot - 1 < 2) return false
    i = lastDot + 1
    while (i < n) { if (!isAsciiAlpha(t.charAt(i))) return false; i += 1 }
    true
  }

  private def isIpv4(t: String): Boolean = {
    val n = t.length
    var i = 0
    var groups = 0
    while (groups < 4) {
      var d = 0
      var v = 0
      while (i < n && d < 3 && isAsciiDigit(t.charAt(i))) {
        v = v * 10 + (t.charAt(i) - '0'); i += 1; d += 1
      }
      if (d == 0 || v > 255) return false
      groups += 1
      if (groups < 4) {
        if (i >= n || t.charAt(i) != '.') return false
        i += 1
      }
    }
    i == n
  }

  private def isPhone(t: String): Boolean = {
    val n = t.length
    var i = if (n > 0 && t.charAt(0) == '+') 1 else 0
    if (i >= n || !isAsciiDigit(t.charAt(i))) return false
    var digits = 0
    while (i < n) {
      val c = t.charAt(i)
      if (isAsciiDigit(c)) { digits += 1; i += 1 }
      else if (c == '-') {
        // a dash must be followed by a digit: no doubles, no trailing dash
        if (i + 1 >= n || !isAsciiDigit(t.charAt(i + 1))) return false
        i += 1
      } else return false
    }
    digits >= 7 && digits <= 15
  }

  /** `[emails, ipv4s, phones]` token counts — the flag/audit form. */
  def piiStats(s: UTF8String): ArrayData = {
    val str = s.toString
    var e = 0L
    var ip = 0L
    var ph = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      if (str.charAt(i) == ' ') i += 1
      else {
        var j = i + 1
        while (j < len && str.charAt(j) != ' ') j += 1
        piiClass(str.substring(i, j)) match {
          case 1 => e += 1
          case 2 => ip += 1
          case 3 => ph += 1
          case _ => ()
        }
        i = j
      }
    }
    new GenericArrayData(Array[Any](e, ip, ph))
  }

  /** Redaction: every PII token replaced by its placeholder, all other
    * bytes (including whitespace runs) preserved verbatim — ≡ DuckDB
    * `array_to_string(list_transform(string_split(s,' '), ...), ' ')`
    * because single-space splitting keeps empty segments. */
  def piiScrub(s: UTF8String): UTF8String = {
    val str = s.toString
    val len = str.length
    val sb = new java.lang.StringBuilder(len)
    var i = 0
    while (i < len) {
      if (str.charAt(i) == ' ') { sb.append(' '); i += 1 }
      else {
        var j = i + 1
        while (j < len && str.charAt(j) != ' ') j += 1
        val tok = str.substring(i, j)
        piiClass(tok) match {
          case 1 => sb.append("<EMAIL>")
          case 2 => sb.append("<IP>")
          case 3 => sb.append("<PHONE>")
          case _ => sb.append(tok)
        }
        i = j
      }
    }
    UTF8String.fromString(sb.toString)
  }

  private val deflaterLocal: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(6, true))

  /** Raw-deflate output size of `s`'s UTF-8 bytes at level 6 — the
    * compression-ratio quality signal (Dolma/Gopher style: highly
    * repetitive or templated text compresses far below prose; binary
    * mojibake barely compresses). Deterministic within a JVM (fixed
    * level, raw wrapper, thread-local Deflater reset per row); exact
    * byte counts are zlib-version-dependent, which is why this signal's
    * query takes the rows-only oracle path rather than a hash compare. */
  def deflateLen(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = deflaterLocal.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** ALL word n-grams of `s` in order, repeats KEPT — the counting form
    * ([[shingles]] is the distinct set form). The multiset a BPE-style
    * pair-frequency pass aggregates over: every adjacent pair occurrence
    * counts, not just the first per doc. */
  def ngramList(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = str.length
    while (i < len) {
      if (str.charAt(i) == ' ') i += 1
      else {
        var j = i + 1
        while (j < len && str.charAt(j) != ' ') j += 1
        toks.add(str.substring(i, j))
        i = j
      }
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val arr = new Array[AnyRef](m)
    var k = 0
    while (k < m) {
      val sb = new java.lang.StringBuilder(toks.get(k))
      var j = 1
      while (j < n) { sb.append(' ').append(toks.get(k + j)); j += 1 }
      arr(k) = UTF8String.fromString(sb.toString)
      k += 1
    }
    new GenericArrayData(arr)
  }

  /** Lines of `s` (split on '\n', empty segments kept) with every repeat
    * of an earlier line in the SAME document dropped, first-occurrence
    * order preserved — intra-document exact dedup (the C4-style repeated
    * line/paragraph removal that runs BEFORE any corpus-wide stage). One
    * pass per row, no shuffle anywhere. ≡ DuckDB: group split segments by
    * (doc, line), keep MIN(position), string_agg back ordered by it. */
  def dedupLinesInDoc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('\n') < 0) return s
    val seen = new java.util.HashSet[String]()
    val len = str.length
    val sb = new java.lang.StringBuilder(len)
    var first = true
    var start = 0
    var k = 0
    while (k <= len) {
      if (k == len || str.charAt(k) == '\n') {
        val line = str.substring(start, k)
        if (seen.add(line)) {
          if (!first) sb.append('\n')
          sb.append(line)
          first = false
        }
        start = k + 1
      }
      k += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Hashed-feature linear score (the hashing trick, Weinberger et al.
    * 2009 / fastText's classifier input layer): features are the
    * whitespace unigrams plus adjacent bigrams; each feature hashes to one
    * of `nBuckets` weight slots; the document score is the sum of slot
    * weights. Returns `[n_features, score_sum]` with weights in exact
    * milli-units, so a mean-weight threshold is the integer comparison
    * `score_sum >= thresholdMilli * n_features` — no float anywhere.
    *
    * The slot weight is derived from the slot id
    * (`hash60(slotDecimalString) % 2001 - 1000` ∈ [-1000, 1000]) instead
    * of a trained array, so the oracle can rebuild the whole model from
    * SQL; a production scorer swaps that one line for a broadcast
    * `long[nBuckets]` lookup — the shape (fixed model size regardless of
    * vocabulary, one kernel pass per row, no explode, no shuffle) is the
    * point. */
  def hashedLinearScore(s: UTF8String, nBuckets: Int): ArrayData = {
    val str = s.toString
    var n = 0L
    var sum = 0L
    def add(f: String): Unit = {
      val slot = (hash60(UTF8String.fromString(f)) % nBuckets).toInt
      sum += hash60(UTF8String.fromString(String.valueOf(slot))) % 2001L - 1000L
      n += 1
    }
    var prev: String = null
    var i = 0
    val len = str.length
    while (i < len) {
      if (str.charAt(i) == ' ') i += 1
      else {
        var j = i + 1
        while (j < len && str.charAt(j) != ' ') j += 1
        val tok = str.substring(i, j)
        add(tok)
        if (prev != null) add(prev + " " + tok)
        prev = tok
        i = j
      }
    }
    new GenericArrayData(Array(n, sum))
  }

  /** 32-bit simhash over a token array: bit j set iff Σ ±1 votes > 0. */
  def simhash32(arr: ArrayData): Long = {
    val votes = new Array[Long](32)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = hash60(arr.getUTF8String(i))
      var j = 0
      while (j < 32) {
        votes(j) += (((h >> j) & 1L) * 2) - 1
        j += 1
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) r |= 1L << j; j += 1 }
    r
  }

  /** Canonical text normalization, the first stage of every curation
    * pipeline: Unicode NFC composition (decomposed `e`+U+0301 ≡ composed
    * `é` — without it, visually-identical docs evade exact dedup), then
    * ROOT-locale lowercase, then runs of ASCII whitespace
    * `[ \t\n\v\f\r]` collapsed to one space with ends trimmed.
    * EXACTLY this whitespace set (not Character.isWhitespace, which would
    * pull in U+2000-class spaces the SQL replay's `\s` does not match) —
    * the oracle is `trim(regexp_replace(lower(nfc_normalize(s)),
    * '[ \t\n\v\f\r]+', ' ', 'g'))`, same operation order. */
  def normalizeText(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val len = lower.length
    val sb = new java.lang.StringBuilder(len)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < len) {
      val c = lower.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (ws) {
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
  /** All distinct strings reachable from `s` by at most `maxDist`
    * character deletions, `s` itself included — the SymSpell index-key
    * set. Characters are what Spark's `length`/`substring` count
    * (UTF8String chars), so this is positionally identical to the
    * `transform(sequence(1, length(s)), i -> concat(substring(s, 1, i-1),
    * substring(s, i+1, length(s))))` HOF chain it replaces — but one
    * codegen'd call instead of an interpreted lambda tree that
    * re-evaluates O(len) two-substring concats plus an `array_union`
    * per row. */
  def deletionVariants(s: UTF8String, maxDist: Int): ArrayData = {
    val seen = new java.util.LinkedHashSet[UTF8String]()
    seen.add(s)
    // BFS one deletion level at a time: the frontier at depth d holds the
    // NEW distance-d strings, so depth d+1 never regenerates a shorter
    // variant's children twice and the loop terminates at maxDist (or when
    // strings run out of characters). Arbitrary maxDist — the set size is
    // C(n, maxDist)-ish, the caller's blocking-cost knob, not a kernel cap.
    var frontier = new java.util.ArrayList[UTF8String](1)
    frontier.add(s)
    var d = 0
    while (d < maxDist && !frontier.isEmpty) {
      val next = new java.util.ArrayList[UTF8String](frontier.size * 4)
      val it = frontier.iterator()
      while (it.hasNext) {
        val t = it.next()
        val m = t.numChars()
        var j = 0
        while (j < m) {
          val v = UTF8String.concat(t.substring(0, j), t.substring(j + 1, m))
          if (seen.add(v)) next.add(v)
          j += 1
        }
      }
      frontier = next
      d += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
