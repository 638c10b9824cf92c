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
}
