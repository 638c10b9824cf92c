package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.TextFunctions._

/** The codegen'd text kernels must be bit-identical to the builtin
  * (HOF-expression) forms they replaced — checked on the real sf0.001
  * corpus plus adversarial edge strings.
  */
class TextExprSpec extends SparkTestBase {
  import spark.implicits._

  private val edge = Seq(
    "", " ", "   ", "a", "a b", "a b c", "a  b   c", " leading", "trailing ",
    "x y z w v u", "dup dup dup dup", "mixed CASE 123 #punct!", "ünïcödé tökens herë")
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def corpus = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    docs.union(edge.toDF("doc_id", "text").select($"doc_id" + 1000000, $"text"))
  }

  private def assertSame(fast: org.apache.spark.sql.Column, slow: org.apache.spark.sql.Column): Unit = {
    val diffs = corpus.select(fast.as("f"), slow.as("s"))
      .filter(not($"f" <=> $"s")).count()
    assert(diffs === 0L)
  }

  test("tokens kernel ≡ filter(split) HOF")(
    assertSame(tokens($"text"), TextFunctions.tokensHof($"text")))

  test("wordShingles kernel ≡ transform/sequence HOF, n=2,3,5") {
    for (n <- Seq(2, 3, 5))
      assertSame(wordShingles($"text", n), TextFunctions.wordShinglesHof($"text", n))
  }

  test("deletionVariants kernel ≡ transform/sequence/array_union HOF, maxDist=1,2") {
    // the HOF chain the kernel replaced (EntityResolution's former
    // deletionKeys), compared as SETS (sort_array) — generation order is
    // not part of the contract, the distinct key set is
    def hof(maxDist: Int): org.apache.spark.sql.Column = {
      def del(s: String, i: String) =
        s"concat(substring($s, 1, $i - 1), substring($s, $i + 1, length($s)))"
      val v1 = s"transform(sequence(1, length(text)), i -> ${del("text", "i")})"
      val v2 = s"flatten(transform($v1, t -> transform(sequence(1, length(t)), j -> ${del("t", "j")})))"
      val keys = maxDist match {
        case 1 => s"array_union(array(text), $v1)"
        case 2 => s"array_union(array(text), array_union($v1, $v2))"
      }
      expr(s"CASE WHEN length(text) = 0 THEN array(text) ELSE $keys END")
    }
    // cap the corpus strings to keep the O(len²) maxDist=2 HOF replay
    // test-sized; the cap column exercises the same kernel path
    val short = corpus.select($"doc_id", substring($"text", 1, 24).as("text"))
    for (d <- Seq(1, 2)) {
      val diffs = short.select(
          sort_array(TextFunctions.deletionVariants($"text", d)).as("f"),
          sort_array(hof(d)).as("s"))
        .filter(not($"f" <=> $"s")).count()
      assert(diffs === 0L, s"kernel diverges from HOF at maxDist=$d")
    }
  }

  test("deletionVariants generalizes past maxDist=2 (BFS levels, no silent cap)") {
    // "abcd" at maxDist=3: all subsequences of length >= 1 → sizes 4,3,2,1
    // = C(4,0)+C(4,1)+C(4,2)+C(4,3) = 1+4+6+4 = 15 distinct strings
    val got = Seq(Tuple1("abcd")).toDF("text")
      .select(sort_array(TextFunctions.deletionVariants($"text", 3)).as("v"))
      .head().getSeq[String](0)
    assert(got.length === 15)
    assert(got.contains("a") && got.contains("bd") && got.contains("abcd"))
    // maxDist >= length: bottoms out at the empty string, still terminates
    val all = Seq(Tuple1("ab")).toDF("text")
      .select(sort_array(TextFunctions.deletionVariants($"text", 9)).as("v"))
      .head().getSeq[String](0)
    assert(all === Seq("", "a", "ab", "b"))
    // negative maxDist is rejected at construction, not silently clamped
    intercept[IllegalArgumentException] { TextFunctions.deletionVariants($"text", -1) }
  }

  test("ngramRepetition kernel ≡ count-by-gram HOF, n=1,3") {
    for (n <- Seq(1, 3))
      assertSame(TextFunctions.ngramRepetition($"text", n),
        TextFunctions.ngramRepetitionHof($"text", n))
  }

  test("ngramRepetition counts: total/distinct/max on a known string") {
    // 5 words, 4 distinct, "dup" ×2; trigrams: 3 total, all distinct
    val r = Seq((1L, "dup a dup b c")).toDF("doc_id", "text")
      .select(TextFunctions.ngramRepetition($"text", 1).as("r1"),
        TextFunctions.ngramRepetition($"text", 3).as("r3"))
      .collect()(0)
    assert(r.getSeq[Long](0) === Seq(5L, 4L, 2L))
    assert(r.getSeq[Long](1) === Seq(3L, 3L, 1L))
    // shorter than n: all-zero sentinel
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
      .select(TextFunctions.ngramRepetition($"text", 3).as("r")).collect()(0)
    assert(short.getSeq[Long](0) === Seq(0L, 0L, 0L))
  }

  test("hash60 kernel ≡ conv(substring(md5)) builtins") {
    assertSame(hash60($"text"), TextFunctions.hash60Hof($"text"))
    // and on tokens, where minhash applies it
    assertSame(
      transform(tokens($"text"), t => hash60(t)),
      transform(tokens($"text"), t => TextFunctions.hash60Hof(t)))
  }

  test("hashedLinearScore kernel ≡ independent HOF model replay") {
    // rebuild the model from builtins: unigram+bigram features, two-level
    // md5 slot/weight derivation, integer sum — must match bit-for-bit
    val feats = concat(tokens($"text"), TextFunctions.ngramList($"text", 2))
    val weights = transform(feats, f =>
      TextFunctions.hash60Hof(
        (TextFunctions.hash60Hof(f) % 65536).cast("string")) % 2001 - 1000)
    val slow = array(size(feats).cast("long"),
      aggregate(weights, lit(0L), (acc, w) => acc + w))
    assertSame(TextFunctions.hashedLinearScore($"text"), slow)
  }

  test("hashedLinearScore: featureless and single-token docs") {
    val r = Seq((1L, ""), (2L, "   "), (3L, "solo"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.hashedLinearScore($"text").as("sc"))
      .orderBy("doc_id").collect()
    assert(r(0).getSeq[Long](1) === Seq(0L, 0L))   // empty: no features
    assert(r(1).getSeq[Long](1) === Seq(0L, 0L))   // whitespace only
    val solo = r(2).getSeq[Long](1)
    assert(solo(0) === 1L && solo(1) >= -1000L && solo(1) <= 1000L)
  }

  test("fingerprint kernel ≡ pmod-fold HOF")(
    assertSame(fingerprint($"text"), TextFunctions.fingerprintHof($"text")))

  test("simhash32 kernel ≡ vote-aggregate HOF")(
    assertSame(simhash32($"text"), TextFunctions.simhash32Hof($"text")))

  test("alpha/avg-len permille kernels ≡ HOF forms") {
    assertSame(alphaPermille($"text"), TextFunctions.alphaPermilleHof($"text"))
    assertSame(avgTokenLenPermille($"text"), TextFunctions.avgTokenLenPermilleHof($"text"))
  }

  // the scanner rules are DEFINED to be these anchored regexes (the same
  // ones the t13 DuckDB oracle runs) — pin the equivalence per token
  // against Spark's own regex engine, then pin scrub/stats behavior
  private val EmRe = """^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+$"""
  private val IpRe = """^(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}$"""
  private val PhRe = """^\+?[0-9](-?[0-9]){6,14}$"""

  private val piiTokens = Seq(
    // emails: valid, then each rule violated
    "a@b.co", "user.name+tag@sub.domain-x.org", "A_b%9@x.AB", "a@b..cd",
    "a@b.c", "a@b.c9", "a@.ab", "a@b.", "@b.co", "a@", "a@@b.co", "a b@c.de",
    "ab.co", "a@b", "a@b-x.co", "a@-.co",
    // IPv4: valid, boundary, invalid octets/shape
    "0.0.0.0", "255.255.255.255", "1.2.3.4", "01.02.003.4", "10.0.13.99",
    "256.1.1.1", "300.1.2.3", "1.2.3", "1.2.3.4.5", "1.2.3.", ".1.2.3.4",
    "1..2.3.4", "1.2.3.4567", "1234.1.1.1", "1.2.3.x",
    // phones: valid, then length/shape violations
    "+34-91-555-011", "1234567", "123456789012345", "+1234567", "12-34-567",
    "123456", "1234567890123456", "+-1234567", "1234567-", "12--34567",
    "-1234567", "+", "++1234567", "12.34567", "phone1234567",
    // noise
    "", "word", "<EMAIL>", "a@b.co,", "(1.2.3.4)")

  test("deflateLen: deterministic, bounded, repetition compresses far below prose") {
    val rep = ("ab " * 500).trim
    val varied = (1 to 500).map(i => s"w$i").mkString(" ").take(rep.length)
    val texts = Map(1L -> rep, 2L -> varied, 3L -> "", 4L -> "x")
    val df = texts.toSeq.toDF("id", "text")
    def run() = df.select($"id", TextFunctions.deflateLen($"text"))
      .as[(Long, Long)].collect().toMap
    val got = run()
    assert(got === run(), "deflateLen not deterministic across runs")
    assert(got(1L) < got(2L) / 5,
      s"repetitive ${got(1L)} should compress far below varied ${got(2L)}")
    assert(got(3L) >= 0L && got(3L) < 8L)
    // deflate never expands past input + small constant overhead
    got.foreach { case (id, n) =>
      val raw = texts(id).getBytes("UTF-8").length
      assert(n <= raw + 16, s"doc $id deflate $n vs raw $raw")
    }
  }

  test("termFreqs kernel ≡ per-term filter-count HOFs, corpus + edges") {
    val words = Seq("a", "dup", "tökens", "the", "zzz_absent")
    val hof = words.map(w =>
      size(filter(tokens(col("text")), x => x === w)).cast("long"))
    val mismatches = corpus.unionByName(edge.toDF("doc_id", "text"))
      .select(
        graft.expressions.TextExpressions.termFreqs(tokens(col("text")), words).as("k"),
        array(hof: _*).as("h"))
      .filter(not(col("k") <=> col("h"))).count()
    assert(mismatches === 0L)
  }

  test("ngramList keeps repeats in order (counting form of the shingle set)") {
    val got = corpus.select($"doc_id", TextFunctions.ngramList($"text", 2).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    corpus.as[(Long, String)].collect().foreach { case (id, t) =>
      val toks = t.split(" ", -1).filter(_.nonEmpty).toSeq
      val want =
        if (toks.length < 2) Seq.empty[String]
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      assert(got(id) === want, s"doc $id")
    }
    val df1 = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    assert(df1.select(TextFunctions.ngramList($"text", 2)).as[Seq[String]].head()
      === Seq("a b", "b a", "a b", "b a"))
    // the shingle set keeps only first occurrences — the distinct form
    assert(df1.select(TextFunctions.wordShingles($"text", 2)).as[Seq[String]].head()
      === Seq("a b", "b a"))
  }

  test("dedupLinesInDoc keeps first occurrences, ≡ split/minpos/reassemble reference") {
    val cases = Seq(
      (1L, "a\nb\na\nb\nc"),        // later re-occurrences dropped
      (2L, "a\na\na"),              // immediate repeats collapse
      (3L, "single line no break"), // identity without '\n'
      (4L, "x\n\n\ny"),             // consecutive blanks: first '' kept
      (5L, ""),                     // empty doc
      (6L, "\n"),                   // one blank segment pair: ["",""] -> ""
      (7L, "t \nt\n t\nt"),         // whitespace variants are distinct lines
      (8L, "end\n"))                // trailing '' kept once
    // driver-side reference: first-seen filter over '\n' segments
    def ref(s: String): String = {
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      s.split("\n", -1).foreach(seen.add)
      seen.mkString("\n")
    }
    val got = cases.toDF("id", "text")
      .select($"id", TextFunctions.dedupLinesInDoc($"text"))
      .as[(Long, String)].collect().toMap
    cases.foreach { case (id, t) => assert(got(id) === ref(t), s"case $id") }
    assert(got(1L) === "a\nb\nc" && got(2L) === "a" && got(4L) === "x\n\ny"
      && got(6L) === "" && got(7L) === "t \nt\n t")
    // idempotent and line-set-preserving on the corpus (+ planted repeats)
    val planted = corpus.select($"doc_id",
      concat($"text", lit("\ndup\ndup\n"), $"text").as("text"))
    val bad = planted
      .select($"text", TextFunctions.dedupLinesInDoc($"text").as("once"))
      .select($"text", $"once", TextFunctions.dedupLinesInDoc($"once").as("twice"))
      .filter(not($"once" <=> $"twice") or
        not(array_sort(array_distinct(split($"text", "\n", -1))) <=>
          array_sort(split($"once", "\n", -1))))
      .count()
    assert(bad === 0L)
  }

  test("pii scanner ≡ anchored regexes per token (email/ipv4/phone)") {
    val df = piiTokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id", $"text",
        TextFunctions.piiStats($"text").as("p"))
      .select($"id", $"text", $"p".getItem(0).as("e"), $"p".getItem(1).as("ip"), $"p".getItem(2).as("ph"))
      .collect().map(r => (r.getString(1), (r.getLong(2), r.getLong(3), r.getLong(4))))
    got.foreach { case (t, (e, ip, ph)) =>
      val toks = t.split(" ", -1).filter(_.nonEmpty)
      val want = (
        toks.count(_.matches(EmRe)).toLong,
        toks.count(_.matches(IpRe)).toLong,
        toks.count(_.matches(PhRe)).toLong)
      assert((e, ip, ph) === want, s"token '$t'")
    }
  }

  test("scrubPii replaces PII tokens and preserves whitespace runs verbatim") {
    val df = Seq(
      (1L, "mail a@b.co  twice  1.2.3.4 end"),
      (2L, " lead a@b.co trail "),
      (3L, "a@b.co 1.2.3.4 +34-91-555-011"),
      (4L, "no pii here"),
      (5L, "")).toDF("id", "text")
    val got = df.select($"id", TextFunctions.scrubPii($"text")).as[(Long, String)]
      .collect().toMap
    assert(got(1L) === "mail <EMAIL>  twice  <IP> end")
    assert(got(2L) === " lead <EMAIL> trail ")
    assert(got(3L) === "<EMAIL> <IP> <PHONE>")
    assert(got(4L) === "no pii here")
    assert(got(5L) === "")
    // stats agree with scrub on the corpus: replaced-token count per class
    val stats = corpus.select(TextFunctions.piiStats($"text").as("p"),
        TextFunctions.scrubPii($"text").as("r"))
      .select(($"p".getItem(0) + $"p".getItem(1) + $"p".getItem(2)).as("n"),
        (size(tokens($"r")) - size(array_remove(
          transform(tokens($"r"), t =>
            t.isin("<EMAIL>", "<IP>", "<PHONE>")), true))).as("m"))
      .filter(not($"n" <=> $"m")).count()
    assert(stats === 0L)
  }

  test("normalizeText: NFC unification, ROOT lowercase, whitespace collapse") {
    import graft.functions.TextFunctions.normalizeText
    val composed = "Café"            // precomposed é
    val decomposed = "Café"         // e + combining acute
    val rows = Seq(
      (1L, s"\t $composed  WORLD"),
      (2L, s"$decomposed world"),
      (3L, "already normal"),
      (4L, ""),
      (5L, null: String)
    ).toDF("id", "t").select($"id", normalizeText($"t").as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // composed and decomposed inputs land on the SAME bytes — the exact
    // property that makes exact dedup see through unicode variants
    assert(rows(1L) === Some("café world"))
    assert(rows(2L).get.startsWith("café"))
    assert(rows(1L).get.takeWhile(_ != ' ') === rows(2L).get.takeWhile(_ != ' '))
    assert(rows(3L) === Some("already normal"))
    assert(rows(4L) === Some(""))
    assert(rows(5L) === None)
  }

  test("kernel parameter fences fail at plan time, not per-row in codegen") {
    import graft.expressions.TextExpressions
    import org.apache.spark.sql.functions.col
    // a bad n/rowsPerBand used to surface as IndexOutOfBounds or
    // divide-by-zero inside a codegen'd stage at scale
    intercept[IllegalArgumentException] { TextExpressions.shingleHashes(col("t"), 0) }
    intercept[IllegalArgumentException] { TextExpressions.minhashBands(col("t"), 3, 12, 0) }
    intercept[IllegalArgumentException] { TextExpressions.minhashBands(col("t"), 3, 12, 5) }
    intercept[IllegalArgumentException] { TextExpressions.ngramList(col("t"), 0) }
  }

  test("dot kernels reject dimension mismatch instead of a silent prefix product") {
    import graft.expressions.VectorExpressions
    import org.apache.spark.sql.functions.col
    // a stale 512-dim index meeting a re-embedded 768-dim corpus must
    // fail loudly — a prefix dot product ranks on garbage cosines with
    // nothing to detect it (the quantizeI8/dotI8 rule)
    val df = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(VectorExpressions.dotFF(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(ex).contains("dimension mismatch"))
    // equal dims still work, bit-for-bit
    val ok = Seq((Seq(1.5f, 2f), Seq(2f, 0.5f))).toDF("a", "b")
      .select(VectorExpressions.dotFF(col("a"), col("b"))).head().getDouble(0)
    assert(ok === 4.0)
  }
}
