package graft

import org.apache.spark.sql.functions._
import graft.operators.{Mixture, Splits}

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("copies follow rate DIV 1000 + hash-gated remainder exactly") {
    val out = Mixture.sampleByRates(docs, "doc_id", "source",
      Map("src0" -> 2500, "src1" -> 1000, "src2" -> 500, "src3" -> 0),
      defaultPermille = 250, salt = "mix")
    val copies = out.groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n"), max($"copy").as("maxc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(copies.nonEmpty)
    val slots = docs.select($"doc_id", Splits.slotColumn($"doc_id", "mix").as("slot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def rate(src: String) = src match {
      case "src0" => 2500; case "src1" => 1000; case "src2" => 500
      case "src3" => 0; case _ => 250
    }
    copies.foreach { case (id, src, n, maxc) =>
      val want = rate(src) / 1000 + (if (slots(id) < rate(src) % 1000) 1 else 0)
      assert(n === want.toLong && maxc === want - 1L, s"doc $id src $src")
    }
    // rows with zero copies are absent, not emitted with copy count 0
    val srcs = out.select($"source").distinct().as[String].collect().toSet
    assert(!srcs.contains("src3"))
    // src1 at exactly 1000 keeps every doc exactly once
    val src1 = docs.filter($"source" === "src1").count()
    assert(out.filter($"source" === "src1").count() === src1)
  }

  test("temperatureRates: exact integer fit at all three temperatures") {
    // sources a (9 rows) and b (1 row): N=10
    val toy = ((1 to 9).map(i => (i.toLong, "a")) :+ (10L, "b"))
      .toDF("doc_id", "source")
    // natural mixture is the identity
    assert(Mixture.temperatureRates(toy, "source", tauHalves = 2) ===
      Map("a" -> 1000, "b" -> 1000))
    // uniform: w=1 each, rate_a = 1000*10/(2*9) = 555, rate_b = 5000
    assert(Mixture.temperatureRates(toy, "source", tauHalves = 0) ===
      Map("a" -> 555, "b" -> 5000))
    // sqrt: w_a = isqrt(9) = 3, w_b = 1, Σw = 4:
    // rate_a = 1000*3*10/(4*9) = 833, rate_b = 1000*1*10/4 = 2500
    assert(Mixture.temperatureRates(toy, "source", tauHalves = 1) ===
      Map("a" -> 833, "b" -> 2500))
    // expected output size stays ≈ N: Σ n_s·rate_s/1000 ≤ N (floor), > N-S
    val r = Mixture.temperatureRates(toy, "source", tauHalves = 1)
    val expSize = r.map { case ("a", v) => 9L * v; case (_, v) => 1L * v }.sum
    assert(expSize <= 10000L && expSize > 10000L - 2 * 1000L)
    intercept[IllegalArgumentException] {
      Mixture.temperatureRates(toy, "source", tauHalves = 3)
    }
    intercept[IllegalArgumentException] {
      Mixture.temperatureRates(toy.filter($"doc_id" > 100), "source")
    }
    intercept[IllegalArgumentException] {
      Mixture.temperatureRates(
        toy.withColumn("source", when($"doc_id" === 10L, lit(null: String))
          .otherwise($"source")), "source")
    }
  }

  test("temperatureRates: downsample-to-zero fails loudly, int sources fit") {
    // 1999 singleton sources + one hot source of 2001 rows, uniform τ:
    // rate_hot = 1000·4000/(2000·2001) = 0.999… → floor 0 — sampleByRates
    // would DROP the hot source (half the corpus) silently; the fit must
    // reject instead, symmetric to the upsample-overflow guard
    val hot = spark.range(2001).select(lit(0L).as("src"), $"id".as("doc_id"))
    val singletons = spark.range(1, 2000)
      .select($"id".as("src"), ($"id" + 10000L).as("doc_id"))
    val ex = intercept[IllegalArgumentException] {
      Mixture.temperatureRates(hot.unionByName(singletons), "src", tauHalves = 0)
    }
    assert(ex.getMessage.contains("0 permille"))
    // and the fit half accepts the same non-string source column the
    // sampling half does (no ClassCastException on int source ids)
    val intSrc = Seq((1L, 0), (2L, 0), (3L, 1)).toDF("doc_id", "src")
    assert(Mixture.temperatureRates(intSrc, "src", tauHalves = 2) ===
      Map("0" -> 1000, "1" -> 1000))
  }

  test("temperatureRates: over-cap source domain fails loudly, fetches cap+1 not the corpus") {
    // a caller fitting on a PER-DOCUMENT column (every doc its own
    // source) must hit the fence, not silently collect the corpus; the
    // cap rides as a parameter so the over-cap path drives on 8 rows
    val perDoc = spark.range(8).select($"id".as("doc_id"), $"id".as("src"))
    val ex = intercept[IllegalArgumentException] {
      Mixture.temperatureRatesImpl(perDoc, "src", tauHalves = 1, fetchCap = 4)
    }
    assert(ex.getMessage.contains("distinct values"))
    // at exactly the cap the fit still runs (boundary inclusive)
    val atCap = spark.range(4).select($"id".as("doc_id"), $"id".as("src"))
    assert(Mixture.temperatureRatesImpl(atCap, "src", tauHalves = 0, fetchCap = 4)
      .values.toSet === Set(1000))
  }

  test("budgetSelect: a Long.MinValue score class ranks worst, not first") {
    // -Long.MinValue overflows to itself, so a negation-based sort would
    // walk the WORST class first and spend the budget on it
    val rows = Seq((1L, 10L, 5L), (2L, Long.MinValue, 5L))
      .toDF("id", "score", "cost")
    val kept = Mixture.budgetSelect(rows, "id", "score", "cost", budget = 5L)
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("stratifiedSample rejects a caller-owned __h48 instead of overwriting it") {
    intercept[IllegalArgumentException] {
      Mixture.stratifiedSample(docs.withColumn("__h48", lit(1L)),
        "doc_id", "source", kPerGroup = 2)
    }
  }

  test("mixture is deterministic and salt-decorrelated") {
    val a = Mixture.sampleByRates(docs, "doc_id", "source", Map.empty,
      defaultPermille = 500, salt = "s1").select($"doc_id").as[Long].collect().toSet
    val a2 = Mixture.sampleByRates(docs, "doc_id", "source", Map.empty,
      defaultPermille = 500, salt = "s1").select($"doc_id").as[Long].collect().toSet
    val b = Mixture.sampleByRates(docs, "doc_id", "source", Map.empty,
      defaultPermille = 500, salt = "s2").select($"doc_id").as[Long].collect().toSet
    assert(a === a2)
    // different salts choose genuinely different halves (not identical,
    // not disjoint — independent ~50% samples overlap ~25% of the corpus)
    assert(a != b)
    assert(a.intersect(b).nonEmpty)
  }

  test("stratifiedSample ≡ window-rank over salted hash; deterministic; k caps at group size") {
    import org.apache.spark.sql.expressions.Window
    val out = Mixture.stratifiedSample(docs, "doc_id", "source", kPerGroup = 5, salt = "strat")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // reference formulation: full window rank over the same hash
    val h48 = shiftright(graft.functions.TextFunctions.hash60(
      concat(lit("strat:"), $"doc_id".cast("string"))), 12)
    val ref = docs.withColumn("h", h48)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"source").orderBy($"h", $"doc_id")))
      .filter($"rank" <= 5)
      .select($"source", $"rank", $"doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(out.nonEmpty)
    assert(out === ref)
    // deterministic across runs
    val again = Mixture.stratifiedSample(docs, "doc_id", "source", kPerGroup = 5, salt = "strat")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(again === out)
    // a different salt draws a different sample
    val other = Mixture.stratifiedSample(docs, "doc_id", "source", kPerGroup = 5, salt = "other")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(other !== out)
    // k >= group size returns the whole group (no padding, no loss)
    val all = Mixture.stratifiedSample(docs, "doc_id", "source", kPerGroup = 1000000)
    assert(all.count() === docs.count())
  }

  test("negative rates are rejected") {
    intercept[IllegalArgumentException] {
      Mixture.sampleByRates(docs, "doc_id", "source", Map("src0" -> -1))
    }
    intercept[IllegalArgumentException] {
      Mixture.sampleByRates(docs, "doc_id", "source", Map.empty, defaultPermille = -5)
    }
  }

  test("sampleByRates rejects inputs whose columns collide with its output") {
    // withColumn would silently overwrite a caller's own `copy`/`__copies`
    intercept[IllegalArgumentException] {
      Mixture.sampleByRates(docs.withColumn("copy", lit(7)), "doc_id", "source", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Mixture.sampleByRates(docs.withColumn("__copies", lit(7L)), "doc_id", "source", Map.empty)
    }
  }

  test("stratifiedSample rejects non-integral keys instead of sampling nothing") {
    // a string key would be implicitly cast to long inside the heap
    // aggregate, null out, and silently produce an empty sample
    intercept[IllegalArgumentException] {
      Mixture.stratifiedSample(docs, "text", "source", kPerGroup = 5)
    }
  }

  test("budgetSelect: localized form equals the global prefix window rule") {
    val toy = Seq(
      // (id, score, cost) — classes: 9 → {1}, 5 → {2,3,4}, 2 → {5}
      (1L, 9L, 10L), (2L, 5L, 10L), (3L, 5L, 10L), (4L, 5L, 10L), (5L, 2L, 10L)
    ).toDF("id", "score", "cost")
    def ids(budget: Long): Seq[Long] =
      Mixture.budgetSelect(toy, "id", "score", "cost", budget)
        .select($"id").as[Long].collect().sorted.toSeq
    assert(ids(0) === Seq.empty)                 // nothing fits
    assert(ids(9) === Seq.empty)                 // first row overflows: prefix stops
    assert(ids(10) === Seq(1L))                  // exactly the best row
    assert(ids(25) === Seq(1L, 2L))              // boundary class cut mid-way
    assert(ids(40) === Seq(1L, 2L, 3L, 4L))      // boundary class fully taken
    assert(ids(1000) === Seq(1L, 2L, 3L, 4L, 5L)) // everything fits
    // prefix rule, not knapsack: a big boundary-class row blocks later
    // smaller SAME-class rows (ordered by id, id 6 comes first)
    val blocky = Seq((6L, 5L, 100L), (7L, 5L, 1L)).toDF("id", "score", "cost")
    assert(Mixture.budgetSelect(blocky, "id", "score", "cost", 50L).count() === 0L)
  }

  test("budgetSelect: corpus run matches the naive global window") {
    val scored = docs.select($"doc_id",
      graft.functions.TextFunctions.qualityScore($"text").as("score"),
      graft.functions.TextFunctions.tokenCount($"text").cast("long").as("cost"))
    val total = scored.agg(sum($"cost")).as[Long].collect()(0)
    val got = Mixture.budgetSelect(scored, "doc_id", "score", "cost", total / 3)
      .select($"doc_id").as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"score".desc, $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = scored.withColumn("cum", sum($"cost").over(w))
      .filter($"cum" <= total / 3).select($"doc_id").as[Long].collect().toSet
    assert(got === want && got.nonEmpty && got.size < 500)
  }

  test("budgetSelectFraction ≡ budgetSelect at the explicitly-computed total") {
    val toy = Seq(
      (1L, 9L, 10L), (2L, 5L, 10L), (3L, 5L, 10L), (4L, 5L, 10L), (5L, 2L, 10L)
    ).toDF("id", "score", "cost")
    val frac = Mixture.budgetSelectFraction(toy, "id", "score", "cost", 1L, 2L)
      .select($"id").as[Long].collect().toSet
    val fixed = Mixture.budgetSelect(toy, "id", "score", "cost", 50L / 2L)
      .select($"id").as[Long].collect().toSet
    assert(frac === fixed && frac === Set(1L, 2L))
    intercept[IllegalArgumentException] {
      Mixture.budgetSelectFraction(toy, "id", "score", "cost", 1L, 0L)
    }
  }

  test("budgetSelect: continuous score auto-localizes past the fetch cap") {
    // past the driver fetch cap the walk switches to the recursive
    // range-bucketed localization (the former loud reject — the 2^20
    // cliff — is gone): drive it with a tiny cap so the recursion and
    // its base case both run on a unit fixture, and pin equality with
    // the global prefix window rule
    import org.apache.spark.sql.expressions.Window
    val toy = spark.range(200L).select($"id",
      ($"id" * 7L % 191L).as("score"), (($"id" % 5L) + 1L).as("cost"))
    val budget = 120L
    val got = Mixture.budgetSelectImpl(toy, "id", "score", "cost",
        _ => budget, fetchCap = 8)
      .select($"id").as[Long].collect().toSet
    val ref = toy.withColumn("cum", sum($"cost").over(
        Window.orderBy($"score".desc, $"id")))
      .filter($"cum" <= budget).select($"id").as[Long].collect().toSet
    assert(got === ref && ref.nonEmpty)
    // everything-fits resolves through the localized walk too
    assert(Mixture.budgetSelectImpl(toy, "id", "score", "cost",
      _ => 1000000L, fetchCap = 8).count() === 200L)
    // negative costs still fail loudly on the localized path
    val neg = spark.range(50L).select($"id", $"id".as("score"),
      (lit(1L) - ($"id" % 2L) * 2L).as("cost"))
    val e = intercept[Exception] {
      Mixture.budgetSelectImpl(neg, "id", "score", "cost",
        _ => 10L, fetchCap = 4).count()
    }
    assert(e.getMessage.contains("negative"))
    // the production cap walks the direct path on the same frame,
    // selecting the identical set
    assert(Mixture.budgetSelect(toy, "id", "score", "cost", budget)
      .select($"id").as[Long].collect().toSet === ref)
    // the in-contract path is untouched: a bounded class domain over the
    // same cardinality of ROWS selects normally
    val bounded = spark.range(1000L)
      .select($"id", ($"id" % 4L).as("score"), lit(1L).as("cost"))
    assert(Mixture.budgetSelect(bounded, "id", "score", "cost", 250L)
      .count() === 250L)
  }

  test("budgetSelect: null evidence is excluded, negative costs fail loudly") {
    val toy = Seq(
      (1L, Some(5L), Some(10L)), (2L, None, Some(10L)), (3L, Some(5L), None)
    ).toDF("id", "score", "cost")
    assert(Mixture.budgetSelect(toy, "id", "score", "cost", 100L)
      .select($"id").as[Long].collect().toSeq === Seq(1L))
    val neg = Seq((1L, 5L, -1L)).toDF("id", "score", "cost")
    intercept[IllegalArgumentException] {
      Mixture.budgetSelect(neg, "id", "score", "cost", 100L)
    }
    intercept[IllegalArgumentException] {
      Mixture.budgetSelect(toy, "id", "score", "cost", -1L)
    }
  }

  test("klBySource: hand-computed micro-nat divergences; identical sources read ~0") {
    // corpus tokens: x×3, y×1 (T=4). Source A = [x, x]: KL = 1·ln(4/3)
    // = 287682 µnat. Source B = [x, y]: 0.5·ln(2/3) + 0.5·ln(2) →
    // −202733 + 346574 = 143841 µnat (each term micro-rounded first).
    val docs = Seq(("A", "x x"), ("B", "x y")).toDF("source", "text")
    val got = Mixture.klBySource(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("A") === ((2L, 1L, 287682L)))
    assert(got("B") === ((2L, 2L, 143841L)))
    // two sources with the SAME distribution: both KL ≈ 0 (exactly 0
    // here — every p equals q so every ln term is ln(1))
    val same = Seq(("A", "x y"), ("B", "x y")).toDF("source", "text")
    val z = Mixture.klBySource(same, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(z === Map("A" -> 0L, "B" -> 0L))
  }
}
