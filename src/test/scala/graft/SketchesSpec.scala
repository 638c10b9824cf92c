package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Sketches

/** Sketch-family invariants: the KMV aggregate must equal the brute
  * "k smallest distinct hashes" set computation in both regimes
  * (unsaturated ⇒ exact count, saturated ⇒ estimator), and
  * exactQuantiles must equal per-group sort-and-index selection — the
  * definitional forms the scale-shaped plans replace.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def forSamples[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(7L + i)).foreach(body)
    }

  // random multisets of non-negative hashes, with duplicates likely
  private val hashesGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(0L, 400L))

  private def bruteKmv(values: Seq[Long], k: Int): (Long, Long) = {
    val mins = values.distinct.sorted.take(k)
    (mins.length.toLong, mins.last)
  }

  test("KmvSketch ≡ brute k-min distinct set on random multisets (both regimes)") {
    forSamples(hashesGen, 15) { hs =>
      for (k <- Seq(4, 64, 1000)) { // saturated, mid, unsaturated
        val row = hs.toDF("h").agg(Sketches.kmv(col("h"), k).as("sk"))
          .select(col("sk.kk"), col("sk.hk")).head()
        val (kk, hk) = bruteKmv(hs, k)
        assert(row.getLong(0) === kk, s"kk for k=$k of $hs")
        assert(row.getLong(1) === hk, s"hk for k=$k of $hs")
      }
    }
  }

  test("KmvMins ≡ brute sorted k smallest distinct; estimator matches kmvEstimate") {
    forSamples(hashesGen, 10) { hs =>
      for (k <- Seq(4, 64)) {
        val row = hs.toDF("h").agg(Sketches.kmvMins(col("h"), k).as("m"))
          .select(col("m"), Sketches.kmvEstimateFromMins(col("m"), k, 48).as("est"))
          .head()
        val mins = hs.distinct.sorted.take(k)
        assert(row.getSeq[Long](0).toList === mins, s"mins for k=$k of $hs")
        val expected =
          if (mins.length < k) mins.length.toLong
          else (k - 1).toLong * (1L << 48) / mins.last
        assert(row.getLong(1) === expected, s"est for k=$k of $hs")
      }
    }
  }

  test("kmvEstimateFromMins stays exact past 2^53 (true BIGINT DIV, not double)") {
    // k=64, bits=48: numerator 63·2^48 ≈ 2^54 — at hk=127 the former
    // double-division form rounded the dividend and truncated one below
    // the true quotient (…679 read …678); the IntegralDivide form must
    // match Long `/` exactly
    val k = 64
    val num = 63L * (1L << 48)
    for (hk <- Seq(127L, 255L, 505L)) {
      val mins = (1L to (k - 1).toLong) :+ hk
      val got = Seq(mins).toDF("m")
        .select(Sketches.kmvEstimateFromMins(col("m"), k, 48).as("est"))
        .head().getLong(0)
      assert(got === num / hk, s"hk=$hk")
    }
  }

  test("kmvUnionEstimate ≡ a single sketch over the concatenated stream (closure)") {
    forSamples(Gen.zip(hashesGen, hashesGen), 10) { case (as, bs) =>
      val k = 8
      val pair = as.toDF("h").agg(Sketches.kmvMins(col("h"), k).as("ma"))
        .crossJoin(bs.toDF("h").agg(Sketches.kmvMins(col("h"), k).as("mb")))
        .select(Sketches.kmvUnionEstimate(col("ma"), col("mb"), k, 48).as("u"))
        .head().getLong(0)
      val direct = (as ++ bs).toDF("h").agg(Sketches.kmvMins(col("h"), k).as("m"))
        .select(Sketches.kmvEstimateFromMins(col("m"), k, 48)).head().getLong(0)
      assert(pair === direct, s"union estimate for $as / $bs")
    }
  }

  test("unsaturated kmv set algebra is EXACT: inclusion-exclusion recovers |A∩B|") {
    // below saturation every sketch IS its value set, so union and
    // intersection estimates are exact set cardinalities
    val k = 16
    def interOf(as: List[Long], bs: List[Long]): Long =
      as.toDF("h").agg(Sketches.kmvMins(col("h"), k).as("ma"))
        .crossJoin(bs.toDF("h").agg(Sketches.kmvMins(col("h"), k).as("mb")))
        .select(
          greatest(lit(0L),
            Sketches.kmvEstimateFromMins(col("ma"), k, 48) +
              Sketches.kmvEstimateFromMins(col("mb"), k, 48) -
              Sketches.kmvUnionEstimate(col("ma"), col("mb"), k, 48)).as("ei"))
        .head().getLong(0)
    assert(interOf(List(1L, 2L, 3L, 4L, 5L), List(100L, 101L)) === 0L) // disjoint
    assert(interOf(List(1L, 2L, 3L, 4L, 5L), List(4L, 5L, 6L)) === 2L) // {4,5}
    assert(interOf(List(7L, 8L), List(7L, 8L)) === 2L)                 // identical
  }

  test("kmvEstimate: exact below saturation, floor-div estimator above") {
    forSamples(hashesGen, 10) { hs =>
      val k = 8
      val est = hs.toDF("h").agg(Sketches.kmv(col("h"), k).as("sk"))
        .select(Sketches.kmvEstimate("sk", k, 48).as("est")).head().getLong(0)
      val (kk, hk) = bruteKmv(hs, k)
      val expected = if (kk < k) kk else (k - 1).toLong * (1L << 48) / hk
      assert(est === expected)
    }
  }

  test("KmvSketch ignores nulls; empty input evals to null") {
    val withNulls = Seq(Some(5L), None, Some(3L), Some(5L), None)
      .toDF("h").agg(Sketches.kmv(col("h"), 10).as("sk"))
      .select(col("sk.kk"), col("sk.hk")).head()
    assert(withNulls.getLong(0) === 2L && withNulls.getLong(1) === 5L)
    val empty = Seq.empty[Long].toDF("h")
      .agg(Sketches.kmv(col("h"), 10).as("sk")).head()
    assert(empty.isNullAt(0))
  }

  test("graft_kmv SQL surface plans the same aggregate") {
    GraftExtensions.register(spark)
    Seq(9L, 1L, 5L, 1L).toDF("h").createOrReplaceTempView("kmv_in")
    val r = spark.sql("SELECT graft_kmv(h, 2) AS sk FROM kmv_in")
      .select(col("sk.kk"), col("sk.hk")).head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 5L)
  }

  test("graft_hll SQL surface plans the same register aggregate") {
    import spark.implicits._
    GraftExtensions.register(spark)
    spark.range(500).select(
        graft.functions.TextFunctions.hash60(concat(lit("q:"), $"id")).as("h"))
      .createOrReplaceTempView("hll_in")
    val viaSql = spark.sql("SELECT graft_hll(h, 8) AS sk FROM hll_in")
      .head().getSeq[Long](0)
    val viaApi = spark.table("hll_in")
      .agg(Sketches.hll(col("h"), 8).as("sk")).head().getSeq[Long](0)
    assert(viaSql === viaApi)
  }

  // grouped random values: group id 1-3, small value domain to force ties
  private val groupedGen: Gen[List[(Int, Long)]] =
    Gen.nonEmptyListOf(for {
      g <- Gen.choose(1, 3)
      v <- Gen.choose(-50L, 50L)
    } yield (g, v))

  test("exactQuantiles ≡ per-group sort-and-index on random grouped values") {
    val qs = Seq("p0" -> 0, "p25" -> 250, "p50" -> 500, "p95" -> 950, "p100" -> 1000)
    forSamples(groupedGen, 15) { rows =>
      val got = Sketches.exactQuantiles(
          rows.toDF("g", "v"), Seq("g"), "v", qs)
        .collect().map(r => r.getInt(0) -> r).toMap
      val byGroup = rows.groupBy(_._1)
      assert(got.size === byGroup.size)
      byGroup.foreach { case (g, members) =>
        val sorted = members.map(_._2).sorted
        val n = sorted.length.toLong
        val row = got(g)
        qs.zipWithIndex.foreach { case ((nm, p), i) =>
          val idx = (p * (n - 1)) / 1000
          assert(row.getLong(i + 1) === sorted(idx.toInt), s"$nm of group $g: $sorted")
        }
        assert(row.getLong(qs.length + 1) === n) // n_rows
      }
    }
  }

  test("exactQuantilesBucketed ≡ exactQuantiles at degenerate and real widths") {
    val qs = Seq("p0" -> 0, "p25" -> 250, "p50" -> 500, "p95" -> 950, "p100" -> 1000)
    // random grouped multisets (negatives, ties) across bucket widths:
    // width 1 = one value per bucket, 7 = mixed-sign shared bucket 0,
    // 10^6 = everything in one bucket (stage 2 does all the work)
    forSamples(groupedGen, 10) { rows =>
      val df = rows.toDF("g", "v")
      val plain = Sketches.exactQuantiles(df, Seq("g"), "v", qs)
        .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
      for (w <- Seq(1L, 7L, 1000000L)) {
        val bucketed = Sketches.exactQuantilesBucketed(df, Seq("g"), "v", qs, w)
          .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
        assert(bucketed === plain, s"width $w")
      }
    }
    // and on the real q28 data shape: price cents per return flag
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_returnflag".as("flag"),
        round($"l_extendedprice" * 100).cast("long").as("cents"))
    val qsR = Seq("p25" -> 250, "p50" -> 500, "p75" -> 750, "p95" -> 950)
    val plainR = Sketches.exactQuantiles(li, Seq("flag"), "cents", qsR)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val bucketedR = Sketches.exactQuantilesBucketed(li, Seq("flag"), "cents", qsR, 10000L)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(bucketedR === plainR)
  }

  test("QuantileHistogram aggregate ≡ exactQuantiles multi-stage plan") {
    // the one-operator streaming-capable form and the histogram+window
    // batch plan implement the same quantile definition — assert they
    // agree value-for-value on random grouped multisets (incl. negatives,
    // ties, nulls)
    val qs = Seq("p0" -> 0, "p25" -> 250, "p50" -> 500, "p95" -> 950, "p100" -> 1000)
    forSamples(groupedGen, 15) { rows =>
      // group 1 always gets one non-null (so it appears in both forms) and
      // one null (exactQuantiles drops all-null groups; the aggregate
      // would keep them as a null struct — out of scope here)
      val df = (rows.map { case (g, v) => (g, Some(v)) }
        :+ (1 -> Some(0L)) :+ (1 -> Option.empty[Long]))
        .toDF("g", "v")
      val multi = Sketches.exactQuantiles(df, Seq("g"), "v", qs)
        .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
      val one = df.groupBy($"g")
        .agg(graft.expressions.QuantileHistogram.quantiles($"v", qs.map(_._2)).as("q"))
        .select($"g" +: qs.indices.map(i => $"q.qs".getItem(i)) :+ $"q.n_rows": _*)
        .collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
      assert(one === multi)
    }
  }

  test("graft_quantiles SQL surface plans the same aggregate") {
    GraftExtensions.register(spark)
    Seq(5L, 1L, 9L, 1L).toDF("v").createOrReplaceTempView("q_in")
    val r = spark.sql("SELECT graft_quantiles(v, 0, 500, 1000) AS q FROM q_in")
      .select(col("q.qs"), col("q.n_rows")).head()
    assert(r.getSeq[Long](0) === Seq(1L, 1L, 9L) && r.getLong(1) === 4L)
  }

  test("QuantileHistogram ignores nulls; empty input evals to null") {
    val r = Seq(Some(5L), None, Some(3L)).toDF("v")
      .agg(graft.expressions.QuantileHistogram.quantiles($"v", Seq(0, 1000)).as("q"))
      .select($"q.qs", $"q.n_rows").head()
    assert(r.getSeq[Long](0) === Seq(3L, 5L) && r.getLong(1) === 2L)
    val empty = Seq.empty[Long].toDF("v")
      .agg(graft.expressions.QuantileHistogram.quantiles($"v", Seq(500)).as("q")).head()
    assert(empty.isNullAt(0))
  }

  test("exactQuantiles rejects out-of-range quantiles and empty spec") {
    val df = Seq((1, 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Sketches.exactQuantiles(df, Seq("g"), "v", Seq("bad" -> 1001))
    }
    intercept[IllegalArgumentException] {
      Sketches.exactQuantiles(df, Seq("g"), "v", Seq.empty)
    }
  }

  test("quantileBuckets: rank-rule breakpoints, equal values land in the lower bucket") {
    import spark.implicits._
    // values 0..99: rank rule idx = (p*(n-1))//1000 -> breakpoints 24/49/74,
    // so buckets split 0..24 | 25..49 | 50..74 | 75..99 (25 rows each);
    // a value EQUAL to a breakpoint stays in the lower bucket
    val df = (0L until 100L).toDF("v")
    val out = Sketches.quantileBuckets(df, "v", Seq(250, 500, 750))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 100)
    assert(out(0L) === 0L && out(24L) === 0L)
    assert(out(25L) === 1L && out(49L) === 1L)
    assert(out(50L) === 2L && out(74L) === 2L)
    assert(out(75L) === 3L && out(99L) === 3L)
    assert(out.values.groupBy(identity).view.mapValues(_.size).toMap ===
      Map(0L -> 25, 1L -> 25, 2L -> 25, 3L -> 25))
    // empty input passes through with the column present, no crash
    val empty = Sketches.quantileBuckets(df.filter($"v" < 0), "v", Seq(500))
    assert(empty.columns.contains("bucket") && empty.count() === 0L)
  }

  // random small-vocabulary token multisets: collisions and repeats likely
  private val tokensGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.choose(0, 40).map(i => s"tok$i"))

  test("CmsSketch: never underestimates; exact when the grid outgrows the vocabulary") {
    import spark.implicits._
    forSamples(tokensGen, 10) { ts =>
      val df = ts.toDF("token")
      val exact = ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
      for ((width, mustBeExact) <- Seq((8, false), (4096, true))) {
        val sk = df.agg(Sketches.cms(col("token"), 4, width).as("c"))
        val est = df.distinct()
          .crossJoin(sk)
          .select(col("token"), Sketches.cmsCount(col("c"), col("token"), 4, width))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        exact.foreach { case (tok, n) =>
          assert(est(tok) >= n, s"underestimate for $tok at width $width")
          if (mustBeExact) assert(est(tok) === n, s"collision at width $width for $tok")
        }
      }
    }
  }

  test("CmsSketch: partials merge exactly (partitioning never changes the grid)") {
    import spark.implicits._
    forSamples(tokensGen, 5) { ts =>
      val one = ts.toDF("token").coalesce(1)
        .agg(Sketches.cms(col("token"), 4, 64)).head().getSeq[Long](0)
      val many = ts.toDF("token").repartition(7)
        .agg(Sketches.cms(col("token"), 4, 64)).head().getSeq[Long](0)
      assert(one === many)
      assert(one.sum === 4L * ts.size) // every row lands once per grid row
    }
  }

  test("CmsSketch: width-1 degenerates to a total counter; empty input reads zero") {
    import spark.implicits._
    val df = Seq("a", "b", "a").toDF("token")
    val sk = df.agg(Sketches.cms(col("token"), 2, 1).as("c"))
    val est = df.distinct().crossJoin(sk)
      .select(Sketches.cmsCount(col("c"), col("token"), 2, 1))
      .collect().map(_.getLong(0)).toSeq
    assert(est === Seq(3L, 3L)) // every token shares the single bucket
    val emptySk = df.filter(col("token") === "zzz")
      .agg(Sketches.cms(col("token"), 2, 1).as("c"))
    val zero = Seq("a").toDF("token").crossJoin(emptySk)
      .select(Sketches.cmsCount(col("c"), col("token"), 2, 1)).head().getLong(0)
    assert(zero === 0L)
  }

  test("madOutliers: exact median/MAD gate, nulls unknown, empty all-null") {
    import spark.implicits._
    // values 10×9 + 100: median 10, deviations {0×9, 90} -> MAD 0;
    // with MAD 0 any nonzero deviation is out (conventional fallback)
    val d = ((1L to 9L).map(i => (i, Some(10L))) :+ (10L, Some(100L)) :+ (11L, None))
      .toDF("id", "v")
    val got = Sketches.madOutliers(d, "v", kMilli = 3000L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(got(1L) === (Some(0L), Some(0L)))
    assert(got(10L) === (Some(90L), Some(1L)))
    assert(got(11L) === (None, None)) // null value: unknown, not outlying
    // non-degenerate MAD: 1..9 -> median 5, deviations 0..4 -> MAD 2;
    // k=1000: out iff dev > 2 (values 1,2,8,9)
    val e = (1L to 9L).map(i => (i, i)).toDF("id", "v")
    val flagged = Sketches.madOutliers(e, "v", kMilli = 1000L)
      .filter($"is_outlier" === 1L).select($"id").as[Long].collect().toSet
    assert(flagged === Set(1L, 2L, 8L, 9L))
    // empty input: all-null tags, no crash
    val none = Sketches.madOutliers(e.filter($"id" > 100L), "v")
    assert(none.select($"deviation", $"is_outlier").schema.forall(_.nullable))
    assert(none.count() === 0L)
    intercept[IllegalArgumentException] { Sketches.madOutliers(e, "v", -1L) }
  }

  test("HllSketch registers ≡ brute max-rho per bucket; merge is partition-invariant") {
    import spark.implicits._
    val p = 8
    val hashes = spark.range(5000).select(
      graft.functions.TextFunctions.hash60(concat(lit("h:"), $"id")).as("h"))
    val sk = hashes.agg(Sketches.hll($"h", p).as("sk"))
      .head().getSeq[Long](0)
    // brute registers from the definition
    val hs = hashes.as[Long].collect()
    val brute = new Array[Long](1 << p)
    hs.foreach { h =>
      val idx = (h & ((1 << p) - 1)).toInt
      val w = h >>> p
      val rho = (if (w == 0L) 60 - p
        else 60 - p - (64 - java.lang.Long.numberOfLeadingZeros(w))) + 1
      if (rho > brute(idx)) brute(idx) = rho.toLong
    }
    assert(sk === brute.toSeq)
    // partition count never changes the merged registers
    val sk8 = hashes.repartition(8).agg(Sketches.hll($"h", p).as("sk"))
      .head().getSeq[Long](0)
    assert(sk8 === sk)
  }

  test("hllEstimate: raw branch near truth at 5000 distinct; exact-rational formula") {
    import spark.implicits._
    val p = 8
    val skDf = spark.range(5000).select(
        graft.functions.TextFunctions.hash60(concat(lit("h:"), $"id")).as("h"))
      .agg(Sketches.hll($"h", p).as("sk"))
    val est = skDf.select(Sketches.hllEstimate("sk", p).as("e")).head().getLong(0)
    // 1.04/sqrt(256) ≈ 6.5% standard error — allow 3σ
    assert(math.abs(est - 5000L) < 1000L, s"raw estimate $est vs 5000")
    // replay the exact rational from the registers: α_m·m²·2^mmax / S
    val regs = skDf.head().getSeq[Long](0)
    val m = 1L << p
    val mmax = regs.max
    val s = regs.map(r => BigInt(1) << (mmax - r).toInt).sum
    val want = (BigInt(7213) * m * m * m * (BigInt(1) << mmax.toInt)) /
      (BigInt(10) * (1000L * m + 1079L) * s)
    // at 5000 distinct over 256 registers the raw branch must be active
    // (V = 0 or raw > 5m/2), and it must equal the exact rational
    assert(regs.count(_ == 0L) == 0 || want > BigInt(5L * m / 2L))
    assert(est === want.toLong)
  }

  test("hllEstimate: linear counting on small sets, 0 on empty, input contract") {
    import spark.implicits._
    val p = 8
    // 40 distinct: V > 0 and raw small -> linear counting ~ exact
    val small = spark.range(40).select(
        graft.functions.TextFunctions.hash60(concat(lit("s:"), $"id")).as("h"))
      .agg(Sketches.hll($"h", p).as("sk"))
      .select(Sketches.hllEstimate("sk", p).as("e")).head().getLong(0)
    assert(math.abs(small - 40L) <= 5L, s"linear-counting estimate $small vs 40")
    // empty input: all-zero registers estimate exactly 0
    val empty = spark.range(0).select(lit(1L).as("h"))
      .agg(Sketches.hll($"h", p).as("sk"))
      .select(Sketches.hllEstimate("sk", p).as("e")).head().getLong(0)
    assert(empty === 0L)
    // out-of-range hash (negative) fails loudly, not silently mis-registers
    val ex = intercept[org.apache.spark.SparkException] {
      Seq(-1L).toDF("h").agg(Sketches.hll($"h", p)).collect()
    }
    assert(ex.getMessage.contains("hll_sketch") ||
      Option(ex.getCause).exists(_.getMessage.contains("hll_sketch")))
  }

  test("winsorize: per-group clip equals sort-and-index edges; nulls stay null") {
    import spark.implicits._
    // group a: 1..20 (p100/p900 edges by rank rule: idx > (p*(n-1))//1000)
    // group b: constant 7 — lo = hi = 7, nothing clips
    // group c: all-null values — winsorized/clipped stay null
    val rows =
      (1 to 20).map(i => ("a", Some(i.toLong))) ++
      (1 to 5).map(_ => ("b", Some(7L))) ++
      Seq(("c", None: Option[Long]), ("a", None: Option[Long]))
    val df = rows.toDF("g", "v")
    val out = Sketches.winsorize(df, Seq("g"), "v", 100, 900)
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    // definitional edges for 1..20: lo = min idx with cum > (100*19)//1000=1
    //   -> value 3 has cum 3 > 1? value 2 cum 2 > 1 -> lo = 2
    // hi: cum > (900*19)//1000 = 17 -> value 18 (cum 18) -> hi = 18
    val a = out.filter(r => r._1 == "a" && r._2.isDefined)
    assert(a.forall { case (_, Some(v), Some(w), Some(c)) =>
      w == math.min(math.max(v, 2L), 18L) && c == (if (v < 2L || v > 18L) 1L else 0L)
    case _ => false })
    assert(a.count(_._4.contains(1L)) === 3) // 1, 19, 20 clipped
    val b = out.filter(_._1 == "b")
    assert(b.forall(r => r._3.contains(7L) && r._4.contains(0L)))
    // null values (both in a fitted group and an unfitted one) tag null
    assert(out.filter(_._2.isEmpty).forall(r => r._3.isEmpty && r._4.isEmpty))
    // contract checks fail loudly
    intercept[IllegalArgumentException] { Sketches.winsorize(df, Seq.empty, "v", 1, 2) }
    intercept[IllegalArgumentException] { Sketches.winsorize(df, Seq("g"), "v", 500, 500) }
    intercept[IllegalArgumentException] {
      Sketches.winsorize(df.withColumn("clipped", lit(1)), Seq("g"), "v", 1, 2)
    }
  }

  test("integral fence: scale-0 decimals compute exactly, fractional decimals stay rejected") {
    // money stored as DECIMAL(10,0) cents is integral by construction and
    // casts to long losslessly — it computed exactly before the fence
    // existed and must keep doing so (the fence exists to catch silent
    // fractional truncation, not exact decimals)
    val qs = Seq("p0" -> 0, "p50" -> 500, "p100" -> 1000)
    val longForm = Seq((1, 10L), (1, 20L), (1, 30L), (2, 5L)).toDF("g", "v")
    val decForm = longForm.withColumn("v", $"v".cast("decimal(10,0)"))
    val want = Sketches.exactQuantiles(longForm, Seq("g"), "v", qs)
      .collect().map(_.toSeq).toSet
    assert(Sketches.exactQuantiles(decForm, Seq("g"), "v", qs)
      .collect().map(_.toSeq).toSet === want)
    // fractional scale would truncate before the rank math — still loud
    val ex = intercept[IllegalArgumentException] {
      Sketches.exactQuantiles(
        longForm.withColumn("v", ($"v" / 10.0).cast("decimal(10,2)")),
        Seq("g"), "v", qs)
    }
    assert(ex.getMessage.contains("integral"))
  }
}
