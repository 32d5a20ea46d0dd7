package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tokens(rows: Seq[String]) = rows.toDF("token")

  test("count-min never underestimates; exact when width avoids collisions") {
    val rnd = new scala.util.Random(13)
    val corpus = Seq.fill(2000)(s"w${rnd.nextInt(40)}")
    val toks = tokens(corpus)
    val truth = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // narrow sketch → collisions guaranteed (40 tokens over 4×16 buckets)
    val narrow = Sketches.countMinTable(toks, "token", depth = 4, width = 16)
    val estNarrow = Sketches.cmsEstimate(narrow,
        truth.keys.toSeq.toDF("token"), "token", depth = 4, width = 16)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (t, n) =>
      assert(estNarrow(t) >= n, s"$t: est ${estNarrow(t)} < true $n")
    }
    assert(estNarrow.exists { case (t, e) => e > truth(t) },
      "a 4x16 sketch over 40 tokens must show at least one collision")
    // wide sketch → 40 tokens almost surely collision-free in some row
    val wide = Sketches.countMinTable(toks, "token", depth = 4, width = 4096)
    val estWide = Sketches.cmsEstimate(wide,
        truth.keys.toSeq.toDF("token"), "token", depth = 4, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(truth.forall { case (t, n) => estWide(t) == n },
      "a wide sketch over 40 tokens should estimate exactly")
  }

  test("bloom: no false negatives ever, real pruning, deterministic") {
    val keys = (0 until 200).map(i => s"key-$i")
    val bits = Sketches.bloomBuild(keys.toDF("k"), "k", m = 4096, k = 3)
    val probe = (keys ++ (0 until 2000).map(i => s"other-$i")).toDF("k")
    val got = probe
      .select($"k", Sketches.bloomMightContain($"k", bits, 3).as("hit"))
      .as[(String, Boolean)].collect().toMap
    assert(keys.forall(got(_)), "an inserted key must NEVER miss")
    val fps = (0 until 2000).count(i => got(s"other-$i"))
    assert(fps < 200,
      s"4096 bits / 200 keys / k=3 must reject most non-members, fp=$fps")
    val bits2 = Sketches.bloomBuild(keys.toDF("k"), "k", m = 4096, k = 3)
    assert(bits.toSeq == bits2.toSeq, "bit layout must be deterministic")
    intercept[IllegalArgumentException] {
      Sketches.bloomBuild(keys.toDF("k"), "k", m = 1000, k = 3)
    }
  }

  test("kmv: small groups are exact, large groups estimate within theory") {
    // group "small": 3 distinct values, k=8 → the sketch sees everything,
    // kth is null and the estimate IS the exact count
    // group "big": 5000 distinct values, k=64 → estimator branch; KMV
    // stderr is 1/sqrt(k-2) ≈ 12.7%, assert within 5σ
    val rows = (0 until 3).map(i => ("small", s"s$i")) ++
      (0 until 20000).map(i => ("big", s"b${i % 5000}"))
    val df = rows.toDF("g", "v")
    val got = Sketches.kmvDistinct(df, "g", "v", k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), r.getDouble(3))).toMap
    val (nSmall, kthSmall, estSmall) = got("small")
    assert(nSmall == 3L && kthSmall.isEmpty && estSmall == 3.0)
    val (nBig, kthBig, estBig) = got("big")
    assert(nBig == 64L && kthBig.nonEmpty)
    assert(math.abs(estBig - 5000.0) / 5000.0 < 5.0 / math.sqrt(62.0),
      s"estimate $estBig too far from 5000")

    // duplicates must not eat heap slots: the sketch of the deduplicated
    // frame is identical (the .distinct() inside is load-bearing)
    val dedup = Sketches.kmvDistinct(df.distinct(), "g", "v", k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(dedup("big") == estBig && dedup("small") == estSmall)

    // deterministic run-to-run
    val again = Sketches.kmvDistinct(df, "g", "v", k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(again("big") == estBig)

    intercept[IllegalArgumentException] {
      Sketches.kmvDistinct(df, "g", "v", k = 1)
    }
  }

  test("kmv set ops: exact when unsaturated, self-consistent when saturated") {
    // UNSATURATED (union smaller than k): every estimate is exact by
    // construction — A={a,b,c}, B={b,c,d}: union 4, intersection 2
    val small = (Seq("a", "b", "c").map(("A", _)) ++
      Seq("b", "c", "d").map(("B", _))).toDF("g", "v")
    val ex = Sketches.kmvSetOps(small, "g", "v", k = 64)
      .select("a_g", "b_g", "kp", "rho", "est_union", "est_jaccard",
        "est_intersection")
      .as[(String, String, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(ex == Seq(("A", "B", 4L, 2L, 4.0, 0.5, 2.0)),
      s"unsaturated set ops must be exact: $ex")

    // SATURATED with identical value sets: the merged bottom-k is each
    // side's own, rho = kp = k, Jaccard exactly 1, intersection = union
    // = the single-group kmvDistinct estimate
    val vals = (0 until 200).map(i => s"x$i")
    val same = (vals.map(("P", _)) ++ vals.map(("Q", _))).toDF("g", "v")
    val sat = Sketches.kmvSetOps(same, "g", "v", k = 8)
      .select("a_g", "b_g", "kp", "rho", "est_union", "est_jaccard",
        "est_intersection")
      .as[(String, String, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(sat.size == 1)
    val (_, _, kp, rho, u, j, inter) = sat.head
    assert(kp == 8L && rho == 8L && j == 1.0 && inter == u)
    val single = Sketches.kmvDistinct(same.filter($"g" === "P"), "g", "v",
      k = 8).select("est_distinct").as[Double].collect().head
    assert(u == single,
      "identical groups' union estimate must equal the single-group estimate")

    // pair enumeration: 3 groups -> 3 ordered pairs, a < b
    val tri = (Seq("a", "b").map(("G1", _)) ++ Seq("b", "c").map(("G2", _))
      ++ Seq("c", "d").map(("G3", _))).toDF("g", "v")
    val pairs = Sketches.kmvSetOps(tri, "g", "v", k = 64)
      .select("a_g", "b_g").as[(String, String)].collect().toSeq.sorted
    assert(pairs == Seq(("G1", "G2"), ("G1", "G3"), ("G2", "G3")))

    intercept[IllegalArgumentException] {
      Sketches.kmvSetOps(small, "g", "v", k = 1)
    }
  }

  test("table is bounded by depth x width; unseen tokens estimate zero") {
    val toks = tokens(Seq.fill(500)("a") ++ Seq.fill(300)("b"))
    val table = Sketches.countMinTable(toks, "token", depth = 4, width = 16)
    assert(table.count() <= 4L * 16)
    val est = Sketches.cmsEstimate(table,
        Seq("a", "b", "never-seen").toDF("token"), "token",
        depth = 4, width = 16)
      .as[(String, Long)].collect().toMap
    assert(est("a") >= 500L && est("b") >= 300L)
    // a miss in ANY row floors the estimate at that row's bucket count;
    // with only two live tokens, "never-seen" lands in an empty bucket in
    // at least one of its four rows (verified for this md5 layout)
    assert(est("never-seen") == 0L)
    intercept[IllegalArgumentException] {
      Sketches.countMinTable(toks, "token", depth = 4, width = 100)
    }
  }

  test("hll registers: bucket/rank match an independent md5 derivation") {
    import java.security.MessageDigest
    val vals = (0 until 200).map(i => s"tok$i")
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    val got = Sketches.hllRegisters(df, "g", "v")
      .select($"bucket", $"r").as[(Int, Int)].collect().toMap
    // independent replay: numberOfLeadingZeros-based rank, not the ladder
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = vals
      .map { v =>
        val h = md5hex(s"hll:$v")
        val bucket = Integer.parseInt(h.substring(0, 2), 16) % 64
        val x = Integer.parseInt(h.substring(2, 6), 16)
        val rank =
          if (x == 0) 17 else Integer.numberOfLeadingZeros(x) - 16 + 1
        (bucket, rank)
      }
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(got == want,
      "the CASE-ladder rank must equal the leading-zeros definition")
  }

  test("hll estimate: within theory on range cardinalities, deterministic") {
    for (n <- Seq(40L, 400L, 4000L)) {
      val df = spark.range(n).select(lit("g").as("g"),
        concat(lit("v"), $"id").as("v"))
      val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "g", "v"), "g")
        .select($"n_hll").as[Double].head()
      val rel = math.abs(est - n) / n
      // stderr ≈ 1.04/√64 ≈ 13%; allow 3σ (small n uses linear counting,
      // which is tighter)
      assert(rel < 0.4, s"n=$n est=$est rel=$rel")
      val est2 = Sketches.hllEstimate(Sketches.hllRegisters(df, "g", "v"), "g")
        .select($"n_hll").as[Double].head()
      assert(est == est2, "registers and estimate must be deterministic")
    }
  }

  test("sample quantiles: hand-checked bottom-k selection and index math") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // one group, keys 0..9, value = key as double, sample of 4
    val df = spark.range(10).select(lit("g").as("g"), $"id".as("k"),
      $"id".cast("double").as("v"))
    val got = Sketches.sampleQuantiles(df, "g", "k", "v", sampleSize = 4)
      .collect().head
    // replay the selection: 4 smallest md5('sq:'||k) 48-bit prefixes
    val picked = (0L until 10L)
      .map(k => (k, java.lang.Long.parseLong(md5hex(s"sq:$k").take(12), 16)))
      .sortBy { case (k, h) => (h, k) }.take(4).map(_._1).sorted
    val sv = picked.map(_.toDouble)
    def t1(xs: Seq[Double], q: Int): Double = xs(((xs.size - 1) * q) / 100)
    assert(got.getAs[Long]("n_rows") == 10L)
    assert(got.getAs[Long]("n_sample") == 4L)
    for (q <- Seq(25, 50, 75, 90)) {
      assert(got.getAs[Double](s"sp$q") == t1(sv, q),
        s"sample p$q must pick the hand-derived sample's type-1 value")
      assert(got.getAs[Double](s"xp$q") == t1((0 to 9).map(_.toDouble), q),
        s"exact p$q must pick the full group's type-1 value")
    }
  }

  test("sample quantiles: a group within the sample size is exact") {
    // two groups: 'small' (20 rows < 64) must self-sample (sp ≡ xp);
    // 'big' (500 rows) must not
    val df = spark.range(520).select(
      when($"id" < 20, "small").otherwise("big").as("g"), $"id".as("k"),
      ($"id" % 97).cast("double").as("v"))
    val rows = Sketches.sampleQuantiles(df, "g", "k", "v", sampleSize = 64)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val s = rows("small")
    assert(s.getAs[Long]("n_sample") == 20L)
    for (q <- Seq(25, 50, 75, 90))
      assert(s.getAs[Double](s"sp$q") == s.getAs[Double](s"xp$q"),
        "a self-sampled group's sketch quantiles must be exact")
    assert(rows("big").getAs[Long]("n_sample") == 64L)
    // production shape: same sp values, no exact columns
    val prod = Sketches.sampleQuantiles(df, "g", "k", "v", sampleSize = 64,
        exactDiagnostic = false)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(!prod("big").schema.fieldNames.exists(_.startsWith("xp")))
    for (g <- Seq("small", "big"); q <- Seq(25, 50, 75, 90))
      assert(prod(g).getAs[Double](s"sp$q") == rows(g).getAs[Double](s"sp$q"),
        "dropping the diagnostic must not change the sketch values")
  }

  test("sample quantiles: non-integral row key is refused loudly") {
    val df = Seq(("g", "a", 1.0), ("g", "b", 2.0)).toDF("g", "k", "v")
    val e = intercept[IllegalArgumentException] {
      Sketches.sampleQuantiles(df, "g", "k", "v")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("MG heavy hitters: exact output above the strict threshold, " +
      "boundary excluded, superset guarantee under hostile order") {
    // N=21, k=2 → strict threshold 10.5: a(11) qualifies, b(5) doesn't
    val terms = Seq.fill(11)("a") ++ Seq.fill(5)("b") ++
      Seq("c", "d", "e", "f", "g")
    val df = terms.toDF("t")
    val got = Sketches.heavyHitters(df, "t", k = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 11L)))
    // boundary: n·k == N must NOT qualify (strictly-above contract)
    val tie = (Seq.fill(10)("x") ++ Seq.fill(10)("y")).toDF("t")
    assert(Sketches.heavyHitters(tie, "t", k = 2).count() == 0L)
    // superset guarantee: ONE true heavy hitter buried under 1000
    // distinct singletons, k=3 counters, and the worst ordering (all
    // hot occurrences first, so the singleton tail decrements its
    // counter all the way down) — the exact recount must still find it
    val hostile = (Seq.fill(600)("hot") ++ (1 to 1000).map(i => s"s$i"))
      .toDF("t").coalesce(1)
    val hh = Sketches.heavyHitters(hostile, "t", k = 3)
      .as[(String, Long)].collect().toSeq
    assert(hh == Seq(("hot", 600L)))
    // partition-order independence of the OUTPUT: hostile repartitions
    // change phase-1 survivors, never the result
    val re = Sketches.heavyHitters(hostile.repartition(7), "t", k = 3)
      .as[(String, Long)].collect().toSeq
    assert(re == hh)
  }
}
