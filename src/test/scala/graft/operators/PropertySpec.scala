package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The property suite SURVEY §5 commits to (beyond the cosine invariants in
  * VectorExpressionsSpec): top-k nesting, mutation idempotence, and
  * approximate-aggregate error bounds.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("top-k ⊆ top-(k+1) for k = 1..15 (cosine and l2)") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val q = e.filter($"vec_id" === 3).select("embedding").head().getSeq[Float](0).toArray
    for (metric <- Seq("cosine", "l2")) {
      var prev = Set.empty[Long]
      (1 to 15).foreach { k =>
        val ids = SimilaritySearch
          .topK(e, q, k, metric, vecCol = "embedding", idCol = "vec_id")
          .select("vec_id").as[Long].collect().toSet
        assert(ids.size == k)
        assert(prev.subsetOf(ids), s"top-${k - 1} ⊄ top-$k for $metric")
        prev = ids
      }
    }
  }

  test("decontaminate ≡ brute-force shingle-set overlap on random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff")
    def doc() = Seq.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(vocab.length)))
      .mkString(" ")
    for (trial <- 0 until 3) {
      val docs = (0L until 30L).map(i => (i, doc()))
      val df = docs.toDF("doc_id", "text")
      val evalIds = docs.map(_._1).filter(_ % 7 == 0).toSet
      val n = 3; val minShared = 2
      def shingles(t: String): Set[String] =
        t.split("\\s+").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      val expected = (for {
        (d, dt) <- docs
        e <- evalIds if e != d
        shared = shingles(dt).intersect(shingles(docs(e.toInt)._2)).size
        if shared >= minShared
      } yield (d, e, shared.toLong)).toSet
      val got = Dedup.decontaminate(df, df.filter($"doc_id" % 7 === 0),
          "doc_id", "text", shingleN = n, minShared = minShared)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"trial $trial: $got != $expected")
    }
  }

  test("repetition stats: stateless ≡ grouped batch on random multi-line docs") {
    val rnd = new scala.util.Random(43)
    val vocab = Array("aa", "bb", "cc", "a", "b", "zz zz", "")
    def line() = Seq.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.length)))
      .mkString(" ")
    def doc() = Seq.fill(rnd.nextInt(4) + 1)(line()).mkString("\n")
    for (trial <- 0 until 3) {
      val docs = (0L until 40L).map(i => (i, doc())).toDF("doc_id", "text")
      val batch = TextAnalysis.repetitionStats(docs, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      val stateless = TextAnalysis
        .repetitionStatsStateless(docs, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(batch == stateless,
        s"trial $trial: streaming reformulation diverged from the batch aggs")
    }
  }

  test("upsert is idempotent; delete is idempotent; delete∘upsert removes") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val up = Seq((2L, "b2"), (4L, "d")).toDF("id", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String)].collect().toSet

    val once = Mutations.upsert(base, up)
    val twice = Mutations.upsert(once, up)
    assert(rows(once) == Set((1L, "a"), (2L, "b2"), (3L, "c"), (4L, "d")))
    assert(rows(twice) == rows(once), "upsert twice == upsert once")

    val del = Mutations.deleteWhere(once, col("id") === 2)
    val delTwice = Mutations.deleteWhere(del, col("id") === 2)
    assert(rows(del) == Set((1L, "a"), (3L, "c"), (4L, "d")))
    assert(rows(delTwice) == rows(del), "delete twice == delete once")

    // upsert after delete restores exactly the upserted version
    val restored = Mutations.upsert(del, Seq((2L, "b3")).toDF("id", "v"))
    assert(rows(restored).contains((2L, "b3")))
  }

  test("snapshotDiff: all four statuses, upsert round-trip consistency") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "sig")
    val next = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "sig")
    def diff(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      Mutations.snapshotDiff(a, b, "id", "sig")
        .as[(Long, String)].collect().toMap
    assert(diff(prev, next) == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // self-diff is all-unchanged; diff against empty is all-removed
    assert(diff(prev, prev).values.forall(_ == "unchanged"))
    assert(diff(prev, prev.limit(0)).values.forall(_ == "removed"))
    // NULL signatures: both-null is unchanged, one-sided null is changed
    val pn = Seq((1L, null: String), (2L, "x")).toDF("id", "sig")
    val nn = Seq((1L, null: String), (2L, null: String)).toDF("id", "sig")
    assert(diff(pn, nn) == Map(1L -> "unchanged", 2L -> "changed"))
    // applying upsert(next-side adds/changes) + delete(removed) to prev
    // reproduces next — the diff really is the incremental recipe
    val d = diff(prev, next)
    val changedOrAdded = next.filter(col("id")
      .isin(d.filter(kv => kv._2 == "added" || kv._2 == "changed")
        .keys.toSeq: _*))
    val removedKeys = prev.filter(col("id")
      .isin(d.filter(_._2 == "removed").keys.toSeq: _*)).select("id")
    val rebuilt = Mutations.deleteByKeys(
      Mutations.upsert(prev, changedOrAdded), removedKeys)
    assert(rebuilt.as[(Long, String)].collect().toSet ==
      next.as[(Long, String)].collect().toSet)
  }

  test("sq8 quantization: Spark expression equals the driver-side rule on random floats") {
    val rnd = new scala.util.Random(11)
    // values spanning the clamp range and the floor boundaries
    val vals = Array.fill(512)((rnd.nextDouble() * 4 - 2).toFloat) ++
      Array(-1.0f, 1.0f, 0.0f, 0.5f / 127, -0.5f / 127, 1.5f, -1.5f)
    val df = Seq(Tuple1(vals)).toDF("v")
    val sparkSide = df.select(SimilaritySearch.sq8(col("v")).as("q"))
      .as[Seq[Int]].head()
    val driverSide = vals.map(x =>
      math.max(-127, math.min(127, math.floor(x.toDouble * 127 + 0.5).toInt))).toSeq
    assert(sparkSide == driverSide,
      "quantization rule must be identical driver-side and in the expression")
  }

  test("bounded-buffer sessionize is invariant to any in-buffer reordering") {
    val gapUs = 300L * 1000000L
    val zero = graft.streaming.StatefulSessions.SessionState(0L, 0L, 0L, 0L)
    val base = (0 until 5000).map(i => graft.streaming.StatefulSessions.Event(
      1L, i.toLong * 90L * 1000000L)) // 90s cadence → gaps never split
    val rnd = new scala.util.Random(3)
    (0 until 5).foreach { trial =>
      // shuffle within random windows of ≤ 64 — disorder the 64-buffer covers
      val shuffled = base.grouped(64).flatMap(g => rnd.shuffle(g)).toSeq
      val (c1, s1, _) = graft.streaming.StatefulSessions.sessionize(
        shuffled.iterator, gapUs, zero, maxBuffer = 128)
      val (c2, s2, _) = graft.streaming.StatefulSessions.sessionize(
        base.iterator, gapUs, zero, maxBuffer = 128)
      assert(c1 == c2 && s1 == s2, s"trial $trial diverged")
    }
  }

  test("nearestCentroidIds: nprobe distinct cells, nearest first") {
    val rnd = new scala.util.Random(5)
    val centroids = Array.fill(16)(Array.fill(8)(rnd.nextGaussian()))
    (0 until 20).foreach { _ =>
      val q = Array.fill(8)(rnd.nextGaussian().toFloat)
      val ids = VectorIndex.nearestCentroidIds(q, centroids, nprobe = 4)
      assert(ids.size == 4 && ids.distinct.size == 4)
      def d2(c: Array[Double]) =
        c.zipWithIndex.map { case (x, j) => (q(j) - x) * (q(j) - x) }.sum
      val best = centroids.zipWithIndex.minBy { case (c, i) => (d2(c), i) }._2
      assert(ids.head == best, "first probed cell must be the nearest centroid")
    }
  }

  test("bloom-pruned decontamination ≡ exact decontamination on random corpora") {
    val rnd = new scala.util.Random(99)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def doc() = Seq.fill(rnd.nextInt(14) + 6)(vocab(rnd.nextInt(vocab.length)))
      .mkString(" ")
    for (trial <- 0 until 3) {
      val df = (0L until 40L).map(i => (i, doc())).toDF("doc_id", "text")
      val evalSet = df.filter($"doc_id" % 7 === 0)
      def rows(out: org.apache.spark.sql.DataFrame) =
        out.select($"doc_id", $"eval_id", $"n_shared")
          .as[(Long, Long, Long)].collect().toSet
      val exact = rows(Dedup.decontaminate(
        df, evalSet, "doc_id", "text", shingleN = 3, minShared = 2))
      val bloomed = rows(Dedup.decontaminateBloom(
        df, evalSet, "doc_id", "text", shingleN = 3, minShared = 2))
      assert(bloomed == exact, s"trial $trial: bloom path diverged")
    }
  }

  test("chunking invariants on random docs: count formula, coverage, tail") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 40L).map { i =>
      (i, Seq.fill(rnd.nextInt(120))(s"t${rnd.nextInt(50)}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for ((size, stride) <- Seq((10, 10), (10, 7), (25, 5), (1, 1))) {
      val got = TextAnalysis.chunkDocuments(df, "doc_id", "text", size, stride)
        .select($"doc_id", $"chunk_id", $"chunk")
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val n = toks.length
        val expected =
          if (n == 0) 0 else 1 + math.max((n - size + stride - 1) / stride, 0)
        val chunks = got.getOrElse(id, Array.empty)
        assert(chunks.length == expected,
          s"doc $id n=$n size=$size stride=$stride: ${chunks.length} chunks")
        // every chunk is the exact token slice; the union covers the doc
        chunks.foreach { case (_, cid, chunk) =>
          val want = toks.slice((cid * stride).toInt,
            (cid * stride).toInt + size).mkString(" ")
          assert(chunk == want, s"doc $id chunk $cid")
        }
        if (n > 0) {
          val lastStart = (expected - 1) * stride
          assert(lastStart + size >= n, "tail must be covered")
        }
      }
    }
  }

  test("approx_count_distinct is within its rsd bound on real keys") {
    val li = graft.Tables.lineitem(spark, TestSpark.sf)
    val (approx, exact) = li.agg(
      approx_count_distinct("l_partkey", rsd = 0.05),
      countDistinct("l_partkey")).as[(Long, Long)].head()
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.15, s"approx=$approx exact=$exact err=$err beyond 3×rsd")
  }

  test("normalizers are idempotent: canonical forms are fixpoints") {
    // dedup keys break if normalizing an already-normal value moves it —
    // f(f(x)) == f(x) for every normalizer on a fuzz sweep
    val rnd = new scala.util.Random(7)
    val hostParts = Seq("Example.COM", "a.ORG:443", "b.net:8080", "U:p@H.io")
    val pathParts = Seq("", "/x", "/x/", "/x/y///", "#f", "#/r?page=2",
      "?utm_source=a", "?q=1&utm_b=c&r=2", "?utm_only=1", "?q=1#f")
    val urls = (for { h <- hostParts; p <- pathParts }
      yield s"https://$h$p") ++ Seq("not a url", "ftp://X.y/Z/")
    val accents = Seq("café", "café", "straße",
      "का", "가각", "naïve ascii",
      "ÅΩ", "mixed éé ends")
    val fuzz = (0 until 50).map { _ =>
      (0 until rnd.nextInt(12)).map(_ =>
        (0x20 + rnd.nextInt(0x2fff)).toChar).mkString
    }
    val df = (urls ++ accents ++ fuzz).toDF("s")
    import graft.functions.{nfc_normalize, strip_accents}
    val bad = df.select(col("s"),
        UrlOps.canonicalizeUrl(col("s")).as("u1"),
        UrlOps.canonicalizeUrl(UrlOps.canonicalizeUrl(col("s"))).as("u2"),
        nfc_normalize(col("s")).as("n1"),
        nfc_normalize(nfc_normalize(col("s"))).as("n2"),
        strip_accents(col("s")).as("a1"),
        strip_accents(strip_accents(col("s"))).as("a2"))
      .filter(col("u1") =!= col("u2") || col("n1") =!= col("n2")
        || col("a1") =!= col("a2"))
      .collect()
    assert(bad.isEmpty,
      s"non-idempotent normalization on: ${bad.take(5).mkString("; ")}")
  }
}
