package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KMeansLloydSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lloydOnce: total assignment, self-assigned seeds, k=1 degenerate") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val n = e.count()
    val out = VectorIndex.lloydOnce(e, "vec_id", "embedding", k = 8)
    val rows = out.select($"vec_id", $"c_init", $"c_refined")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == n, "every vector must be assigned")
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 8))
    assert(rows.forall(r => r._3 >= 1 && r._3 <= 8))
    assert(rows.map(_._2).distinct.length > 1, "8 seeds must actually split the data")
    val k1 = VectorIndex.lloydOnce(e, "vec_id", "embedding", k = 1)
      .select($"c_init", $"c_refined").as[(Long, Long)].collect()
    assert(k1.forall(_ == ((1L, 1L))), "k=1 puts everything in cluster 1")
  }

  test("lloydIterate converges to a stable fixed point (md5 seeding)") {
    val rnd = new scala.util.Random(11)
    def jitter(base: Float) = Array.fill(8)(base + rnd.nextFloat())
    val df = ((0L until 25L).map(i => (i, jitter(0f))) ++
      (25L until 50L).map(i => (i, jitter(50f))) ++
      (50L until 75L).map(i => (i, jitter(200f)))).toDF("vec_id", "embedding")
    val (assigned, cents, iters) =
      VectorIndex.lloydIterate(df, "vec_id", "embedding", k = 3, maxIter = 25)
    assert(iters < 25, s"must converge before maxIter, took $iters")
    assert(cents.length == 3)
    // fixed point: re-assigning with the converged centroids changes nothing
    // (md5 seeding may land a LOCAL optimum — stability, not separation,
    // is what Lloyd guarantees; separation comes from farthest seeding)
    val again = VectorIndex
      .assignNearestCentroid(df, cents, "embedding")
      .select($"vec_id", $"cluster_id").as[(Long, Int)].collect().toMap
    val got = assigned.select($"vec_id", $"cluster_id".cast("int"))
      .as[(Long, Int)].collect().toMap
    assert(got == again, "converged assignment must be a fixed point")
  }

  test("farthest seeding separates well-separated blobs (guaranteed)") {
    val rnd = new scala.util.Random(11)
    def jitter(base: Float) = Array.fill(8)(base + rnd.nextFloat())
    val df = ((0L until 25L).map(i => (i, jitter(0f))) ++
      (25L until 50L).map(i => (i, jitter(50f))) ++
      (50L until 75L).map(i => (i, jitter(200f)))).toDF("vec_id", "embedding")
    // k-center greedy lands one seed per blob (inter-blob distance beats
    // any intra-blob spread) — so one Lloyd pass separates them perfectly
    val (assigned, cents, iters) = VectorIndex.lloydIterate(
      df, "vec_id", "embedding", k = 3, maxIter = 25, seeding = "farthest")
    assert(iters < 25)
    val got = assigned.select($"vec_id", $"cluster_id".cast("int"))
      .as[(Long, Int)].collect().toMap
    val groups = Seq(0L until 25L, 25L until 50L, 50L until 75L)
      .map(_.map(got).toSet)
    assert(groups.forall(_.size == 1), s"each blob in one cluster: $groups")
    assert(groups.flatten.toSet.size == 3, "three distinct clusters")
    val centBase = cents.map(_.head).sorted
    assert(centBase(0) >= 0 && centBase(0) <= 1.5)
    assert(centBase(1) >= 50 && centBase(1) <= 51.5)
    assert(centBase(2) >= 200 && centBase(2) <= 201.5)
  }

  test("farthestPointSample picks one point per blob before any second") {
    val rnd = new scala.util.Random(3)
    def jitter(base: Float) = Array.fill(8)(base + rnd.nextFloat())
    val df = ((0L until 10L).map(i => (i, jitter(0f))) ++
      (10L until 20L).map(i => (i, jitter(50f))) ++
      (20L until 30L).map(i => (i, jitter(200f)))).toDF("vec_id", "embedding")
    val picks = VectorIndex.farthestPointSample(df, "vec_id", "embedding", 3)
    assert(picks.length == 3)
    def blob(id: Long) = id / 10
    assert(picks.map(p => blob(p._1)).toSet.size == 3,
      s"first 3 picks must cover all 3 blobs: ${picks.map(_._1)}")
    // determinism
    val again = VectorIndex.farthestPointSample(df, "vec_id", "embedding", 3)
    assert(picks.map(_._1) == again.map(_._1))
    intercept[IllegalArgumentException] {
      VectorIndex.farthestPointSample(
        df.withColumn("sid", $"vec_id".cast("string")), "sid", "embedding", 2)
    }
  }

  test("farthestPointSample running-min equals the O(k²) greedy reference") {
    val rnd = new scala.util.Random(29)
    val df = (0L until 60L).map(i => (i, Array.fill(6)(rnd.nextFloat() * 10f)))
      .toDF("vec_id", "embedding")
    val got = VectorIndex.farthestPointSample(df, "vec_id", "embedding", 12)
    // reference: the textbook greedy, recomputing all distances per round
    // on collected data with the SAME rounding/tie rules
    val pts = df.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def d(a: Seq[Double], b: Seq[Double]): Double = {
      val raw = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      java.math.BigDecimal.valueOf(raw)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val first = pts.minBy(p => (md5hex("kc:" + p._1), p._1))
    val ref = scala.collection.mutable.ArrayBuffer(first)
    while (ref.length < 12) {
      val remaining = pts.filterNot(p => ref.exists(_._1 == p._1))
      val next = remaining.maxBy(p =>
        (ref.map(c => d(p._2, c._2)).min, -p._1))
      ref += next
    }
    assert(got.map(_._1).toSeq == ref.map(_._1).toSeq,
      "running-min selection must replay the quadratic greedy exactly")
  }

  test("farthestPointSample: duplicate vectors pick distinct ids; k too large fails loud") {
    // five distinct ids but only TWO distinct vectors
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0f, 0f)), (3L, Array(0f, 0f)),
      (4L, Array(9f, 9f)), (5L, Array(9f, 9f))).toDF("vec_id", "embedding")
    val picks = VectorIndex.farthestPointSample(df, "vec_id", "embedding", 5)
    assert(picks.map(_._1).distinct.length == 5,
      s"every pick must be a distinct id: ${picks.map(_._1)}")
    val err = intercept[IllegalArgumentException] {
      VectorIndex.farthestPointSample(df, "vec_id", "embedding", 6)
    }
    assert(err.getMessage.contains("exceeds"),
      s"exhaustion must fail loud, got: ${err.getMessage}")
  }

  test("lloydOnce separates two well-separated blobs after one step") {
    // blob A near (0, 0, ...), blob B near (100, 100, ...); any seeding
    // refines to a perfect split because the refined centroids land in
    // their blobs' convex hulls
    val rnd = new scala.util.Random(5)
    def jitter() = Array.fill(8)(rnd.nextFloat() * 0.5f)
    val a = (0L until 20L).map(i => (i, jitter()))
    val b = (20L until 40L).map(i => (i, jitter().map(_ + 100f)))
    val df = (a ++ b).toDF("vec_id", "embedding")
    val got = VectorIndex.lloydOnce(df, "vec_id", "embedding", k = 2)
      .select($"vec_id", $"c_refined").as[(Long, Long)].collect().toMap
    val clustersA = (0L until 20L).map(got).toSet
    val clustersB = (20L until 40L).map(got).toSet
    assert(clustersA.size == 1 && clustersB.size == 1 && clustersA != clustersB,
      s"one refinement must separate the blobs: A→$clustersA B→$clustersB")
  }

  test("lloydOnce: empty input returns the typed empty frame, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = VectorIndex.lloydOnce(empty, "vec_id", "embedding", k = 4)
    assert(out.columns.toSeq == Seq("vec_id", "c_init", "c_refined"))
    assert(out.isEmpty)
  }
}
