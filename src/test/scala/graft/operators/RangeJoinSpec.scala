package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.crossJoin(intervals)
      .filter($"t" >= $"s" && $"t" < $"e")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("bucketed join equals the naive inequality join, any bucket width") {
    val points = Seq.tabulate(200)(i => (i.toLong, (i * 37 % 1000).toLong))
      .toDF("pid", "t")
    val intervals = Seq(
      (1L, 0L, 100L), (2L, 90L, 250L), (3L, 500L, 501L),
      (4L, 999L, 1000L), (5L, 700L, 700L), // empty: matches nothing
      (6L, 0L, 1000L)
    ).toDF("iid", "s", "e")
    val expect = naive(points, intervals)
    for (width <- Seq(1L, 7L, 100L, 1000L, 4096L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
          "t", "s", "e", bucketWidth = width,
          maxBucketsPerInterval = 1001) // width=1 legitimately covers 1000
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"width=$width produced duplicates")
      assert(got.toSet == expect, s"width=$width")
    }
  }

  test("half-open semantics: start included, end excluded") {
    val points = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("pid", "t")
    val intervals = Seq((1L, 10L, 20L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals,
        "t", "s", "e", bucketWidth = 5L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("an interval spanning more than the bucket cap fails loudly") {
    val points = Seq((1L, 10L)).toDF("pid", "t")
    val wide = Seq((1L, 0L, 1000000L)).toDF("iid", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, wide, "t", "s", "e",
        bucketWidth = 10L, maxBucketsPerInterval = 16).collect()
    }
    assert(e.getMessage.contains("widen bucketWidth") ||
      Option(e.getCause).exists(_.getMessage.contains("widen bucketWidth")))
  }

  test("negative domains bucket correctly (floor, not truncation)") {
    val points = Seq((1L, -5L), (2L, -15L), (3L, 4L)).toDF("pid", "t")
    val intervals = Seq((1L, -10L, 0L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals,
        "t", "s", "e", bucketWidth = 7L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("intervalOverlap equals the naive theta-join, each pair exactly once") {
    // pseudo-random intervals with nesting, touching, disjoint, and
    // cross-bucket cases
    val a = Seq.tabulate(60) { i =>
      val s = (i * 131) % 900L; (i.toLong, s, s + 1 + (i * 17) % 120L)
    }.toDF("a_key", "a_start", "a_end")
    val b = Seq.tabulate(60) { i =>
      val s = (i * 211) % 900L; (i.toLong, s, s + 1 + (i * 29) % 150L)
    }.toDF("b_key", "b_start", "b_end")
    val expect = a.crossJoin(b)
      .filter($"a_start" < $"b_end" && $"b_start" < $"a_end")
      .select($"a_key", $"b_key").as[(Long, Long)].collect().toSet
    assert(expect.nonEmpty)
    for (width <- Seq(1L, 13L, 100L, 2048L)) {
      val got = RangeJoin.intervalOverlap(a, b,
          "a_start", "a_end", "b_start", "b_end", bucketWidth = width,
          maxBucketsPerInterval = 200)
        .select($"a_key", $"b_key").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"width=$width emitted a pair more than once")
      assert(got.toSet == expect, s"width=$width")
    }
  }

  test("intervalOverlap: touching intervals don't overlap, empties drop") {
    val a = Seq((1L, 0L, 10L), (2L, 50L, 50L)).toDF("a_key", "a_start", "a_end")
    val b = Seq((1L, 10L, 20L), (2L, 9L, 11L), (3L, 40L, 60L))
      .toDF("b_key", "b_start", "b_end")
    val got = RangeJoin.intervalOverlap(a, b,
        "a_start", "a_end", "b_start", "b_end", bucketWidth = 10L)
      .select($"a_key", $"b_key").as[(Long, Long)].collect().toSet
    // a1 touches b1 at 10 (half-open: no overlap), truly overlaps b2;
    // empty a2 matches nothing even though b3 covers its point
    assert(got == Set((1L, 2L)))
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, b, "a_start", "a_end", "a_start", "b_end",
        bucketWidth = 10L)
    }
  }
}
