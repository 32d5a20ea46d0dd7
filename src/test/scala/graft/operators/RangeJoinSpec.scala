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
}
