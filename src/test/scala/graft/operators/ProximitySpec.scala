package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Minimal-cover-span proximity ([[TextAnalysis.minCoverSpans]], the
  * q275/q276/q277 operator): hand-computable windows, all-terms gating,
  * occurrence counting, and the window-clipping edges.
  */
class ProximitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], terms: Seq[String]) =
    TextAnalysis.minCoverSpans(
        TextAnalysis.invertedIndexPositional(
          docs.toDF("doc_id", "text"), "doc_id", "text"),
        "doc_id", terms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("hand-computed windows: adjacency, spread, and the optimal inner window") {
    val docs = Seq(
      1L -> "a b",             // adjacent -> span 2
      2L -> "a x x x b",       // only pair -> span 5
      3L -> "a x b x x a b",   // best window is the trailing "a b" -> 2
      4L -> "b x a",           // order matters: window must COVER both -> 3
      5L -> "a a a",           // missing b -> absent
      6L -> "b b")             // missing a -> absent
    val m = spans(docs, Seq("a", "b"))
    assert(m(1L) === ((2L, 2L)))
    assert(m(2L) === ((5L, 2L)))
    assert(m(3L) === ((2L, 4L)))
    assert(m(4L) === ((3L, 2L)))
    assert(!m.contains(5L) && !m.contains(6L))
  }

  test("three terms: span covers one occurrence of EACH, extra copies don't shrink it") {
    val docs = Seq(
      1L -> "a b c",           // 3
      2L -> "a a a b x c",     // best start = 3rd a -> positions 2..5 -> 4
      3L -> "c b a",           // any order -> 3
      4L -> "a b x x x c a b") // trailing "c a b" -> 3
    val m = spans(docs, Seq("a", "b", "c"))
    assert(m(1L)._1 === 3L)
    assert(m(2L)._1 === 4L)
    assert(m(3L)._1 === 3L)
    assert(m(4L)._1 === 3L)
  }

  test("SEARCHPROX parses and requires >= 2 distinct normalized terms") {
    val parsed = graft.commands.CommandParser.parse(
      Some("docs"), "searchprox", Some("terms=a,b;k=5"))
    assert(parsed.isRight)
    assert(graft.commands.CommandParser.parse(
      None, "SEARCHPROX", Some("terms=a,b")).isLeft)
    val db = graft.core.GraftDatabase.create(spark,
      java.nio.file.Files.createTempDirectory("graft_prox").toString, "pxdb")
    db.createCollection("docs", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType))))
    db.bulkInsert("docs", Seq((1L, "a b c")).toDF("id", "payload"))
    val e = intercept[IllegalArgumentException] {
      db.searchProximity("docs", Seq("Solo!"))
    }
    assert(e.getMessage.contains(">= 2 distinct terms"))
    // rescan path (no positional artifact) answers correctly
    val rows = db.searchProximity("docs", Seq("a", "c")).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 3L)))
  }
}
