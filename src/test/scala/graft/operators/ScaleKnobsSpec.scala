package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Derived scale knobs (round-12 verdict item 6): the derivation must be
  * sane, and — the load-bearing property — knob values must be
  * RESULT-invariant, pinned here at two widths per knob so auto-derived
  * defaults can never change an answer.
  */
class ScaleKnobsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("snmChunkChars: covers the session's slots, clamped to [1, min(3, keyLen)]") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val c = ScaleKnobs.snmChunkChars(docs, keyLen = 40)
    assert(c >= 1 && c <= 3)
    // local[4]: 36^1 = 36 >= 4 slots, so the derived width is 1
    assert(c === 1)
    assert(ScaleKnobs.snmChunkChars(docs, keyLen = 1) === 1,
      "a 1-char key can never chunk wider than 1")
  }

  test("postingsBuckets: power of two dividing 65536, within [16, 4096]") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val b = ScaleKnobs.postingsBuckets(docs)
    assert(b >= 16 && b <= 4096)
    assert(65536 % b === 0)
    assert(Integer.bitCount(b) === 1, s"$b must be a power of two")
  }

  test("SNM pairs are chunk-invariant: derived default ≡ explicit widths 1 and 2") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    def pairs(c: Int) = Dedup.sortedNeighborhoodPairs(
        docs, "doc_id", "text", window = 5, chunkChars = c)
      .orderBy("a_id", "b_id", "gap").collect().map(_.toString).toSeq
    val derived = Dedup.sortedNeighborhoodPairs(
        docs, "doc_id", "text", window = 5)
      .orderBy("a_id", "b_id", "gap").collect().map(_.toString).toSeq
    assert(derived === pairs(1))
    assert(derived === pairs(2))
  }

  test("SEARCHTEXT is bucket-invariant: derived default ≡ explicit 16 and 256") {
    def build(buckets: Int): Seq[String] = {
      val db = graft.core.GraftDatabase.create(spark,
        java.nio.file.Files.createTempDirectory("graft_knobs").toString,
        "kdb")
      db.createCollection("docs", StructType(Seq(
        StructField("id", LongType),
        StructField("payload", StringType))))
      db.bulkInsert("docs", graft.Tables.documents(spark, TestSpark.sf)
        .select(col("doc_id").as("id"), col("text").as("payload")))
      if (buckets == -1) db.reindexPostings("docs")
      else db.reindexPostings("docs", buckets = buckets)
      db.searchText("docs", Seq("vector", "data"), k = 20)
        .collect().map(_.toString).toSeq
    }
    val derived = build(-1)
    assert(derived === build(16))
    assert(derived === build(256))
  }
}
