package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mostRecentPrior carries the latest right row at or before each left row") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:03:00"), 50.0)
    ).toDF("key", "ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:04:00"), "t1"), // after 10:00 quote → 100.0
      (1L, ts("2024-01-01 10:05:00"), "t2"), // exactly at 10:05 quote → 101.0
      (1L, ts("2024-01-01 09:59:00"), "t3"), // before any quote → null
      (2L, ts("2024-01-01 11:00:00"), "t4"), // key 2 → 50.0
      (3L, ts("2024-01-01 11:00:00"), "t5")  // unknown key → null
    ).toDF("key", "ts", "trade_id")

    val got = AsOfJoin
      .mostRecentPrior(trades, quotes, "key", "ts", Seq("px"))
      .select($"trade_id", $"asof_px")
      .as[(String, Option[Double])].collect().toMap
    assert(got == Map(
      "t1" -> Some(100.0), "t2" -> Some(101.0), "t3" -> None,
      "t4" -> Some(50.0), "t5" -> None))
  }

  test("a matched right row with NULL value wins over an older non-null one") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0)),
      (1L, ts("2024-01-01 10:05:00"), None) // newer quote, NULL px
    ).toDF("key", "ts", "px")
    val trades = Seq((1L, ts("2024-01-01 10:06:00"), "t1"))
      .toDF("key", "ts", "trade_id")
    val got = AsOfJoin
      .mostRecentPrior(trades, quotes, "key", "ts", Seq("px"))
      .select($"asof_px").as[Option[Double]].head()
    assert(got.isEmpty, "the 10:05 NULL quote is the as-of match, not 10:00")
  }

  test("a right row with a NULL timestamp never matches (ts <= t is never true)") {
    val quotes = Seq(
      (1L, Option.empty[Timestamp], 42.0), // timestampless quote
      (1L, Some(ts("2024-01-01 10:05:00")), 101.0)
    ).toDF("key", "ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "early"), // before any real quote
      (1L, ts("2024-01-01 10:06:00"), "late")
    ).toDF("key", "ts", "trade_id")
    val got = AsOfJoin
      .mostRecentPrior(trades, quotes, "key", "ts", Seq("px"))
      .select($"trade_id", $"asof_px")
      .as[(String, Option[Double])].collect().toMap
    assert(got == Map("early" -> None, "late" -> Some(101.0)),
      "the NULL-ts quote must never be carried as a match")
  }

  test("ties on (key, ts) carry a deterministic (struct-max) right row") {
    val quotes = Seq( // two quotes in the same microsecond
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:00"), 200.0)
    ).toDF("key", "ts", "px")
    val trades = Seq((1L, ts("2024-01-01 10:01:00"), "t1"))
      .toDF("key", "ts", "trade_id")
    // repeated runs with different partitioning must agree
    val results = (1 to 3).map { i =>
      AsOfJoin.mostRecentPrior(
          trades.repartition(i), quotes.repartition(4 - i), "key", "ts", Seq("px"))
        .select($"asof_px").as[Double].head()
    }
    assert(results.distinct.size == 1, s"nondeterministic tie-break: $results")
    assert(results.head == 200.0, "tie must resolve to the struct-wise maximum")
  }
}
