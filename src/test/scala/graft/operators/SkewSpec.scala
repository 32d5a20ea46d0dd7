package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin result equals the plain join on a skewed key") {
    // 90% of left rows share one hot key
    val left = ((1 to 900).map(i => (42L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong, s"cold$i"))).toDF("key", "payload")
    val right = (1L to 100L).map(k => (k, s"dim$k"))
      .toDF("key", "dim") union Seq((42L, "dim42b")).toDF("key", "dim")

    val plain = left.join(right, Seq("key")).select("key", "payload", "dim")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "key", saltFactor = 8)
      .select("key", "payload", "dim")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("right/full outer joins are rejected (replication would duplicate rows)") {
    val df = Seq((1L, "a")).toDF("key", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, "key", joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, "key", joinType = "full")
    }
  }
}
