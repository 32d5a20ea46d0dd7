package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zvalue interleaves bits (a even, b odd positions)") {
    val df = Seq((3, 5), (0, 0), (255, 0), (0, 255), (255, 255))
      .toDF("a", "b")
    val got = df.select(ZOrder.zvalue($"a", $"b", 8)).as[Long].collect()
    // a=3 → bits at 0,2 = 5; b=5 → bits at 1,5 = 34
    assert(got(0) == 39L)
    assert(got(1) == 0L)
    assert(got(2) == 0x5555L, "a occupies even bit positions")
    assert(got(3) == 0xAAAAL, "b occupies odd bit positions")
    assert(got(4) == 0xFFFFL)
  }

  test("zvalueSql reproduces zvalue through the SQL engine") {
    val df = (0 until 512).map(i => (i % 256, (i * 37) % 256))
      .toDF("a", "b")
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zvalueSql("a", "b", 8)} AS z FROM zin")
      .as[Long].collect().sorted
    val viaCol = df.select(ZOrder.zvalue($"a", $"b", 8)).as[Long]
      .collect().sorted
    assert(viaSql.sameElements(viaCol))
  }

  test("layout keeps BOTH dimensions tight per partition; 1-col sort does not") {
    val n = 20000
    val df = (0 until n).map(i => (i % 251, (i * 7919) % 251))
      .toDF("c1", "c2")
    def spans(ldf: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = ldf.withColumn("__p", spark_partition_id())
        .groupBy("__p")
        .agg((max("c1") - min("c1")).as("s1"), (max("c2") - min("c2")).as("s2"))
        .agg(avg("s1"), avg("s2")).as[(Double, Double)].head()
      s
    }
    val (z1, z2) = spans(ZOrder.layout(df, "c1", "c2", 8, 16))
    // a 16-file z-layout over a 256×256 grid keeps each file near a
    // √16 = 4×4 curve region → ~1/4 of each dimension's range (plus
    // boundary effects); 60% is a loose ceiling that still rules out
    // any one dimension degenerating to full-range
    assert(z1 < 0.6 * 250 && z2 < 0.6 * 250,
      s"z-order must bound both dims, got spans ($z1, $z2)")
    val single = df.repartitionByRange(16, $"c1").sortWithinPartitions("c1")
    val (s1, s2) = spans(single)
    assert(s1 < 0.2 * 250, "sanity: 1-col sort is tight on its own column")
    assert(s2 > 0.9 * 250,
      s"sanity: 1-col sort leaves the other dim full-range, got $s2")
    assert(z2 < s2 / 2,
      "z-order must at least halve the second dimension's per-file span")
  }
}
