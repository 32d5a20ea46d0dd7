package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cosRef(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine_sim matches reference impl on concrete vectors") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(cosine_sim($"a", $"b")).as[Double].head()
    assert(math.abs(got - cosRef(a, b)) < 1e-12)
  }

  test("l2_dist / dot_product / l2_norm concrete values") {
    val df = Seq((Array(3.0f, 4.0f), Array(0.0f, 0.0f))).toDF("a", "b")
    val row = df.select(
      l2_dist($"a", $"b"), dot_product($"a", $"a"), l2_norm($"a")
    ).as[(Double, Double, Double)].head()
    assert(row == ((5.0, 25.0, 5.0)))
  }

  test("hamming_dist counts differing positions") {
    val df = Seq((Array(1, 0, 1, 1), Array(1, 1, 1, 0))).toDF("a", "b")
    assert(df.select(hamming_dist($"a", $"b")).as[Int].head() == 2)
  }

  test("works via SQL registration too") {
    graft.functions.registerAll(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D))").as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("null array yields null, null elements treated as zero") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), None: Option[Array[Float]])
    ).toDF("a", "b")
    assert(df.select(cosine_sim($"a", $"b")).head().isNullAt(0))
  }

  // Property-ish tests over seeded random vectors: one Spark job scores all
  // cases at once (exercises the codegen path), results checked against the
  // scalar reference implementation.
  private val rnd = new scala.util.Random(42)
  private def randVec(n: Int): Array[Float] =
    Array.fill(n)(rnd.nextFloat() * 200.0f - 100.0f)

  test("cosine invariants on 100 random vector pairs (codegen path)") {
    val cases = (0 until 100).map(i => (i, randVec(16), randVec(16)))
    val rows = cases.toDF("i", "a", "b")
      .select($"i",
        cosine_sim($"a", $"b").as("ab"), cosine_sim($"b", $"a").as("ba"),
        cosine_sim($"a", $"a").as("self"), l2_dist($"a", $"b").as("d"),
        l2_dist($"a", $"a").as("dself"))
      .as[(Int, Double, Double, Double, Double, Double)]
      .collect()
    rows.foreach { case (i, ab, ba, self, d, dself) =>
      val (_, a, b) = cases(i)
      assert(math.abs(ab - ba) < 1e-12, s"symmetry case $i")
      assert(math.abs(ab - cosRef(a, b)) < 1e-9, s"vs reference case $i")
      assert(math.abs(self - 1.0) < 1e-9, s"self-sim case $i")
      assert(d >= 0.0 && dself == 0.0, s"l2 case $i")
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9, s"range case $i")
    }
  }

  test("topK on sf0.001 embeddings matches brute-force oracle") {
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    val all = e.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    val q = all(0L)
    val expect = all.toSeq.filterNot(_._1 == 0L)
      .map { case (id, v) => (id, cosRef(v, q)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(10).map(_._1)
    val got = graft.operators.SimilaritySearch
      .topK(e.filter($"vec_id" =!= 0), q, 10, "cosine",
        vecCol = "embedding", idCol = "vec_id")
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == expect)
  }
}
