package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Error surfaces: bad inputs must fail loudly, not score garbage. */
class ErrorPathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vector length mismatch fails the job (not a silent wrong score)") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(cosine_sim($"a", $"b")).collect()
    }
    assert(e.isInstanceOf[SparkException] || e.isInstanceOf[IllegalArgumentException])
  }

  test("type mismatch is an analysis-time error with a useful message") {
    val df = Seq((1, "x")).toDF("a", "b")
    val e = intercept[AnalysisException] {
      df.select(cosine_sim($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("array<float>") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("bulkInsert with a missing declared column fails fast") {
    val db = graft.core.GraftDatabase.create(spark,
      java.nio.file.Files.createTempDirectory("err").toString, "errdb")
    db.createCollection("vecs")
    val bad = Seq((1L, Array(1.0f))).toDF("id", "embedding") // no payload
    val e = intercept[IllegalArgumentException] {
      db.bulkInsert("vecs", bad)
    }
    assert(e.getMessage.contains("payload"))
  }
}
