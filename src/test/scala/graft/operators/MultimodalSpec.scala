package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media column + batched decode produce deterministic metadata") {
    val df = Seq((1L, "hello"), (2L, "a longer payload here")).toDF("id", "text")
    val meta = Multimodal.decodePipeline(spark, df, "id", "text")
      .as[Multimodal.MediaMeta].collect().sortBy(_.id)
    assert(meta(0).n_bytes == 5L)
    assert(meta(0).checksum == "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(meta(0).width == 5L && meta(0).height == 5L)
    assert(meta(1).n_bytes == 21L)
    assert(meta.forall(_.media_type == "text/plain"))
  }

  test("batch boundary: batchSize smaller than partition still covers all rows") {
    val df = (1L to 200L).map(i => (i, s"payload-$i")).toDF("id", "text")
    val media = Multimodal.withMediaColumn(df, "id", "text")
      .as[Multimodal.MediaRecord]
    val out = Multimodal.extractMetadata(media, batchSize = 7).collect()
    assert(out.length == 200)
    assert(out.map(_.id).toSet == (1L to 200L).toSet)
  }
}
