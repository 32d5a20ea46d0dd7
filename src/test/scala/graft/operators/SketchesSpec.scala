package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tokens(rows: Seq[String]) = rows.toDF("token")

  test("count-min never underestimates; exact when width avoids collisions") {
    val rnd = new scala.util.Random(13)
    val corpus = Seq.fill(2000)(s"w${rnd.nextInt(40)}")
    val toks = tokens(corpus)
    val truth = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // narrow sketch → collisions guaranteed (40 tokens over 4×16 buckets)
    val narrow = Sketches.countMinTable(toks, "token", depth = 4, width = 16)
    val estNarrow = Sketches.cmsEstimate(narrow,
        truth.keys.toSeq.toDF("token"), "token", depth = 4, width = 16)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (t, n) =>
      assert(estNarrow(t) >= n, s"$t: est ${estNarrow(t)} < true $n")
    }
    assert(estNarrow.exists { case (t, e) => e > truth(t) },
      "a 4x16 sketch over 40 tokens must show at least one collision")
    // wide sketch → 40 tokens almost surely collision-free in some row
    val wide = Sketches.countMinTable(toks, "token", depth = 4, width = 4096)
    val estWide = Sketches.cmsEstimate(wide,
        truth.keys.toSeq.toDF("token"), "token", depth = 4, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(truth.forall { case (t, n) => estWide(t) == n },
      "a wide sketch over 40 tokens should estimate exactly")
  }

  test("bloom: no false negatives ever, real pruning, deterministic") {
    val keys = (0 until 200).map(i => s"key-$i")
    val bits = Sketches.bloomBuild(keys.toDF("k"), "k", m = 4096, k = 3)
    val probe = (keys ++ (0 until 2000).map(i => s"other-$i")).toDF("k")
    val got = probe
      .select($"k", Sketches.bloomMightContain($"k", bits, 3).as("hit"))
      .as[(String, Boolean)].collect().toMap
    assert(keys.forall(got(_)), "an inserted key must NEVER miss")
    val fps = (0 until 2000).count(i => got(s"other-$i"))
    assert(fps < 200,
      s"4096 bits / 200 keys / k=3 must reject most non-members, fp=$fps")
    val bits2 = Sketches.bloomBuild(keys.toDF("k"), "k", m = 4096, k = 3)
    assert(bits.toSeq == bits2.toSeq, "bit layout must be deterministic")
    intercept[IllegalArgumentException] {
      Sketches.bloomBuild(keys.toDF("k"), "k", m = 1000, k = 3)
    }
  }

  test("table is bounded by depth x width; unseen tokens estimate zero") {
    val toks = tokens(Seq.fill(500)("a") ++ Seq.fill(300)("b"))
    val table = Sketches.countMinTable(toks, "token", depth = 4, width = 16)
    assert(table.count() <= 4L * 16)
    val est = Sketches.cmsEstimate(table,
        Seq("a", "b", "never-seen").toDF("token"), "token",
        depth = 4, width = 16)
      .as[(String, Long)].collect().toMap
    assert(est("a") >= 500L && est("b") >= 300L)
    // a miss in ANY row floors the estimate at that row's bucket count;
    // with only two live tokens, "never-seen" lands in an empty bucket in
    // at least one of its four rows (verified for this md5 layout)
    assert(est("never-seen") == 0L)
    intercept[IllegalArgumentException] {
      Sketches.countMinTable(toks, "token", depth = 4, width = 100)
    }
  }
}
