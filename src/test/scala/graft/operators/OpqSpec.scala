package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** OPQ fixed rotation + the latent-mix fixture (q165): orthogonality,
  * self-inverse rotation, bit-exact fixture replay, and the measured
  * claim itself — rotated PQ beats plain PQ on data whose latent
  * structure straddles the contiguous subspace boundaries.
  */
class OpqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  // the spec's independent replay of latentPairFixture's latent vector
  private def latent(id: Long, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      val choice = Integer.parseInt(md5hex(s"lmc:$id:${d / 2}").substring(0, 1), 16) % 4
      val center = if (((choice >> (d % 2)) & 1) == 1) 0.5 else -0.5
      val slice = Integer.parseInt(md5hex(s"lmn:$id:$d").substring(0, 4), 16)
      center + (slice.toDouble / 65536.0 - 0.5) * 0.25
    }

  test("hadamardSign: H·Hᵀ = n·I at n = 16 (orthogonal rows)") {
    val n = 16
    for (i <- 0 until n; j <- 0 until n) {
      val dot = (0 until n).map(k =>
        VectorPrep.hadamardSign(i, k) * VectorPrep.hadamardSign(j, k)).sum
      assert(dot == (if (i == j) n.toDouble else 0.0),
        s"row dot ($i, $j) = $dot")
    }
  }

  test("latentPairFixture: components are the exact Hadamard mixture of the latent") {
    val dim = 16
    val f = VectorPrep.latentPairFixture(
        spark.range(0, 20).toDF("vec_id"), "vec_id", dim)
      .select($"vec_id", $"fvec").as[(Long, Seq[Double])].collect().toMap
    val scale = 0.25
    f.foreach { case (id, v) =>
      val lat = latent(id, dim)
      val expect = Array.tabulate(dim) { i =>
        (0 until dim).map(d => lat(d) * (VectorPrep.hadamardSign(i, d) * scale)).sum
      }
      assert(v.toArray.sameElements(expect),
        s"id $id: fixture must be the bit-exact mixture (dyadic doctrine)")
    }
  }

  test("opqRotate: recovers the latent up to output rounding; self-inverse") {
    val dim = 16
    val f = VectorPrep.latentPairFixture(
      spark.range(0, 20).toDF("vec_id"), "vec_id", dim)
    val rot = VectorPrep.opqRotate(f, "fvec", dim, "rvec")
    val rows = rot.select($"vec_id", $"fvec", $"rvec")
      .as[(Long, Seq[Double], Seq[Double])].collect()
    rows.foreach { case (id, _, rv) =>
      val lat = latent(id, dim)
      val maxErr = rv.zip(lat).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= 1.1e-6,
        s"id $id: rotation must recover the latent to rounding precision, err $maxErr")
    }
    // H/√n symmetric orthogonal → rotating the rotation restores fvec
    val back = VectorPrep.opqRotate(rot, "rvec", dim, "bvec")
      .select($"vec_id", $"fvec", $"bvec")
      .as[(Long, Seq[Double], Seq[Double])].collect()
    back.foreach { case (id, fv, bv) =>
      val maxErr = fv.zip(bv).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= 2.1e-6, s"id $id: double rotation must be identity, err $maxErr")
    }
  }

  test("opqRotate rejects non-power-of-two dims; fixture rejects non-power-of-4") {
    val df = spark.range(0, 4).toDF("vec_id")
    intercept[IllegalArgumentException] {
      VectorPrep.opqRotate(df.withColumn("v", array(lit(1.0))), "v", 3)
    }
    intercept[IllegalArgumentException] {
      VectorPrep.latentPairFixture(df, "vec_id", dim = 8)
    }
  }

  test("q165: rotated PQ beats plain PQ on the latent-mix fixture") {
    val out = graft.queries.VectorQueries.queries("q165_opq_recall")(
      spark, TestSpark.sf)
      .select($"n_hit_plain", $"n_hit_rot").as[(Long, Long)].collect()
    val (plain, rot) = (out.map(_._1).sum, out.map(_._2).sum)
    assert(rot > plain,
      s"rotation must earn its keep on the mixed fixture: plain=$plain rot=$rot")
    assert(rot >= out.length * 9,
      s"rotated arm should be near-exact on clean latent clusters, got $rot/${out.length * 10}")
  }
}
