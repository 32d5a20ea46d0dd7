package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding preprocessing: deterministic dimensionality reduction and
  * per-dimension standardization — the two transforms that run between
  * raw embeddings and an index build at scale (project 384→64 before
  * IVF, standardize before cosine when dimensions carry wildly different
  * scales).
  *
  * Both are md5-reproducible by the house rule: the projection matrix is
  * a pure function of (seed, i, j), and the standardization statistics
  * are rounded before reuse — so a SQL engine replays either transform
  * exactly (the q109/q110 gates do).
  */
object VectorPrep {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** The sign-matrix entry R(i, j) ∈ {−1, +1} from the first hex digit of
    * md5("seed:i:j") — the Achlioptas sparse-JL construction with ±1
    * entries; any engine recomputes it from the same string.
    */
  def signEntry(seed: String, i: Int, j: Int): Double =
    if (Integer.parseInt(md5hex(s"$seed:$i:$j").substring(0, 1), 16) % 2 == 0)
      1.0
    else -1.0

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions:
    * out_j = Σ_i v_i · R(i, j) / √outDim, each output component rounded
    * to 6 places (engine-exact handoff, same doctrine as the Lloyd
    * centroids). The matrix lives as `outDim` literal sign rows inside
    * the codegen'd dot products — k·dim doubles of plan constants, no
    * join, no shuffle; the whole projection runs inside the scan.
    *
    * Appends `projCol` (array<double> of length `outDim`).
    */
  def randomProject(df: DataFrame, vecCol: String, inDim: Int, outDim: Int,
      projCol: String = "projected", seed: String = "rp"): DataFrame = {
    require(inDim >= 1 && outDim >= 1,
      s"dims must be positive, got in=$inDim out=$outDim")
    val scale = math.sqrt(outDim.toDouble)
    // materialize the double cast ONCE: it is referenced by every output
    // component, and a projection re-evaluates non-aliased expressions
    // per reference (the ngramsFromTokens lesson — outDim array copies
    // per row otherwise)
    val comps = (0 until outDim).map { j =>
      val signs = Array.tabulate(inDim)(i => signEntry(seed, i, j))
      round(graft.functions.dot_product(col("__vd"), lit(signs)) / scale, 6)
    }
    df.withColumn("__vd", col(vecCol).cast("array<double>"))
      .withColumn(projCol, array(comps: _*))
      .drop("__vd")
  }

  /** Cluster centers of the [[clusteredFixture]]: for the first
    * `min(8, dim)` dimensions, ±0.5 from the bits of the cluster id
    * (so the 8-bit sign bucket of every member IS its cluster — the
    * probe geometry is exact by construction, and the k cells are
    * pairwise distinct); for the remaining dimensions, ±0.5 from the
    * first hex digit of md5("seed:j:d") — the [[signEntry]]
    * discipline, engine-recomputable.
    */
  def fixtureCenters(kClusters: Int, dim: Int,
      seed: String = "cfx"): Array[Array[Double]] = {
    require(kClusters >= 1 && kClusters <= 256,
      s"kClusters must be in [1, 256], got $kClusters")
    Array.tabulate(kClusters) { j =>
      Array.tabulate(dim) { d =>
        if (d < 8) { if (((j >> d) & 1) == 1) 0.5 else -0.5 }
        else signEntry(s"$seed:$j", d, 0) / 2.0
      }
    }
  }

  /** Deterministic CLUSTERED vector fixture — the recall test-bed the
    * isotropic testdata embeddings cannot provide (they measure ~0.1
    * recall@10 for ANY bucketing ANN — q126/q138 — because no cell
    * structure exists to exploit). Each id gets cluster `id % k` and
    * vector `center + noise`, noise_d uniform on [−0.125, 0.125) from
    * a 16-bit md5 slice: `(hex4(md5("cfn:id:d")) / 65536 − 0.5) · 0.25`.
    * Every term is an exact dyadic rational, so components need NO
    * rounding — both engines hold bit-identical doubles — and
    * |noise| < |center| = 0.5 means each member's 8-bit sign bucket
    * equals its cluster signature exactly. Intra-cluster spread
    * (≲ 0.25/dim) is far below the ≥ 0.75 nearest inter-cluster
    * distance, so exact top-k neighbors are in-cluster whenever the
    * cluster has ≥ k+1 members.
    *
    * Pure column math (plan-literal centers + per-(id, d) md5) inside
    * the scan — the fixture costs one projection at any corpus size.
    * Appends `outCol` (array<double> of length `dim`).
    */
  def clusteredFixture(df: DataFrame, idCol: String, dim: Int = 16,
      kClusters: Int = 8, outCol: String = "fvec",
      centerSeed: String = "cfx", noiseSeed: String = "cfn"): DataFrame = {
    val centers = fixtureCenters(kClusters, dim, centerSeed)
    val cent = element_at(
      typedLit(centers.map(_.toSeq).toSeq),
      (col(idCol) % kClusters).cast("int") + 1)
    val comps = (0 until dim).map { d =>
      val slice = conv(substring(md5(concat(lit(noiseSeed + ":"),
        col(idCol).cast("string"), lit(":" + d))), 1, 4), 16, 10)
      element_at(cent, d + 1) +
        (slice.cast("double") / 65536.0 - 0.5) * 0.25
    }
    df.withColumn(outCol, array(comps: _*))
  }

  /** Sylvester–Hadamard sign in closed form: H(i, j) = (−1)^popcount(i & j)
    * — row/column indices 0-based, valid for any power-of-two order. The
    * whole orthogonal matrix is a pure function of the indices, so both
    * engines materialize identical literal rows with no shared state.
    */
  def hadamardSign(i: Int, j: Int): Double =
    if (Integer.bitCount(i & j) % 2 == 0) 1.0 else -1.0

  /** OPQ-style fixed orthogonal rotation (Ge, He, Ke, Sun 2013's
    * random-rotation baseline — "Optimized Product Quantization", CVPR;
    * the learned alternating minimization is out of scope, the fixed
    * rotation is the half that changes the subspace DECOMPOSITION):
    * rot = (H/√dim) · v, with H the Sylvester–Hadamard matrix. Each
    * output dimension mixes EVERY input dimension with weight ±1/√dim,
    * so energy that straddles PQ's contiguous subspace boundaries in the
    * raw basis is re-spread — and for data that is itself a Hadamard
    * mixture of independent latents ([[latentPairFixture]]), the
    * rotation concentrates each latent back into its own dimension,
    * which is exactly when rotated PQ beats plain PQ (q165).
    *
    * Engine-exact by the house rules: for power-of-4 dims the weight
    * ±1/√dim is a dyadic rational (dim 16 → ±0.25), every product is an
    * exact double, and outputs are rounded (+1e-9 HALF_UP, 6 places)
    * before any downstream use — a SQL engine replays the literal
    * matrix term for term (the q109 projection discipline). The matrix
    * rides as `dim` literal rows inside codegen'd dot products — no
    * join, no shuffle, the rotation runs inside the scan.
    *
    * H/√dim is symmetric and orthogonal, so the rotation is its own
    * inverse (up to the output rounding) — spec-pinned.
    */
  def opqRotate(df: DataFrame, vecCol: String, dim: Int,
      outCol: String = "rotated"): DataFrame = {
    require(dim >= 1 && (dim & (dim - 1)) == 0,
      s"Hadamard rotation needs a power-of-two dim, got $dim")
    val scale = 1.0 / math.sqrt(dim.toDouble)
    val comps = (0 until dim).map { i =>
      val row = Array.tabulate(dim)(j => hadamardSign(i, j) * scale)
      round(graft.functions.dot_product(col("__vd"), lit(row)) + lit(1e-9), 6)
    }
    df.withColumn("__vd", col(vecCol).cast("array<double>"))
      .withColumn(outCol, array(comps: _*))
      .drop("__vd")
  }

  /** The fixture where a fixed rotation PROVABLY earns its keep — the
    * OPQ counterpart of [[clusteredFixture]]. Latent vector per id:
    * dim/2 independent PAIRS, each pair drawing one of 4 centers
    * (±0.5, ±0.5) from a 2-bit md5 choice (`md5("lmc:id:pair")`), plus
    * per-dimension noise uniform on [−0.125, 0.125) from a 16-bit md5
    * slice (`md5("lmn:id:d")`) — so in LATENT space every contiguous
    * 2-dim PQ subspace sees 4 clean clusters. The emitted vector is the
    * Hadamard MIXTURE fvec = (H/√dim)·latent: every latent spreads
    * across all raw dimensions, so plain contiguous-subspace PQ sees
    * near-Gaussian 4^(dim/2)-combination marginals, while
    * [[opqRotate]] (self-inverse H/√dim) recovers the latent exactly
    * and rotated PQ sees the clean per-pair clusters.
    *
    * Exactness: latent terms are dyadic rationals on a 2^-20 grid and
    * the mixture weights ±1/√dim are dyadic for power-of-4 dims, so
    * every component of fvec is an EXACT double (magnitude < 2^2 ≫
    * grid 2^-22 — 24 mantissa bits, order-independent sums) — both
    * engines hold bit-identical vectors with NO rounding anywhere in
    * the fixture, and the oracle replays it as literal per-dimension
    * expressions. Pure column math inside the scan.
    *
    * Appends `outCol` (array<double> of length `dim`).
    */
  def latentPairFixture(df: DataFrame, idCol: String, dim: Int = 16,
      outCol: String = "fvec", choiceSeed: String = "lmc",
      noiseSeed: String = "lmn"): DataFrame = {
    require(dim >= 4 && (dim & (dim - 1)) == 0 &&
      (Integer.numberOfTrailingZeros(dim) % 2 == 0),
      s"latentPairFixture needs a power-of-4 dim >= 4, got $dim")
    val lat = (0 until dim).map { d =>
      val choice = conv(substring(md5(concat(lit(choiceSeed + ":"),
        col(idCol).cast("string"), lit(":" + d / 2))), 1, 1), 16, 10)
        .cast("int") % 4
      val bit = shiftright(choice, d % 2).bitwiseAND(lit(1))
      val noise = (conv(substring(md5(concat(lit(noiseSeed + ":"),
        col(idCol).cast("string"), lit(":" + d))), 1, 4), 16, 10)
        .cast("double") / 65536.0 - 0.5) * 0.25
      when(bit === 1, lit(0.5)).otherwise(lit(-0.5)) + noise
    }
    val scale = 1.0 / math.sqrt(dim.toDouble)
    val mixed = (0 until dim).map { i =>
      val row = Array.tabulate(dim)(d => hadamardSign(i, d) * scale)
      graft.functions.dot_product(col("__lat"), lit(row))
    }
    df.withColumn("__lat", array(lat: _*))
      .withColumn(outCol, array(mixed: _*))
      .drop("__lat")
  }

  /** Per-dimension mean/stddev over the corpus, ROUNDED — the bounded
    * model state of [[standardize]] (dim rows, the same driver-state
    * shape as k-means centroids). Sample stddev; zero-variance
    * dimensions report std 0 and are passed through unscaled by
    * [[standardize]] (x − mean, not a division by zero).
    */
  def dimStats(df: DataFrame, vecCol: String): Array[(Double, Double)] = {
    val rows = df
      .select(posexplode(col(vecCol).cast("array<double>")))
      .groupBy("pos")
      .agg(round(avg("col") + lit(1e-9), 6).as("m"),
        round(stddev_samp(col("col")) + lit(1e-9), 6).as("s"))
      .orderBy("pos")
      .select("m", "s").collect()
    rows.map(r => (r.getDouble(0), r.getDouble(1)))
  }

  /** Z-score standardization against ROUNDED per-dim statistics (compute
    * them once via [[dimStats]]): z_i = round((x_i − mean_i) / std_i, 6),
    * with zero-variance dims centered but unscaled. Stats ride as
    * literal arrays — pure column math inside the scan.
    */
  /** Per-key embedding centroids in long form: (key, pos, c) with `c`
    * the ROUNDED per-dimension mean, computed in DOUBLE (the vector-math
    * house rule). Long form on purpose — downstream pairwise analytics
    * (key-similarity matrices, drift measurement between snapshots) are
    * pos-keyed joins over a |keys|·dim frame, and the rounding makes
    * every derived cosine engine-replayable (q156).
    *
    * Scale shape: one posexplode + one (key, pos) aggregation with
    * map-side partial means; the result is |keys|·dim rows — broadcast
    * material regardless of corpus size.
    */
  def centroidsByKey(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "__x")))
      .groupBy(col(keyCol), col("pos"))
      .agg(round(avg("__x") + lit(1e-9), 6).as("c"))

  def standardize(df: DataFrame, vecCol: String,
      stats: Array[(Double, Double)],
      outCol: String = "standardized"): DataFrame = {
    val means = stats.map(_._1)
    val stds = stats.map(_._2)
    val v = col(vecCol).cast("array<double>")
    val z = transform(v, (x, i) => {
      val m = element_at(lit(means), i + 1)
      val s = element_at(lit(stds), i + 1)
      round(when(s === 0.0, x - m).otherwise((x - m) / s), 6)
    })
    df.withColumn(outCol, z)
  }
}
