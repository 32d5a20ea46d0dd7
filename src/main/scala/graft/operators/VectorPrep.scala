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
