package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for [[graft.operators.VectorIndex.farthestPointSample]]: the
  * running-min implementation (O(k·N) distance work, one job per round)
  * against the textbook greedy that recomputes `least()` over all chosen
  * centers every round (O(k²·N) — the shape this repo shipped before).
  * Prints per-k wall clock; linear scaling shows as t(2k)/t(k) ≈ 2 for
  * the running-min and ≈ 4 for the quadratic form.
  *
  *   SPARK_GRAFT_ROWS=200000 sbt "runMain graft.FpsBench"
  */
object FpsBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "200000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dim = 64
    val e = spark.range(rows).toDF("vec_id")
      .repartition(cpus.toInt)
      .withColumn("embedding", transform(sequence(lit(1), lit(dim)),
        i => sin(col("vec_id") * i).cast("float")))
      .localCheckpoint(true)

    // the pre-round-6 quadratic formulation, kept here as the baseline
    def quadratic(k: Int): Seq[Long] = {
      val ev = e.select(col("vec_id").cast("long").as("__id"),
        col("embedding").cast("array<double>").as("__v"))
      val key = md5(concat(lit("kc:"), col("__id").cast("string")))
      val first = ev.withColumn("__key", key)
        .orderBy(col("__key"), col("__id")).limit(1)
        .select("__id", "__v").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).head
      val chosen = scala.collection.mutable.ArrayBuffer(first)
      while (chosen.length < k) {
        val ds = chosen.map { case (_, c) =>
          round(graft.functions.l2_dist(col("__v"), lit(c)), 6)
        }.toSeq
        val minD = if (ds.length == 1) ds.head else least(ds: _*)
        val next = ev.withColumn("__mind", minD)
          .orderBy(desc("__mind"), col("__id")).limit(1)
          .select("__id", "__v").collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).head
        chosen += next
      }
      chosen.map(_._1).toSeq
    }

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (k <- Seq(16, 32, 64)) {
      val (idsA, tA) = time(graft.operators.VectorIndex
        .farthestPointSample(e, "vec_id", "embedding", k).map(_._1))
      val (idsB, tB) = time(quadratic(k))
      require(idsA == idsB, s"selection diverged at k=$k")
      println(f"k=$k%3d  running-min ${tA}%7.2fs   quadratic ${tB}%7.2fs   speedup ${tB / tA}%5.2fx")
    }
    spark.stop()
  }
}
