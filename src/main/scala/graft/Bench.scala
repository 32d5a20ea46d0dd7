package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs the headline queries (SparkEntry.benchQueries)
  * on SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * `collect()` (not `count()`) forces full result materialization so
  * Catalyst can't optimize away the measured work; headline queries all
  * produce small outputs, so the collect itself is noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Steady-state measurement: one untimed warmup pass (JIT, codegen
    // compilation, parquet footer caches), then the timed pass.
    SparkEntry.benchQueries.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).collect()
      catch { case _: Throwable => }
    }
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).collect() } catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
