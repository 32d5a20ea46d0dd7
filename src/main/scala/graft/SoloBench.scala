package graft

import org.apache.spark.sql.SparkSession

/** Standalone single-query timing — the house adjudication method's first
  * step (round-9 doctrine): when a query's time rises inside the
  * interleaved Bench set, re-run its core ALONE in a fresh session to
  * separate genuine cost from cross-query heap/codegen pressure, before
  * blaming code or data. One warmup, then min over reps, GC seconds
  * inside the min rep reported beside the time.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.SoloBench q145_nb_classify [reps]"
  */
object SoloBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SoloBench <queryName> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).collect() // warmup: JIT + codegen + parquet footers
    var best = Double.MaxValue
    var gcAtBest = 0.0
    for (_ <- 0 until reps) {
      val g0 = gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) { best = dt; gcAtBest = (gc() - g0) / 1e3 }
    }
    val heap = Runtime.getRuntime.maxMemory / 1024.0 / 1024.0 / 1024.0
    println(f"[solobench] $name sf=$sfDir heap=${heap}%.0fg " +
      f"min=$best%.3f s gc_in_min=$gcAtBest%.3f s reps=$reps")
    spark.stop()
  }

  private def gc(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }
}
