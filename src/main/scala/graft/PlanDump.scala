package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: print a query's formatted physical plan (after an execution,
  * so AQE's final plan is shown). Usage:
  * `sbt "runMain graft.PlanDump q03_join_revenue /root/testdata/sf0.1"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    // println goes to stdout; sbt prefixes [info] — grep for PLANDUMP
    println("PLANDUMP-BEGIN")
    println(df.queryExecution.executedPlan.toString)
    println("PLANDUMP-END")
    spark.stop()
  }
}
