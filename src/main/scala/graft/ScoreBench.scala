package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component benchmark for SEARCHSIMILAR's scoring hot path (SURVEY §7 M4:
  * "measure cosine UDF vs higher-order-function vs custom Expression").
  * Scores every embedding against a broadcast query vector N times with
  * each implementation and prints per-impl seconds.
  */
object ScoreBench {
  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "200").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // synthesize a corpus large enough that per-row scoring dominates job
    // overhead (the sf tables are too small to separate the impls)
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "2000000").toLong
    val dim = 64
    val e = spark.range(rows).toDF("vec_id")
      .repartition(cpus.toInt)
      .select($"vec_id", transform(
        sequence(lit(0), lit(dim - 1)),
        j => ((pmod($"vec_id" * 2654435761L + j * 40503L, lit(2000)) - 1000L)
          / 1000.0).cast("float")).as("embedding"))
      .cache()
    e.count()
    val q = e.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).toArray

    // (a) graft codegen'd Catalyst expression
    def viaExpression() = e.select(
      sum(graft.functions.cosine_sim($"embedding", lit(q)))).head().getDouble(0)

    // (b) built-in higher-order functions (interpreted lambda per element)
    def viaHof() = {
      val qc = lit(q)
      val dot = aggregate(zip_with($"embedding", qc, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
      val na = aggregate($"embedding", lit(0.0), (acc, x) => acc + x * x)
      val nb = aggregate(qc, lit(0.0), (acc, x) => acc + x * x)
      e.select(sum(dot / (sqrt(na) * sqrt(nb)))).head().getDouble(0)
    }

    // (c) Scala UDF (boxed Seq[Float] per row)
    val cosUdf = udf { (v: Seq[Float]) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < v.length) {
        val x = v(i).toDouble; val y = q(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def viaUdf() = e.select(sum(cosUdf($"embedding"))).head().getDouble(0)

    def time(name: String)(f: => Double): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      var sink = 0.0
      (1 to reps).foreach(_ => sink += f)
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($reps reps, checksum ${sink / reps}%.6f)")
    }

    println(s"[score-bench] rows=${e.count()}, dim=${q.length}, reps=$reps")
    time("catalyst_expression")(viaExpression())
    time("higher_order_funcs")(viaHof())
    time("scala_udf")(viaUdf())
    spark.stop()
  }
}
