package graft.extensions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SparkSessionExtensions surface: injected SQL built-ins and the
  * opt-in [[AnnProbeRewrite]] (TestSpark's session is built
  * `.withExtensions(new GraftExtensions)`, the same installation a
  * `spark.sql.extensions` user gets).
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft functions are session built-ins (no registerAll call)") {
    val r = spark.sql(
      """SELECT round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c,
        |  round(l2_dist(array(0.0D, 0.0D), array(3.0D, 4.0D)), 6) AS d,
        |  round(dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)), 6) AS p,
        |  round(l2_norm(array(3.0D, 4.0D)), 6) AS n,
        |  hamming_dist(array(1, 0, 1), array(1, 1, 0)) AS h
        |""".stripMargin).as[(Double, Double, Double, Double, Int)].head()
    assert(r == ((1.0, 5.0, 11.0, 5.0, 2)))
  }

  private def indexedDb() = {
    val db = graft.core.GraftDatabase.create(spark,
      java.nio.file.Files.createTempDirectory("graft_ext").toString, "xdb")
    db.createCollection("vecs", StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType))))
    db.bulkInsert("vecs", graft.Tables.embeddings(spark, TestSpark.sf))
    db.reindex("vecs", nBits = 8)
    val q = graft.Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    (db, q)
  }

  private def bruteForce(db: graft.core.GraftDatabase, q: Array[Float]) =
    db.read("vecs")
      .select(col("vec_id"),
        graft.functions.cosine_sim(col("embedding"), lit(q)).as("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(5)

  test("autoProbe off (default): the brute-force plan is untouched") {
    val (db, q) = indexedDb()
    val p = bruteForce(db, q).queryExecution.optimizedPlan.toString
    assert(!p.contains("cluster_id IN"),
      s"no probe filter may appear without opt-in:\n${p.take(1200)}")
  }

  test("autoProbe on: exact query plans as a partition-pruned probe") {
    val (db, q) = indexedDb()
    spark.conf.set(GraftExtensions.AutoProbeKey, "true")
    try {
      // the rule fires at analysis, so the DataFrame must be built AFTER
      // the conf flips — same visibility rule as every analyzer conf
      val rewritten = bruteForce(db, q)
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters: [cluster_id"),
        s"probe filter must prune partitions at the scan:\n${physical.take(2000)}")
      // identical rows to the hand-written probe (same radius)
      val viaApi = db.searchSimilar("vecs", q, k = 5, probeRadius = 1,
          idCol = "vec_id")
        .select(col("vec_id"), round(col("score"), 9).as("score"))
        .as[(Long, Double)].collect().toSeq
      val viaRewrite = rewritten
        .select(col("vec_id"), round(col("score"), 9).as("score"))
        .as[(Long, Double)].collect().toSeq
      assert(viaRewrite == viaApi, "rewrite must equal the explicit probe")
    } finally spark.conf.set(GraftExtensions.AutoProbeKey, "false")
  }

  test("autoProbe on: non-candidates pass through (asc sort, no sidecar, no literal)") {
    val (db, q) = indexedDb()
    spark.conf.set(GraftExtensions.AutoProbeKey, "true")
    try {
      // ascending sort (worst matches): not a top-k-similar query
      val asc_ = db.read("vecs")
        .select(col("vec_id"),
          graft.functions.cosine_sim(col("embedding"), lit(q)).as("score"))
        .orderBy(col("score"), col("vec_id")).limit(5)
      assert(!asc_.queryExecution.optimizedPlan.toString.contains("cluster_id IN"))
      // no literal query vector (column vs column): cells not computable
      val colcol = db.read("vecs")
        .select(col("vec_id"),
          graft.functions.cosine_sim(col("embedding"), col("embedding")).as("score"))
        .orderBy(desc("score"), col("vec_id")).limit(5)
      assert(!colcol.queryExecution.optimizedPlan.toString.contains("cluster_id IN"))
      // plain parquet scan with no sidecar: untouched
      val plain = graft.Tables.embeddings(spark, TestSpark.sf)
        .select(col("vec_id"),
          graft.functions.cosine_sim(col("embedding"), lit(q)).as("score"))
        .orderBy(desc("score"), col("vec_id")).limit(5)
      assert(!plain.queryExecution.optimizedPlan.toString.contains("cluster_id IN"))
    } finally spark.conf.set(GraftExtensions.AutoProbeKey, "false")
  }

  test("kmeans layout: rewrite probes the nprobe nearest cells") {
    val db = graft.core.GraftDatabase.create(spark,
      java.nio.file.Files.createTempDirectory("graft_ext_km").toString, "kdb")
    db.createCollection("vecs", StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType))))
    db.bulkInsert("vecs", graft.Tables.embeddings(spark, TestSpark.sf))
    db.reindexKMeans("vecs", k = 8)
    val q = graft.Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    spark.conf.set(GraftExtensions.AutoProbeKey, "true")
    try {
      val rewritten = db.read("vecs")
        .select(col("vec_id"),
          graft.functions.cosine_sim(col("embedding"), lit(q)).as("score"))
        .orderBy(desc("score"), col("vec_id")).limit(5)
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters: [cluster_id"),
        s"kmeans probe must prune partitions:\n${physical.take(2000)}")
      val viaApi = db.searchSimilar("vecs", q, k = 5, probeRadius = 1,
          idCol = "vec_id")
        .select(col("vec_id")).as[Long].collect().toSeq
      assert(rewritten.select(col("vec_id")).as[Long].collect().toSeq == viaApi)
    } finally spark.conf.set(GraftExtensions.AutoProbeKey, "false")
  }

  test("ivfpq layout: rewrite prunes to the nprobe nearest coarse cells") {
    val db = graft.core.GraftDatabase.create(spark,
      java.nio.file.Files.createTempDirectory("graft_ext_iq").toString, "qdb")
    db.createCollection("vecs", StructType(Seq(
      StructField("id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType))))
    db.bulkInsert("vecs", graft.Tables.embeddings(spark, TestSpark.sf)
      .withColumnRenamed("vec_id", "id"))
    db.reindexIvfPq("vecs", m = 8, ksub = 16, kCells = 4)
    val q = graft.Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    spark.conf.set(GraftExtensions.AutoProbeKey, "true")
    try {
      val rewritten = db.read("vecs")
        .select(col("id"),
          graft.functions.cosine_sim(col("embedding"), lit(q)).as("score"))
        .orderBy(desc("score"), col("id")).limit(5)
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(physical.contains("PartitionFilters: [cluster_id"),
        s"ivfpq probe must prune partitions:\n${physical.take(2000)}")
      assert(rewritten.count() == 5, "rewritten probe must still answer")
    } finally spark.conf.set(GraftExtensions.AutoProbeKey, "false")
  }
}
