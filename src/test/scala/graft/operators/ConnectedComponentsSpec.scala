package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("components resolve to the min reachable id, including chains") {
    // two components: {1,2,3,9} connected as a chain 9-3, 3-2, 2-1
    // (forces >1 propagation round), and {5,6}
    val pairs = Seq((3L, 9L), (2L, 3L), (1L, 2L), (5L, 6L))
      .toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("frees every superseded checkpoint: only the result frame stays persisted") {
    // leak contract (round-3): the loop checkpoints per round, so every
    // superseded labels frame AND the edge frame must be freed before
    // return — a long-lived driver calling this repeatedly must not
    // accumulate block-manager storage. Sweep first so the count is ours.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val pairs = Seq((3L, 9L), (2L, 3L), (1L, 2L), (5L, 6L), (10L, 11L))
      .toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(pairs)
    assert(cc.count() == 8)
    val persisted = spark.sparkContext.getPersistentRDDs
    // exactly one persisted RDD: the returned (still-consumable) frame
    assert(persisted.size == 1,
      s"leaked checkpoint blocks: ${persisted.values.map(_.name).toList}")
    persisted.values.foreach(_.unpersist(true))
  }

  test("leakage-safe split: every component member lands on the same side") {
    // q91's contract: the split key is the cluster representative, so a
    // near-dup cluster can never straddle train/eval. Verified on real
    // candidates: group the per-doc split by component and assert each
    // component sees exactly one split value.
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
    val comps = Dedup.connectedComponents(pairs).withColumnRenamed("id", "doc_id")
    val rep = coalesce(col("cluster_rep"), col("doc_id"))
    val bucket = conv(substring(md5(concat(lit("split:"),
      rep.cast("string"))), 1, 4), 16, 10).cast("long") % 10
    val straddlers = docs.join(comps, Seq("doc_id"), "left")
      .withColumn("__rep", rep)
      .withColumn("split",
        when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test"))
      .groupBy("__rep").agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(straddlers.isEmpty, "a cluster straddles the split boundary")
  }

  test("isolated pairs and self-consistency on real candidates") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
    val cc = Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    // every representative is itself a member mapped to itself
    val reps = cc.map(_._2).toSet
    val selfMapped = cc.filter { case (id, rep) => id == rep }.map(_._1).toSet
    assert(reps.subsetOf(selfMapped))
    // representatives are minimal in their cluster
    cc.foreach { case (id, rep) => assert(rep <= id) }
  }
}
