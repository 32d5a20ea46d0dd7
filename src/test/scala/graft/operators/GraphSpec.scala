package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // replay pageRank's per-round arithmetic (same IEEE ops, same rounding)
  private def replay(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val sym = edges ++ edges.map(_.swap)
    val deg = sym.groupBy(_._1).view.mapValues(_.size).toMap
    val n = deg.size
    var r = deg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = sym.groupBy(_._2)
      r = deg.keys.map { v =>
        val s = in(v).map { case (u, _) => r(u) / deg(u) }.sum
        v -> BigDecimal((1.0 - 0.85) / n + 0.85 * s + 1e-15)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = 5) =
    Graph.pageRank(edges.toDF("a_id", "b_id"), iters = iters)
      .as[(Long, Long, Double)].collect()
      .map { case (id, d, r) => id -> (d, r) }.toMap

  test("star graph: the center out-ranks every leaf, ranks sum to ~1") {
    val edges = (2L to 6L).map(l => (1L, l))
    val got = run(edges)
    assert(got(1L)._1 == 5L && got(2L)._1 == 1L)
    val center = got(1L)._2
    (2L to 6L).foreach(l => assert(center > got(l)._2,
      s"center must out-rank leaf $l"))
    val total = got.values.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-9,
      s"undirected PageRank mass must be conserved, got $total")
  }

  test("path graph matches an independent per-round replay") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val want = replay(edges, 5)
    val got = run(edges)
    want.foreach { case (id, r) =>
      assert(got(id)._2 == r, s"node $id: got ${got(id)._2}, want $r")
    }
    // symmetry: the path's mirror-image nodes tie exactly
    assert(got(1L)._2 == got(4L)._2 && got(2L)._2 == got(3L)._2)
  }

  // replay personalizedPageRank's per-round arithmetic
  private def replayPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Double] = {
    val sym = edges ++ edges.map(_.swap)
    val deg = sym.groupBy(_._1).view.mapValues(_.size).toMap
    val in = sym.groupBy(_._2)
    val sv = deg.keys.map(v =>
      v -> (if (seeds(v)) 1.0 / seeds.count(deg.contains) else 0.0)).toMap
    var r = sv
    for (_ <- 1 to iters) {
      r = deg.keys.map { v =>
        val cs = in(v).map { case (u, _) => r(u) / deg(u) }.sum
        v -> BigDecimal((1.0 - 0.85) * sv(v) + 0.85 * cs + 1e-15)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    r
  }

  test("personalizedPageRank: seed-proximity decay, replay match, loud guard") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val got = Graph.personalizedPageRank(edges.toDF("a_id", "b_id"),
        Seq(Tuple1(1L)).toDF("id"))
      .as[(Long, Long, Boolean, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val want = replayPpr(edges, Set(1L), 5)
    want.foreach { case (id, r) =>
      assert(got(id)._3 == r, s"node $id: got ${got(id)._3}, want $r") }
    assert(got(1L)._2 && !got(2L)._2)
    // after 5 rounds the seed's sole neighbor has absorbed the most
    // mass (a path oscillates under power iteration — no monotone
    // decay), and the far end trails the seed side
    assert(got(2L)._3 == got.values.map(_._3).max, s"got $got")
    assert(got(1L)._3 + got(2L)._3 > got(3L)._3 + got(4L)._3, s"got $got")
    // a seed set with no graph node is loud
    val e = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges.toDF("a_id", "b_id"),
        Seq(Tuple1(99L)).toDF("id"))
    }
    assert(e.getMessage.contains("no seed"))
  }

  // replay hits' per-round arithmetic: only the two sums round
  // (+1e-15, 12); max-normalization and the final (+1e-15, 10) are
  // plain IEEE ops on the already-identical values
  private def replayHits(edges: Seq[(Long, Long)],
      iters: Int): Map[Long, (Double, Double)] = {
    def rnd(x: Double, s: Int) =
      BigDecimal(x + 1e-15).setScale(s, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val in = edges.groupBy(_._2)
    val out = edges.groupBy(_._1)
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to iters) {
      val ar = in.map { case (v, es) =>
        v -> rnd(es.map { case (u, _) => hub.getOrElse(u, 0.0) }.sum, 12) }
      val am = ar.values.max
      auth = ar.view.mapValues(_ / am).toMap
      val hr = out.map { case (u, es) =>
        u -> rnd(es.map { case (_, v) => auth.getOrElse(v, 0.0) }.sum, 12) }
      val hm = hr.values.max
      hub = hr.view.mapValues(_ / hm).toMap
    }
    nodes.map(v => v -> (rnd(auth.getOrElse(v, 0.0), 10),
      rnd(hub.getOrElse(v, 0.0), 10))).toMap
  }

  test("hits: directed star, replay match, sink/source scores, empty") {
    // 2,3,4 all point at 1; 1 points back at 2; 5→4 adds a second-tier
    // authority. Asymmetric on purpose — hubs and authorities differ.
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (5L, 4L))
    val got = Graph.hits(edges.toDF("src_id", "dst_id"))
      .as[(Long, Double, Double)].collect()
      .map { case (id, a, h) => id -> (a, h) }.toMap
    val want = replayHits(edges, 4)
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (a, h)) =>
      assert(got(id) == ((a, h)), s"node $id: got ${got(id)}, want ($a, $h)") }
    // node 1 collects three hubs — the max-normalized authority is 1.0
    assert(got(1L)._1 == 1.0)
    // 3 and 5 have no in-edges: auth exactly 0; 2 and 3 point at the top
    // authority, so they out-hub 5 (whose target is second-tier)
    assert(got(3L)._1 == 0.0 && got(5L)._1 == 0.0)
    assert(got(2L)._2 > got(5L)._2 && got(3L)._2 > got(5L)._2)
    assert(Graph.hits(Seq.empty[(Long, Long)].toDF("src_id", "dst_id"))
      .isEmpty)
  }

  test("adamicAdar: common-neighbor scoring, adjacency anti-join, cap") {
    // square 2-3-4 plus diagonal (2,3): the only distance-2 non-edge is
    // (1,4), seen through both center 2 (deg 3) and center 3 (deg 3)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a_id", "b_id")
    val got = Graph.adamicAdar(pairs)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 1)
    val v = 1.0 / math.log(3.0)
    val want = BigDecimal(v + v + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head == ((1L, 4L, 2L, want)), s"got ${got.head}")
    // hot-center cap: with maxCenterDeg = 2 both wedge centers are
    // skipped and nothing is predicted
    assert(Graph.adamicAdar(pairs, maxCenterDeg = 2).isEmpty)
    // adjacent pairs never appear even when they share neighbors:
    // (2,3) shares 1 and 4 but is an existing edge
    assert(!got.exists(r => r._1 == 2L && r._2 == 3L))
  }

  test("label propagation: spread, clamping, tie-break, unreached nodes") {
    // component A: path 1-2-3 with seed 1='en' (3 is reached in round 2);
    // component B: 10-11 with no seeds (stays 'none');
    // component C: 20-21-22 where 21 is seeded 'de' and 20 is seeded 'fr' —
    // 22's neighbors give it 'de'; 20 must STAY 'fr' (clamped) even though
    // its only neighbor says 'de'
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a_id", "b_id")
    val seeds = Seq((1L, "en"), (21L, "de"), (20L, "fr"), (99L, "xx"))
      .toDF("id", "label") // 99 is not in the graph → ignored
    val got = Graph.labelPropagation(edges, seeds)
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> ("en", "seed"), 2L -> ("en", "prop"), 3L -> ("en", "prop"),
      10L -> ("none", "none"), 11L -> ("none", "none"),
      20L -> ("fr", "seed"), 21L -> ("de", "seed"), 22L -> ("de", "prop")))
    assert(!got.contains(99L), "a seed outside the graph spreads nowhere")
    // tie-break: node 2 with equal-count neighbors 'aa' and 'zz' takes the
    // GREATEST label (the max-struct rule)
    val tri = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val ts = Seq((1L, "aa"), (3L, "zz")).toDF("id", "label")
    val tie = Graph.labelPropagation(tri, ts, iters = 1)
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(tie(2L) == "zz", "equal votes must resolve to the greatest label")
  }

  private def triRun(edges: Seq[(Long, Long)]) =
    Graph.triangleStats(edges.toDF("a_id", "b_id"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("triangles: clique, pendant, star, shared-corner counts") {
    // triangle {1,2,3} with pendant 4 on node 3
    val g1 = triRun(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert(g1 == Map(
      1L -> (2L, 1L, 1.0), 2L -> (2L, 1L, 1.0),
      3L -> (3L, 1L, 1.0 / 3), 4L -> (1L, 0L, 0.0)))
    // K4: every node in 3 triangles, lcc 1
    val k4 = triRun(for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
    assert(k4.values.forall(_ == (3L, 3L, 1.0)))
    // star: hub of any degree closes nothing
    val star = triRun((2L to 6L).map(l => (1L, l)))
    assert(star(1L) == (5L, 0L, 0.0) && star(2L) == (1L, 0L, 0.0))
    // two triangles sharing node 3: it participates in both
    val shared = triRun(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (3L, 5L), (4L, 5L)))
    assert(shared(3L) == (4L, 2L, 2.0 * 2 / (4 * 3)))
    assert(shared(1L)._2 == 1L && shared(4L)._2 == 1L)
  }

  test("triangles: duplicate pair rows collapse; determinism") {
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val dup = triRun(base ++ base)
    assert(dup.values.forall(_ == (2L, 1L, 1.0)),
      "duplicated edges must not double-count")
    assert(triRun(base).toSeq.sortBy(_._1) sameElements
      triRun(base).toSeq.sortBy(_._1))
  }

  test("deterministic across runs; parameters validated loudly") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(run(edges).toSeq.sortBy(_._1) sameElements
      run(edges).toSeq.sortBy(_._1))
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges.toDF("a_id", "b_id"), iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges.toDF("a_id", "b_id"), damping = 1.0)
    }
  }

  test("kCore: peeling cascade, core degrees, empty core, loud cap") {
    // triangle {1,2,3} + a pendant chain 3-4-5-6: the 2-core is exactly
    // the triangle, and the chain peels ONE node per round (6, then 5,
    // then 4) — the cascade that makes fixpoint detection necessary
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val core2 = Graph.kCore(g.toDF("a_id", "b_id"), k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      "2-core must be the triangle with in-core degrees, chain peeled away")
    // k=1 keeps everything (every listed node has >= 1 edge)
    val core1 = Graph.kCore(g.toDF("a_id", "b_id"), k = 1)
      .as[(Long, Long)].collect().toMap
    assert(core1.keySet == (1L to 6L).toSet)
    assert(core1(4L) == 2L && core1(6L) == 1L)
    // no 3-core exists: the result is empty, not an error
    assert(Graph.kCore(g.toDF("a_id", "b_id"), k = 3).isEmpty)
    // core degree counts INSIDE the core: node 3 has raw degree 3 but
    // core degree 2 (the edge to peeled 4 is gone)
    assert(core2(3L) == 2L)
    // the cap fails LOUD mid-cascade instead of returning a non-core
    val e = intercept[IllegalArgumentException] {
      Graph.kCore(g.toDF("a_id", "b_id"), k = 2, maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    // determinism across runs
    assert(Graph.kCore(g.toDF("a_id", "b_id"), k = 2)
      .as[(Long, Long)].collect().toMap == core2)
    intercept[IllegalArgumentException] {
      Graph.kCore(g.toDF("a_id", "b_id"), k = 0)
    }
  }
}
