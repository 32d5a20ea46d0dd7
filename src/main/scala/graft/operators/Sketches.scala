package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sketches. Spark's own sketch aggregates
  * (`approx_count_distinct`, `bloom_filter_agg`) hash with
  * engine-internal functions, so their bytes can't be recomputed by
  * another engine — fine for diagnostics, useless for an exactness gate.
  * These sketches hash with md5 slices (the house convention), so every
  * cell of the sketch is engine-recomputable and the gate can hash-match
  * the SKETCH ITSELF, not just sanity-check its answers.
  *
  * Count-min (Cormode & Muthukrishnan 2005): `depth` hash rows ×
  * `width` buckets of counts; point estimate = min over rows of the
  * token's bucket count. Always an OVERestimate (collisions only add),
  * exact when a token collides in no row — the property the spec pins.
  *
  * Scale shape: the sketch build is one explode (`depth` rows per
  * token) into a partial-agg count whose result is AT MOST depth×width
  * rows regardless of corpus size — the whole point of a sketch; the
  * estimate side broadcasts that bounded table. Width must divide 65536
  * (16-bit md5 slice, no modulo bias — the [[TrainExport.withShard]]
  * rule).
  */
object Sketches {

  /** Hash-row bucket of a token: 16-bit slice of md5("seed" + r + ":" +
    * token) mod `width`.
    */
  def cmsBucket(token: Column, r: Column, width: Int,
      seed: String = "cms"): Column =
    conv(substring(md5(concat(lit(seed), r.cast("string"), lit(":"), token)),
      1, 4), 16, 10).cast("long") % width

  private def checkParams(depth: Int, width: Int): Unit = {
    require(depth >= 1, s"depth must be positive, got $depth")
    require(width >= 2 && 65536 % width == 0,
      s"width must be >= 2 and divide 65536, got $width")
  }

  /** Build the count-min table from a token column: one row per
    * (hash row, bucket) with its collision-summed count — ≤ depth×width
    * rows total.
    */
  def countMinTable(toks: DataFrame, tokenCol: String, depth: Int,
      width: Int, seed: String = "cms"): DataFrame = {
    checkParams(depth, width)
    toks.select(col(tokenCol).as("__t"))
      .withColumn("r", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("bucket", cmsBucket(col("__t"), col("r"), width, seed))
      .groupBy("r", "bucket")
      .agg(count(lit(1)).as("c"))
  }

  /** Bloom position `i` of a key: 16-bit slice of md5("seed" + i + ":" +
    * key) mod the bit count — same derivation family as [[cmsBucket]], so
    * any engine recomputes the filter bit-for-bit.
    */
  def bloomPos(key: Column, i: Column, m: Int,
      seed: String = "bloom"): Column =
    conv(substring(md5(concat(lit(seed), i.cast("string"), lit(":"), key)),
      1, 4), 16, 10).cast("long") % m

  /** Build a Bloom filter over a (bounded) key set: `m` bits, `k` md5
    * hash positions per key. Returned as a driver-side bit array — the
    * broadcast-model-state shape ([[VectorIndex]] centroids' doctrine);
    * m/8 bytes ride into every task as a plan literal. No false
    * negatives ever; false-positive rate ≈ (1 − e^(−kn/m))^k.
    */
  def bloomBuild(keys: DataFrame, keyCol: String, m: Int, k: Int,
      seed: String = "bloom"): Array[Boolean] = {
    require(m >= 2 && 65536 % m == 0,
      s"m must be >= 2 and divide 65536, got $m")
    require(k >= 1, s"k must be positive, got $k")
    val bits = Array.fill(m)(false)
    keys.select(col(keyCol).as("__k")).distinct()
      .withColumn("__i", explode(sequence(lit(0L), lit(k - 1L))))
      .select(bloomPos(col("__k"), col("__i"), m, seed).as("__p"))
      .distinct().collect()
      .foreach(r => bits(r.getLong(0).toInt) = true)
    bits
  }

  /** Membership test as a pure column expression over the literal bit
    * array: true iff ALL k positions are set. Codegen'd array lookups —
    * runs inside the scan, which is the whole point: a 99%-selective
    * pre-filter before an expensive join.
    */
  def bloomMightContain(key: Column, bits: Array[Boolean], k: Int,
      seed: String = "bloom"): Column = {
    require(k >= 1, s"k must be positive, got $k")
    val m = bits.length
    (0 until k)
      .map(i => element_at(lit(bits),
        (bloomPos(key, lit(i.toLong), m, seed) + 1).cast("int")))
      .reduce(_ && _)
  }

  /** Point estimates for a (small) candidate token set against a built
    * table: min over hash rows of the bucket count. The bounded table
    * broadcasts; candidates never shuffle. Tokens whose buckets are
    * absent from the table estimate 0 (they were never inserted).
    */
  def cmsEstimate(table: DataFrame, candidates: DataFrame,
      tokenCol: String, depth: Int, width: Int,
      seed: String = "cms"): DataFrame = {
    checkParams(depth, width)
    candidates.select(col(tokenCol)).distinct()
      .withColumn("r", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("bucket", cmsBucket(col(tokenCol), col("r"), width, seed))
      .join(broadcast(table), Seq("r", "bucket"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("n_cms"))
  }

  /** 48-bit md5 hash of a value — the KMV key space. 48 bits keeps every
    * hash (and every product in the estimator) under 2^53, so the
    * arithmetic is EXACT in double on every engine; the loss vs 64 bits
    * only nudges the estimate via extra collisions (≈n²/2^49 expected),
    * identically on both sides of the gate.
    */
  def kmvHash(value: Column, seed: String = "kmv"): Column =
    conv(substring(md5(concat(lit(seed + ":"), value)), 1, 12), 16, 10)
      .cast("long")

  /** KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002) per
    * group — the vocabulary-size diagnostic beside [[countMinTable]]'s
    * frequencies: with the k smallest of n uniform 48-bit hashes, the
    * k-th smallest H_k estimates n ≈ (k−1)·2^48 / H_k (stderr ≈
    * 1/√(k−2)). Unlike `approx_count_distinct`'s HLL bytes, every number
    * here is an md5 slice any engine recomputes — the sketch itself is
    * hash-gateable.
    *
    * Scale shape: ONE shuffle dedups (group, hash) with map-side partial
    * dedup; the bottom-k runs in [[TopKAggregator]]'s bounded heap — ≤ k
    * rows per partition per group cross the second (group-keyed) shuffle,
    * never a per-group sort window (the q101 de-skew doctrine: a dominant
    * group must not serialize through one reducer). Driver state: nothing;
    * output: one row per group.
    *
    * Output: (`groupCol`, n_sketch, kth, est_distinct) — `n_sketch` < k
    * means the group's distinct count IS n_sketch (the sketch saw
    * everything) and `kth` is null; est is then exact by construction.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64, seed: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(col(groupCol).cast("string").as("__g"),
        kmvHash(col(valueCol), seed).as("__h"))
      .distinct()
    val topk = new TopKAggregator(k).toColumn
    hashed.as[(String, Long)]
      .groupByKey(_._1)
      // heap keeps the k LARGEST scores; score = −h (exact: |h| < 2^53)
      // selects the k smallest hashes
      .mapValues(t => (t._2, -t._2.toDouble))
      .agg(topk)
      .toDF("__g", "__bk")
      .select(col("__g").as(groupCol),
        size(col("__bk")).cast("long").as("n_sketch"),
        // try_: a group with fewer than k distinct hashes has no k-th
        try_element_at(col("__bk"), lit(k)).getField("_1").as("kth"))
      .withColumn("est_distinct",
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0) /
            col("kth").cast("double")))
  }

  /** The bottom-k sketch itself as a sorted ARRAY per group — the
    * mergeable form [[kmvSetOps]] combines ([[kmvDistinct]] reports the
    * scalar estimate; this keeps the hashes). Ascending by hash: the
    * heap keeps the k largest of score = −h, emitted largest-score
    * first = smallest hash first.
    */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64, seed: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(col(groupCol).cast("string").as("__g"),
        kmvHash(col(valueCol), seed).as("__h"))
      .distinct()
    val topk = new TopKAggregator(k).toColumn
    hashed.as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, -t._2.toDouble))
      .agg(topk)
      .toDF("__g", "__bk")
      .select(col("__g").as(groupCol),
        transform(col("__bk"), s => s.getField("_1")).as("sketch"))
  }

  /** KMV set operations (Beyer et al. 2007, "On Synopses for
    * Distinct-Value Estimation Under Multiset Operations" — the
    * theta-sketch idea): estimate |A ∪ B|, Jaccard, and |A ∩ B| for
    * every PAIR of groups from their bottom-k sketches alone, never
    * re-reading the data. The k smallest hashes of A ∪ B all live in
    * A's or B's own bottom-k, so the merged bottom-k is exact; ρ = how
    * many of those combined bottom-k' hashes appear in BOTH sketches
    * estimates Jaccard as ρ/k', and |A ∩ B| ≈ (ρ/k')·|A ∪ B|. When the
    * merged set has fewer than k hashes, both sketches were complete
    * and every output is EXACT by construction.
    *
    * Every number is md5-derived and the per-pair math is HOFs over
    * ≤ k-element arrays — any engine replays it bit-for-bit: single
    * exact-integer divisions and one product of exactly-representable
    * doubles (48-bit hashes keep all arithmetic under 2^53).
    *
    * Scale shape: the corpus is touched ONCE (the sketch build — the
    * kmvDistinct dedup + bounded-heap shape); pairing joins the
    * group-catalog-sized sketch frame against itself (|groups|² pairs
    * of k-long arrays — sketch-sized, nothing data-sized).
    *
    * Output per pair (a < b): `(a_<group>, b_<group>, kp, rho,
    * est_union, est_jaccard, est_intersection)`.
    */
  def kmvSetOps(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64, seed: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val sk = kmvSketch(df, groupCol, valueCol, k, seed)
    val aG = s"a_$groupCol"
    val bG = s"b_$groupCol"
    val left = sk.select(col(groupCol).as(aG), col("sketch").as("__ask"))
    val right = sk.select(col(groupCol).as(bG), col("sketch").as("__bsk"))
    left.join(right, col(aG) < col(bG))
      .withColumn("__mall",
        array_sort(array_union(col("__ask"), col("__bsk"))))
      .withColumn("__mk", slice(col("__mall"), 1, k))
      .withColumn("kp", size(col("__mk")).cast("long"))
      .withColumn("rho", size(filter(col("__mk"),
        h => array_contains(col("__ask"), h) &&
          array_contains(col("__bsk"), h))).cast("long"))
      .withColumn("est_union",
        when(size(col("__mall")) < k, size(col("__mall")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0) /
            element_at(col("__mk"), k).cast("double")))
      .withColumn("est_jaccard", col("rho").cast("double") / col("kp"))
      .withColumn("est_intersection",
        col("est_jaccard") * col("est_union"))
      .select(col(aG), col(bG), col("kp"), col("rho"),
        col("est_union"), col("est_jaccard"), col("est_intersection"))
  }

  /** HyperLogLog registers (Flajolet, Fusy, Gandouet, Meunier 2007) with
    * md5-derived hashing — the register-based sibling of [[kmvDistinct]]
    * (Spark's own `approx_count_distinct` IS HLL++, but its bytes hash
    * with engine internals and stay rows-only-gateable; these registers
    * are engine-recomputable cell for cell). Fixed m = 64 buckets:
    * bucket = first 8 md5 bits mod 64 (256 mod 64 = 0 — unbiased), rank
    * = leading-zero count of the next 16 bits + 1 (17 when zero),
    * computed by a CASE ladder of exact integer compares — NEVER
    * `floor(log2(v))`: float log at power-of-two boundaries must not
    * decide an integer (the pow/keep-count doctrine). Register value =
    * max rank per (group, bucket).
    *
    * Scale shape: one map-side-combinable aggregation whose result is
    * ≤ |groups|·64 rows regardless of corpus size — the sketch property.
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      seed: String = "hll"): DataFrame = {
    val h = md5(concat(lit(seed + ":"), col(valueCol).cast("string")))
    val bucket = conv(substring(h, 1, 2), 16, 10).cast("int") % 64
    val v = conv(substring(h, 3, 4), 16, 10).cast("int")
    // built inside-out so the HIGHEST threshold ends outermost:
    // when(v >= 2^15, 1).when(v >= 2^14, 2)...otherwise(17)
    val rank = (16 to 1 by -1).foldLeft(lit(17): Column) { (acc, i) =>
      when(v >= (1 << (16 - i)), i).otherwise(acc)
    }
    df.select(col(groupCol), bucket.as("bucket"), rank.as("r"))
      .groupBy(groupCol, "bucket").agg(max("r").as("r"))
  }

  /** Mergeable sample-quantile sketch — the quantile member of the sketch
    * family (CMS counts, bloom membership, KMV/HLL distinct): a bottom-k
    * BY HASH uniform row sample per group, then type-1 (lower) quantiles
    * of the sample. Keeping the `sampleSize` smallest md5 hashes of the
    * group's row keys is a uniform without-replacement sample that MERGES
    * by union + re-bottom-k — the same mergeability argument as KMV, so
    * partial samples combine across partitions, shards, or days without
    * re-reading data. Every selected number is an md5 slice or an actual
    * data value, so the sketch is engine-recomputable cell for cell
    * (unlike `approx_percentile`'s internal KLL bytes).
    *
    * Quantile rule: index = ((n − 1) · q) div 100 into the sample sorted
    * by (value, key) — exact integer math (the keep-count doctrine: no
    * float multiply deciding an integer index), a total order (key breaks
    * value ties), and the OUTPUT IS AN INPUT VALUE — no interpolation, no
    * accumulation, nothing to round.
    *
    * Scale shape: the sample side is [[TopKAggregator]]'s bounded heap
    * (≤ sampleSize rows per partition per group cross the shuffle — never
    * a per-group sort of the corpus), values join back over the
    * BROADCAST sample-key table, and the quantile window runs on
    * ≤ |groups|·sampleSize rows. The exact side (the `xp*` diagnostic
    * columns, the q143 `n_exact` convention) DOES sort each full group —
    * that is the cost the sketch exists to avoid; pass
    * `exactDiagnostic = false` for the production shape (heap +
    * broadcast only, no full-group sort in the plan).
    *
    * Output: (`groupCol`, n_rows, n_sample, sp{q}… sample quantiles,
    * xp{q}… exact quantiles); without the diagnostic, (`groupCol`,
    * n_sample, sp{q}…). A group with ≤ sampleSize rows samples itself
    * entirely, so sp ≡ xp there (spec-pinned).
    */
  def sampleQuantiles(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String, sampleSize: Int = 128,
      qs: Seq[Int] = Seq(25, 50, 75, 90),
      seed: String = "sq", exactDiagnostic: Boolean = true): DataFrame = {
    require(sampleSize >= 1, s"sampleSize must be >= 1, got $sampleSize")
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 100),
      s"quantiles must be percentages in [0, 100], got $qs")
    val integral = df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.LongType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // the embeddingPairs rule: a silent long cast of a string key would
    // sample nothing / join back nothing — refuse loudly instead
    require(integral,
      s"keyCol '$keyCol' must be an integral unique row key")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val base = df.select(col(groupCol).cast("string").as("__g"),
      col(keyCol).cast("long").as("__k"),
      col(valueCol).cast("double").as("__v"))
    val hashed = base.select(col("__g"), col("__k"),
      kmvHash(col("__k").cast("string"), seed).as("__h"))
    val topk = new TopKAggregator(sampleSize).toColumn
    // heap keeps the k LARGEST scores; score = −h (exact: |h| < 2^53)
    // selects the k smallest hashes; h-ties keep the smaller key — the
    // oracle's ORDER BY h, k
    val picked = hashed.as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, -t._3.toDouble))
      .agg(topk)
      .toDF("__g", "__bk")
      .select(col("__g"), explode(col("__bk")).as("__e"))
      .select(col("__g"), col("__e").getField("_1").as("__k"))

    def quantiles(src: DataFrame, prefix: String): DataFrame = {
      val rn = src
        .withColumn("__rn", row_number().over(
          Window.partitionBy("__g").orderBy("__v", "__k")))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy("__g")))
      val aggs = qs.map { q =>
        max(when(col("__rn") ===
            lit(1) + expr(s"((__n - 1) * $q) div 100"), col("__v")))
          .as(s"$prefix$q")
      } :+ count(lit(1)).as(s"__n_$prefix")
      rn.groupBy("__g").agg(aggs.head, aggs.tail: _*)
    }

    val sp = quantiles(base.join(broadcast(picked), Seq("__g", "__k")), "sp")
    if (!exactDiagnostic)
      // production shape: heap + broadcast only — no full-group sort
      // anywhere in the plan (q182's PlanAudit pins it)
      sp.select(Seq(col("__g").as(groupCol),
        col("__n_sp").as("n_sample")) ++ qs.map(q => col(s"sp$q")): _*)
    else {
      val xp = quantiles(base, "xp")
      sp.join(xp, Seq("__g"))
        .select(Seq(col("__g").as(groupCol),
          col("__n_xp").as("n_rows"), col("__n_sp").as("n_sample")) ++
          qs.map(q => col(s"sp$q")) ++ qs.map(q => col(s"xp$q")): _*)
    }
  }

  /** The HLL estimate from a [[hllRegisters]] table: harmonic mean of
    * 2^(−M_j) over all 64 registers (absent buckets contribute 2^0 = 1),
    * α_64 = 0.709, with the paper's small-range linear-counting branch
    * (E_raw ≤ 2.5m and empty buckets exist → m·ln(m/V)). Engine-exact:
    * 2^(−r) rides as a literal array of exact dyadic doubles (never
    * `pow`), the harmonic sum is exact (≤ 64 terms on a 2^-17 grid), the
    * branch decision compares identically-computed doubles, and the only
    * transcendental (`ln`) follows the house ln-parity rule — rounded
    * (+1e-9, 4) on both sides. Output: (`groupCol`, n_hll).
    */
  def hllEstimate(registers: DataFrame, groupCol: String): DataFrame = {
    val m = 64
    val inv = Array.tabulate(18)(r => 1.0 / (1L << r))
    registers
      .groupBy(groupCol)
      .agg(sum(element_at(lit(inv), col("r") + 1)).as("__s0"),
        count(lit(1)).as("__nb"))
      .select(col(groupCol), {
        val s = col("__s0") + (lit(m) - col("__nb")).cast("double")
        val v0 = lit(m) - col("__nb")
        val eRaw = lit(0.709) * lit(4096.0) / s
        val est = when(eRaw <= 160.0 && v0 > 0,
          lit(64.0) * log(lit(64.0) / v0.cast("double"))).otherwise(eRaw)
        round(est + lit(1e-9), 4).as("n_hll")
      })
  }

  /** EXACT heavy hitters through a Misra–Gries candidate pass (Misra &
    * Gries 1982; mergeability per Agarwal et al. 2013): all values with
    * frequency STRICTLY above N/k, found without ever shuffling the full
    * distinct-value table. Phase 1 runs a k-counter MG summary inside
    * each partition (bounded memory, one pass); any value with global
    * freq > N/k must exceed N_p/k in at least one partition (averaging
    * argument) and a k-counter summary keeps everything above
    * N_p/(k+1) ⊇ that, so the union of partition survivors is a
    * guaranteed SUPERSET of the true heavy hitters — at most
    * k × partitions candidates. Phase 2 exactly recounts candidates
    * only (a broadcast semi-join — the full value space never shuffles)
    * and applies the strict threshold as exact-integer math
    * (n·k > N — no division anywhere).
    *
    * Phase 1's survivor set depends on partition order; phase 2's
    * OUTPUT does not (the superset guarantee makes the recount
    * order-blind) — the determinism boundary the spec pins by
    * re-running under hostile repartitions.
    *
    * At 100 TB this is the "top terms without a vocabulary shuffle"
    * shape: the only wide exchange is the candidate recount, whose key
    * space is ≤ k × partitions regardless of the real vocabulary.
    */
  def heavyHitters(df: DataFrame, termCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val terms = df.select(col(termCol).cast("string").as("term"))
    val cands = terms.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        if (counters.contains(t)) counters(t) += 1L
        else if (counters.size < k) counters(t) = 1L
        else {
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          counters.foreach { case (key, c) =>
            if (c == 1L) dead += key else counters(key) = c - 1L
          }
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("term").distinct()
    val tot = terms.agg(count(lit(1)).as("__n"))
    terms
      .join(broadcast(cands), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .filter(col("n") * k > col("__n"))
      .select(col("term"), col("n"))
      .orderBy(desc("n"), col("term"))
  }
}
