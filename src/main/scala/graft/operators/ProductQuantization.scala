package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid 2011): split each vector
  * into `m` contiguous subspaces, learn a small codebook per subspace
  * (k-means over the sub-vectors), store each vector as `m` one-byte
  * centroid ids, and score queries against the codes via an
  * asymmetric-distance lookup table (ADC) — the 100 TB compression step
  * of the reference's SEARCHSIMILAR surface
  * (`/root/reference/src/command/types.rs:121-132`) beyond SQ8's 4×:
  * with dim 64 float32 and m = 8, codes are 8 bytes per row — 32× fewer
  * scan bytes, and the ADC scan reads only `(id, code)`.
  *
  * Deterministic end to end by the house doctrine (the q106 Lloyd rules,
  * applied per subspace): codebooks seed from the first `ksub` vectors in
  * md5(seed:id) order (ONE bounded top-k over the corpus — every
  * subspace slices the same seed rows, the classic PQ initialization),
  * assignment is argmin of ROUNDED l2 with a centroid-id tie-break,
  * refined centroids are per-dimension means rounded (+1e-9 midpoint
  * guard) before reuse, empty cells keep their previous centroid (the
  * MLlib/lloydIterate behavior — and it keeps the codebook DENSE, so ADC
  * lookup tables are plain arrays). Every handoff is rounded, so a SQL
  * engine replays codebooks, codes, and ADC scores exactly (the q127
  * gate does).
  *
  * Scale shape: training is `rounds` jobs, each one partial-agg pass
  * (m·ksub·dsub ≈ dim·ksub rounded doubles of driver/plan state — the
  * same model shape as [[VectorIndex.lloydIterate]]); code assignment and
  * ADC scoring are pure codegen column math against literal codebooks
  * (no join, no shuffle, runs inside the scan); the ADC cut is a bounded
  * top-k (TakeOrderedAndProject). Composes with the IVF layouts in
  * [[VectorIndex]] exactly like SQ8 does: prune cells, ADC-rank inside
  * them, exact-rerank the shortlist ([[SimilaritySearch.rerankExact]]).
  */
object ProductQuantization {

  /** Codebooks: `codebooks(s)(cid - 1)` is subspace `s`'s centroid `cid`
    * (1-based cids so codes index `element_at` directly), each of length
    * `dim / m`.
    */
  type Codebooks = Array[Array[Array[Double]]]

  private def checkDims(dim: Int, m: Int): Int = {
    require(m >= 1 && dim % m == 0,
      s"m must divide dim: dim=$dim m=$m")
    dim / m
  }

  /** Nearest centroid id (1-based) for a sub-vector against a literal
    * codebook: argmin of ROUNDED l2 distance, ties to the lowest cid —
    * the q106 assignment rule, engine-reproducible.
    */
  private def nearestCid(sv: Column, cents: Array[Array[Double]]): Column =
    // ONE compact expression instead of the expanded
    // array_min(array(struct(round(l2_dist(...))))) literal tree: m·ksub
    // l2 trees in a single consume blew Janino's 64 KB method limit and
    // dropped the PQ training/encoding stages to interpreted eval
    // (q127, r18; arithmetic parity documented on the expression)
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.NearestCentroidId(
        org.apache.spark.sql.GraftSqlShims.expression(sv), cents))

  /** Train per-subspace codebooks with `rounds` deterministic Lloyd
    * refinements (fixed round count, never convergence-dependent — a SQL
    * oracle replays exactly `rounds` layers). Seeds are the first `ksub`
    * vectors in md5(seed:id) order, sliced per subspace.
    */
  def trainCodebooks(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, rounds: Int = 1, seed: String = "pq",
      store: Option[graft.core.StageStore] = None): Codebooks = {
    require(ksub >= 1 && ksub <= 127,
      s"ksub must fit a signed byte code, got $ksub")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string")))
    // stage names must satisfy StageStore's charset; the seed string
    // (e.g. "rpq:coarse") keys the stages of coexisting trainings
    val tag = seed.replaceAll("[^A-Za-z0-9_.-]", "-")
    // With a store (r14 verdict item 2), the seed sample and each Lloyd
    // round's model-sized mean frame COMMIT through the generation
    // pointer: a resumed training replays committed rounds from their
    // (s, cid, pos, mean) stages — the codebook recursion is exact
    // driver math on read-back doubles — and touches the corpus only at
    // the first uncommitted round. dim then derives from the staged
    // seeds, so a fully-committed training never reads the corpus.
    // ONE bounded top-k for every subspace's seeds (TakeOrdered, never a
    // rank window): the classic PQ init slices the same sampled rows.
    def seedPlan = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__key", key)
      .orderBy(col("__key"), col(idCol)).limit(ksub)
      .select("__v")
    val seedVecs = (store match {
      case Some(st) => st.stage(s"pq_${tag}_seeds")(seedPlan)
      case None =>
        // size() instead of a typed getSeq: the input may be the float
        // source column or a double residual column ([[withResiduals]])
        seedPlan
    }).collect().map(_.getSeq[Double](0).toArray)
    require(seedVecs.length == ksub,
      s"need at least ksub=$ksub vectors to seed, got ${seedVecs.length}")
    val dim = seedVecs.head.length
    val dsub = checkDims(dim, m)
    var cents: Codebooks = Array.tabulate(m) { s =>
      seedVecs.map(v => v.slice(s * dsub, (s + 1) * dsub))
    }
    var r = 0
    while (r < rounds) {
      // one job: every (subspace, cell, dim) mean in a single partial-agg
      // pass over the corpus
      val frozen = cents
      val subStructs = (0 until m).map { s =>
        val sv = slice(col("__v"), s * dsub + 1, dsub)
        struct(lit(s).as("s"), nearestCid(sv, frozen(s)).as("cid"),
          sv.as("sv"))
      }
      def meanPlan = df
        .select(col(vecCol).cast("array<double>").as("__v"))
        .select(explode(array(subStructs: _*)).as("e"))
        .select(col("e.s").as("s"), col("e.cid").as("cid"),
          posexplode(col("e.sv")))
        .groupBy("s", "cid", "pos")
        .agg(round(avg("col") + lit(1e-9), 6).as("m"))
      val meanRows = (store match {
        case Some(st) => st.stage(s"pq_${tag}_round_${r + 1}")(meanPlan)
        case None => meanPlan
      }).collect()
      // keep-previous for empty cells (dense codebook, MLlib behavior)
      val next = cents.map(_.map(_.clone()))
      meanRows.foreach { row =>
        next(row.getInt(0))(row.getInt(1) - 1)(row.getInt(2)) =
          row.getDouble(3)
      }
      cents = next
      r += 1
    }
    cents
  }

  /** Append `codeCol` (array<tinyint>, length m, 1-based cids): each
    * vector's per-subspace nearest-centroid ids. Pure column math against
    * the literal codebooks — runs inside the scan that writes the data.
    */
  def assignCodes(df: DataFrame, vecCol: String, codebooks: Codebooks,
      codeCol: String = "pq_code"): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    df.withColumn("__vd", col(vecCol).cast("array<double>"))
      .withColumn(codeCol, array((0 until m).map { s =>
        nearestCid(slice(col("__vd"), s * dsub + 1, dsub), codebooks(s))
          .cast("byte")
      }: _*))
      .drop("__vd")
  }

  /** The query's ADC lookup table: `lut(s)(cid - 1)` is the ROUNDED
    * squared l2 distance from the query's subspace-`s` slice to centroid
    * `cid` — m·ksub doubles, rounded with the same +1e-9 HALF_UP rule as
    * the Spark `round` the oracle mirrors.
    */
  def adcTable(query: Array[Float], codebooks: Codebooks): Array[Array[Double]] =
    adcTableD(query.map(_.toDouble), codebooks)

  /** [[adcTable]] over a double query — the residual path's entry point
    * (query residuals are exact doubles: float query minus rounded cell
    * centroid).
    */
  def adcTableD(query: Array[Double], codebooks: Codebooks): Array[Array[Double]] = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    require(query.length == m * dsub,
      s"query dim ${query.length} != m*dsub ${m * dsub}")
    codebooks.zipWithIndex.map { case (cb, s) =>
      cb.map { c =>
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = query(s * dsub + i) - c(i)
          acc += d * d
          i += 1
        }
        java.math.BigDecimal.valueOf(acc + 1e-9)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
    }
  }

  /** ADC distance column over a stored code column: Σ_s lut[s][code_s],
    * rounded (+1e-9) — a fixed chain of literal-array lookups, fully
    * codegen, reading only the m-byte code.
    */
  def adcDistance(codeCol: Column, lut: Array[Array[Double]]): Column = {
    val total = lut.zipWithIndex.map { case (row, s) =>
      element_at(lit(row), element_at(codeCol, s + 1).cast("int"))
    }.reduce(_ + _)
    round(total + lit(1e-9), 6)
  }

  /** Bounded ADC shortlist over a coded frame: reads `(idCol, codeCol)`
    * only, scores by the lookup table, keeps the `shortlist` nearest
    * (TakeOrderedAndProject). Output: (`idCol`, `approx_score`) — feed to
    * [[SimilaritySearch.rerankExact]] with metric "l2" for the exact cut.
    */
  def adcShortlist(coded: DataFrame, query: Array[Float],
      shortlist: Int, codebooks: Codebooks, codeCol: String = "pq_code",
      idCol: String = "id"): DataFrame = {
    require(shortlist >= 1, s"shortlist must be positive, got $shortlist")
    val lut = adcTable(query, codebooks)
    coded.select(col(idCol), col(codeCol))
      .withColumn("approx_score", adcDistance(col(codeCol), lut))
      .orderBy(asc("approx_score"), col(idCol))
      .limit(shortlist)
      .select(col(idCol), col("approx_score"))
  }

  /** The full PQ probe: ADC shortlist on the stored codes, exact l2
    * rerank of the shortlist only ([[SimilaritySearch.rerankExact]]'s
    * cap-and-switch In-pushdown). Output: collection columns minus the
    * vector, plus `approx_score` (ADC) and `score` (exact l2, ascending).
    */
  def topKAdc(collection: DataFrame, coded: DataFrame, query: Array[Float],
      k: Int, shortlist: Int, codebooks: Codebooks,
      vecCol: String = "embedding", codeCol: String = "pq_code",
      idCol: String = "id"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val short = adcShortlist(coded, query, shortlist, codebooks, codeCol, idCol)
    SimilaritySearch.rerankExact(collection, short, query, k, shortlist,
      "l2", vecCol, idCol)
  }

  /** IVF × PQ — the deepest pruning composition: cell pruning and code
    * compression MULTIPLY, like [[VectorIndex.probeSq8]] but the pruned
    * scan reads m BYTES per row instead of dim/4. At 100 TB with 256
    * cells, radius-1 probing, dim 64, m = 8: ≈ (9/256) × 1/32 of the
    * vector bytes ≈ 0.1% of the corpus — the FAISS IVFPQ layout
    * re-expressed as a partition-pruned Spark scan. `indexed` carries
    * both the sign-bucket `cluster_id` ([[VectorIndex.assignSignBuckets]])
    * and the stored `codeCol` ([[assignCodes]]); the ADC shortlist ranks
    * only the probed cells' codes, and the exact rerank reads full
    * vectors for the bounded shortlist alone.
    */
  def probeAdc(indexed: DataFrame, query: Array[Float], k: Int,
      shortlist: Int, codebooks: Codebooks, nBits: Int = 8,
      radius: Int = 1, vecCol: String = "embedding",
      codeCol: String = "pq_code", idCol: String = "id"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cells = VectorIndex.codesWithin(
      VectorIndex.signBucketOf(query, nBits), nBits, radius)
    val pruned = indexed.filter(col("cluster_id").isin(cells: _*))
    val short = adcShortlist(pruned, query, shortlist, codebooks, codeCol, idCol)
    SimilaritySearch.rerankExact(pruned.drop(codeCol), short, query, k,
      shortlist, "l2", vecCol, idCol)
  }

  /** Per-cell ROUNDED mean centroids of an IVF layout — the coarse
    * codebook of the residual encoding (Jégou et al. 2011 §IV: encode
    * `x − centroid(cell)`, not `x`). One posexplode + one (cell, dim)
    * partial-agg pass; the result is ≤ |cells|·dim rounded doubles —
    * driver/plan state of exactly the k-means-model shape
    * ([[VectorIndex.lloydIterate]]), broadcast material at any corpus
    * size. Rounding (+1e-9 HALF_UP, 6 places) makes every residual
    * `x − cent` EXACT double arithmetic on both engines — the Lloyd
    * handoff doctrine, so no further rounding is needed on the residual
    * values themselves.
    */
  def cellCentroids(indexed: DataFrame, vecCol: String = "embedding",
      cellCol: String = "cluster_id"): Map[Int, Array[Double]] = {
    val rows = indexed
      .select(col(cellCol).cast("int").as("__cell"),
        col(vecCol).cast("array<double>").as("__v"))
      .select(col("__cell"), posexplode(col("__v")))
      .groupBy("__cell", "pos")
      .agg(round(avg("col") + lit(1e-9), 6).as("m"))
      .collect()
    rows.groupBy(_.getInt(0)).map { case (c, rs) =>
      val arr = new Array[Double](rs.length)
      rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
      c -> arr
    }
  }

  /** Residual column `v − centroid(cell)`: exact double subtraction
    * against the literal per-cell means (a plan-literal map lookup +
    * one zip_with — pure codegen'd column math inside the scan that
    * codes the data, no join).
    */
  def residualCol(vec: Column, cell: Column,
      cents: Map[Int, Array[Double]]): Column = {
    require(cents.nonEmpty, "residualCol: no cell centroids")
    val m = typedLit(cents.map { case (k, v) => k -> v.toSeq })
    zip_with(vec.cast("array<double>"), element_at(m, cell.cast("int")),
      (x, c) => x - c)
  }

  /** Append `resCol` = the row's residual against its own cell's
    * centroid — the frame to [[trainCodebooks]]/[[assignCodes]] on for
    * the residual IVF×PQ layout.
    */
  def withResiduals(indexed: DataFrame, vecCol: String,
      cents: Map[Int, Array[Double]], cellCol: String = "cluster_id",
      resCol: String = "__res"): DataFrame =
    indexed.withColumn(resCol,
      residualCol(col(vecCol), col(cellCol), cents))

  /** Residual IVF × PQ probe — the published IVFPQ layout (Jégou et al.
    * 2011 §IV; the FAISS default) at identical stored bytes to
    * [[probeAdc]]: codes quantize `x − centroid(cell)` instead of `x`,
    * so the per-subspace codebooks spend their 4 bits on the
    * within-cell spread rather than re-encoding the cell's position —
    * materially tighter quantization error whenever cells are real
    * clusters. The query is re-expressed per probed cell
    * (`q − centroid(c)`), giving ONE ADC lookup table per cell; tables
    * ride in as a plan-literal cell→LUT map (≤ |probed cells| · m·ksub
    * rounded doubles), so the pruned scan is still pure codegen over
    * `(id, cluster_id, code)` — m bytes of vector data per row — and
    * the exact rerank of the bounded shortlist is unchanged.
    */
  def probeAdcResidual(indexed: DataFrame, query: Array[Float], k: Int,
      shortlist: Int, codebooks: Codebooks,
      cellCents: Map[Int, Array[Double]], nBits: Int = 8,
      radius: Int = 1, vecCol: String = "embedding",
      codeCol: String = "pq_code", idCol: String = "id"): DataFrame =
    probeAdcResidualCells(indexed, query,
      probedCells(query, cellCents, nBits, radius), k, shortlist,
      codebooks, cellCents, vecCol, codeCol, idCol)

  /** [[probeAdcResidual]] with an EXPLICIT probed-cell set — composed
    * with [[nearestCellsD]] this is the FAISS-canonical IVFPQ: kmeans
    * coarse quantizer, residual codes, nprobe-nearest-cell pruning,
    * per-cell ADC tables, exact rerank (q169).
    */
  def probeAdcResidualCells(indexed: DataFrame, query: Array[Float],
      cells: Seq[Int], k: Int, shortlist: Int, codebooks: Codebooks,
      cellCents: Map[Int, Array[Double]], vecCol: String = "embedding",
      codeCol: String = "pq_code", idCol: String = "id"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val pruned = indexed.filter(col("cluster_id").isin(cells: _*))
    val short = adcShortlistResidualCells(indexed, query, cells, shortlist,
      codebooks, cellCents, codeCol, idCol)
    SimilaritySearch.rerankExact(pruned.drop(codeCol), short, query, k,
      shortlist, "l2", vecCol, idCol)
  }

  /** The query's hamming ball restricted to cells that hold data (empty
    * probed cells have no centroid — and no rows to score).
    */
  private def probedCells(query: Array[Float],
      cellCents: Map[Int, Array[Double]], nBits: Int, radius: Int): Seq[Int] = {
    val cells = VectorIndex.codesWithin(
        VectorIndex.signBucketOf(query, nBits), nBits, radius)
      .filter(cellCents.contains)
    require(cells.nonEmpty, "probeAdcResidual: no probed cell has data")
    cells
  }

  /** The `nprobe` cell ids nearest a DOUBLE query under the engine-exact
    * ordering: ROUNDED Euclidean l2 (HALF_UP, 6 places — the
    * [[nearestCid]] assignment rounding; sqrt outputs are never dyadic,
    * so no midpoint guard) with a cell-id tie-break, so a SQL oracle
    * replays the probe set exactly
    * (`ORDER BY round(list_distance(cent, qv), 6), cid`). This is the
    * kmeans-IVF probe rule; [[VectorIndex.nearestCentroidIds]] is its
    * raw-float sibling for the MLlib-built (rows-only-gated) index path.
    */
  def nearestCellsD(query: Array[Double], cellCents: Map[Int, Array[Double]],
      nprobe: Int): Seq[Int] = {
    require(nprobe >= 1, s"nprobe must be positive, got $nprobe")
    require(cellCents.nonEmpty, "nearestCellsD: no cells")
    cellCents.toSeq.map { case (cid, cent) =>
      var acc = 0.0
      var i = 0
      while (i < cent.length) {
        val d = (if (i < query.length) query(i) else 0.0) - cent(i)
        acc += d * d
        i += 1
      }
      val r = java.math.BigDecimal.valueOf(math.sqrt(acc))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      (r, cid)
    }.sortBy(identity).take(nprobe).map(_._2)
  }

  /** Residual ADC shortlist: the pruned scan reads `(idCol, cluster_id,
    * codeCol)` only — m bytes of vector data per row — and scores each
    * row against ITS cell's lookup table, delivered as a plan-literal
    * cell→LUT map (≤ |probed cells| · m·ksub rounded doubles). Output:
    * (`idCol`, `approx_score`), bounded top-`shortlist`.
    */
  def adcShortlistResidual(indexed: DataFrame, query: Array[Float],
      shortlist: Int, codebooks: Codebooks,
      cellCents: Map[Int, Array[Double]], nBits: Int = 8, radius: Int = 1,
      codeCol: String = "pq_code", idCol: String = "id"): DataFrame =
    adcShortlistResidualCells(indexed, query,
      probedCells(query, cellCents, nBits, radius), shortlist, codebooks,
      cellCents, codeCol, idCol)

  /** [[adcShortlistResidual]] against an EXPLICIT probed-cell set — the
    * entry point for coarse quantizers that are not sign buckets (kmeans
    * cells via [[nearestCellsD]], q169).
    */
  def adcShortlistResidualCells(indexed: DataFrame, query: Array[Float],
      cells: Seq[Int], shortlist: Int, codebooks: Codebooks,
      cellCents: Map[Int, Array[Double]],
      codeCol: String = "pq_code", idCol: String = "id"): DataFrame = {
    require(shortlist >= 1, s"shortlist must be positive, got $shortlist")
    require(cells.nonEmpty, "adcShortlistResidualCells: no probed cells")
    require(cells.forall(cellCents.contains),
      s"probed cells ${cells.filterNot(cellCents.contains)} have no centroid")
    val m = codebooks.length
    val ksub = codebooks.head.length
    val lutMap: Map[Int, Seq[Double]] = cells.map { c =>
      val cent = cellCents(c)
      val qr = Array.tabulate(query.length)(i => query(i).toDouble - cent(i))
      c -> adcTableD(qr, codebooks).flatten.toSeq
    }.toMap
    val adc = (0 until m).map { s =>
      element_at(col("__lut"),
        lit(s * ksub) + element_at(col(codeCol), s + 1).cast("int"))
    }.reduce(_ + _)
    indexed.select(col(idCol), col(codeCol), col("cluster_id"))
      .filter(col("cluster_id").isin(cells: _*))
      .withColumn("__lut",
        element_at(typedLit(lutMap), col("cluster_id").cast("int")))
      .withColumn("approx_score", round(adc + lit(1e-9), 6))
      .orderBy(asc("approx_score"), col(idCol))
      .limit(shortlist)
      .select(col(idCol), col("approx_score"))
  }

  /** Batch IVF × PQ probe — what a retrieval or hard-negative-mining job
    * runs against a PQ-compressed corpus: each query's hamming ball of
    * cells, the UNION of all probed cells scanned ONCE reading only
    * `(idCol, cluster_id, codeCol)` (m bytes of vector data per row), a
    * per-(query, cell) broadcast so rows ADC-score only against the
    * queries probing their cell, a bounded per-query heap for the
    * shortlist ([[SimilaritySearch.boundedTopKPerQuery]] — ≤ shortlist
    * rows per partition per query cross the shuffle, never a sort), and
    * ONE exact rerank joining the broadcast shortlist back to the
    * full-precision vectors. ADC tables ride in as a broadcast
    * (query_id, flattened-lut) frame — m·ksub rounded doubles per query.
    *
    * The final k-cut ranks on the ROUNDED exact l2 (house rule: never
    * let raw-float accumulation order decide a rank); the shortlist cut
    * is on the rounded ADC distance. Output: (queryIdCol, idCol,
    * approx_score, score, rank), self-matches included (queries need
    * not be corpus members; callers exclude ids they consider "self").
    */
  def probeAdcBatch(indexed: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int, codebooks: Codebooks, nBits: Int = 8,
      radius: Int = 1, vecCol: String = "embedding",
      codeCol: String = "pq_code", idCol: String = "id",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val spark = indexed.sparkSession
    import spark.implicits._
    VectorIndex.requireIntegralCol(queries, queryIdCol, "probeAdcBatch")
    VectorIndex.requireIntegralCol(indexed, idCol, "probeAdcBatch")
    val m = codebooks.length
    val ksub = codebooks.head.length
    val qRows = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol)).collect()
    require(qRows.nonEmpty, "probeAdcBatch: empty query batch")
    val cellPairs: Seq[(Long, Int)] = qRows.toSeq.flatMap { r =>
      VectorIndex.codesWithin(
          VectorIndex.signBucketOf(r.getSeq[Float](1).toArray, nBits),
          nBits, radius)
        .map(c => (r.getLong(0), c))
    }
    val union = cellPairs.map(_._2).distinct.sorted
    val cells = cellPairs.toDF(queryIdCol, "cluster_id")
    val luts = qRows.toSeq.map { r =>
      (r.getLong(0),
        adcTable(r.getSeq[Float](1).toArray, codebooks).flatten.toSeq)
    }.toDF(queryIdCol, "__lut")
    val adc = (0 until m).map { s =>
      element_at(col("__lut"),
        lit(s * ksub) + element_at(col(codeCol), s + 1).cast("int"))
    }.reduce(_ + _)
    val scored = indexed
      .filter(col("cluster_id").isin(union: _*))
      .join(broadcast(cells), Seq("cluster_id"))
      .join(broadcast(luts), Seq(queryIdCol))
      .select(col(queryIdCol), col(idCol).cast("long").as(idCol),
        (-round(adc + lit(1e-9), 6)).as("s"))
      .as[(Long, Long, Double)]
    batchExactRerank(indexed, queries, scored.toDF(queryIdCol, idCol, "s"),
      k, shortlist, vecCol, idCol, queryIdCol, queryVecCol)
  }

  /** Batch residual IVFPQ probe — [[probeAdcBatch]] for the
    * kmeans-coarse layout (q170): each query probes its `nprobe`
    * nearest cells ([[nearestCellsD]] — the engine-exact ordering), ADC
    * tables are PER (query, probed cell) because codes quantize
    * residuals (the q169 LUT re-expressed per cell), delivered as ONE
    * broadcast (query_id, cluster_id, lut) frame whose cell join also
    * restricts scoring to probed cells; the bounded per-query heap and
    * the single exact rerank are shared with the sign-bucket batch
    * path. Scale shape: the union of probed cells is scanned once
    * reading (idCol, cluster_id, codeCol) — m bytes of vector data per
    * row — and broadcast sizes are |queries|·nprobe·m·ksub rounded
    * doubles.
    */
  def probeAdcResidualBatch(indexed: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int, codebooks: Codebooks,
      cellCents: Map[Int, Array[Double]], nprobe: Int = 2,
      vecCol: String = "embedding", codeCol: String = "pq_code",
      idCol: String = "id", queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val scored = adcResidualScored(indexed, queries, codebooks, cellCents,
      nprobe, codeCol, idCol, queryIdCol, queryVecCol)
    batchExactRerank(indexed, queries, scored, k, shortlist, vecCol, idCol,
      queryIdCol, queryVecCol)
  }

  /** The codes-only ADC scoring frame shared by [[probeAdcResidualBatch]]
    * and the decon screen ([[graft.core.GraftDatabase.deconScreen]]): per
    * query its `nprobe` nearest coarse cells (engine-exact rounded-l2
    * rank), per-(query, cell) residual LUTs as ONE broadcast whose cell
    * join also restricts scoring to probed cells, ADC distance per stored
    * code row. Scans ONLY `(idCol, cluster_id, codeCol)` pruned to the
    * probed-cell union — never the float vectors. Output: (queryIdCol,
    * idCol, s) with s = −rounded ADC distance (the bounded heap's
    * higher-is-better convention).
    */
  private[graft] def adcResidualScored(indexed: DataFrame,
      queries: DataFrame, codebooks: Codebooks,
      cellCents: Map[Int, Array[Double]], nprobe: Int,
      codeCol: String = "pq_code", idCol: String = "id",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec"): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    VectorIndex.requireIntegralCol(queries, queryIdCol, "adcResidualScored")
    VectorIndex.requireIntegralCol(indexed, idCol, "adcResidualScored")
    val m = codebooks.length
    val ksub = codebooks.head.length
    val qRows = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol)).collect()
    require(qRows.nonEmpty, "adcResidualScored: empty query batch")
    val qVecs: Map[Long, Array[Float]] =
      qRows.map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cellPairs: Seq[(Long, Int)] = qRows.toSeq.flatMap { r =>
      nearestCellsD(r.getSeq[Float](1).toArray.map(_.toDouble), cellCents,
          nprobe)
        .map(c => (r.getLong(0), c))
    }
    val union = cellPairs.map(_._2).distinct.sorted
    val luts = cellPairs.map { case (qid, c) =>
      val cent = cellCents(c)
      val qv = qVecs(qid)
      val qr = Array.tabulate(qv.length)(i => qv(i).toDouble - cent(i))
      (qid, c, adcTableD(qr, codebooks).flatten.toSeq)
    }.toDF(queryIdCol, "cluster_id", "__lut")
    val adc = (0 until m).map { s =>
      element_at(col("__lut"),
        lit(s * ksub) + element_at(col(codeCol), s + 1).cast("int"))
    }.reduce(_ + _)
    indexed
      .filter(col("cluster_id").isin(union: _*))
      .join(broadcast(luts), Seq("cluster_id"))
      .select(col(queryIdCol), col(idCol).cast("long").as(idCol),
        (-round(adc + lit(1e-9), 6)).as("s"))
  }

  /** Shared batch tail: bounded per-query shortlist heap over negated
    * ADC scores, then ONE exact rerank joining the broadcast shortlist
    * back to full-precision vectors, ranking on the ROUNDED l2 (house
    * rule). `scored` columns: (queryIdCol, idCol, s) with s = −rounded
    * ADC distance.
    */
  private def batchExactRerank(indexed: DataFrame, queries: DataFrame,
      scored: DataFrame, k: Int, shortlist: Int, vecCol: String,
      idCol: String, queryIdCol: String, queryVecCol: String): DataFrame = {
    val spark = indexed.sparkSession
    import spark.implicits._
    val typed = scored
      .select(col(queryIdCol).cast("long"), col(idCol).cast("long"),
        col("s").cast("double"))
      .as[(Long, Long, Double)]
    val short = SimilaritySearch
      .boundedTopKPerQuery(typed, shortlist, desc_? = false, idCol, queryIdCol)
      .select(col(queryIdCol), col(idCol), col("score").as("approx_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(queryIdCol).orderBy(asc("score"), col(idCol))
    indexed.select(col(idCol).cast("long").as(idCol), col(vecCol))
      .join(broadcast(short), Seq(idCol))
      .join(broadcast(queries.select(
        col(queryIdCol).cast("long").as(queryIdCol), col(queryVecCol))),
        Seq(queryIdCol))
      .withColumn("score",
        round(graft.functions.l2_dist(col(vecCol), col(queryVecCol)), 6))
      .drop(vecCol, queryVecCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("approx_score"),
        col("score"), col("rank"))
  }
}
