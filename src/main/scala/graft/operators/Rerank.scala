package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Second-stage reranking — the batched-inference boundary of a RAG
  * pipeline: a first-stage retriever (BM25 / ANN) produces a bounded
  * shortlist, and a cross-encoder scores each (query, document) pair
  * with the two texts attended JOINTLY — the standard quality step no
  * bi-encoder similarity can express. The MODEL here is the stub (this
  * runtime has no inference libs); the Spark-side plumbing — shortlist
  * shape, partition-local batching, score-then-rank — is real, mirroring
  * [[Multimodal.extractFrames]]'s boundary for the text modality.
  */
object Rerank {

  /** One shortlist row crossing the inference boundary. */
  case class RerankInput(query_id: Long, doc_id: Long, text: String)

  /** The scored pair coming back. */
  case class RerankScore(query_id: Long, doc_id: Long, ce_score: Double)

  /** Batched partition-local cross-encoder scoring — a real
    * implementation would tokenize each batch and run the model once
    * per batch; the STUB derives a deterministic score from
    * md5("ce:" + query + ":" + doc + ":" + md5(text)) — the first 8 hex
    * chars over 2^32, an EXACT dyadic division any SQL engine replays —
    * so the gate proves the TEXT flowed through the boundary (not just
    * the ids) and the score math is engine-exact.
    */
  def crossEncoderScore(requests: Dataset[RerankInput],
      batchSize: Int = 32): Dataset[RerankScore] = {
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    import requests.sparkSession.implicits._
    requests.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch tokenizer/model setup would happen here
        val md = MessageDigest.getInstance("MD5")
        batch.iterator.map { r =>
          val th = md.digest(r.text.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          md.reset()
          val h = md.digest(s"ce:${r.query_id}:${r.doc_id}:$th"
              .getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          md.reset()
          RerankScore(r.query_id, r.doc_id,
            java.lang.Long.parseLong(h.take(8), 16) / 4294967296.0)
        }
      }
    }
  }

  /** Retrieve-then-rerank: [[TextAnalysis.bm25]] top `fbK` shortlist →
    * batched [[crossEncoderScore]] → top `k` on (ce_score DESC, doc_id).
    * The shortlist is BOUNDED before the boundary (fbK per query), so
    * the expensive stage touches fbK rows however large the corpus —
    * the shape that makes reranking affordable at 100 TB.
    */
  def rerankBm25(df: DataFrame, idCol: String, textCol: String,
      queryId: Long, terms: Seq[String], fbK: Int = 20,
      k: Int = 10): DataFrame = {
    require(k >= 1 && fbK >= k,
      s"need fbK >= k >= 1, got fbK=$fbK k=$k")
    import df.sparkSession.implicits._
    val shortlist = TextAnalysis.bm25(df, idCol, textCol, terms, k = fbK)
      .select(col(idCol), col("bm25"))
      .join(df.select(col(idCol), col(textCol)), Seq(idCol))
    val scored = crossEncoderScore(
      shortlist.select(lit(queryId).as("query_id"),
          col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
        .as[RerankInput])
    scored.toDF()
      .join(shortlist.select(col(idCol).cast("long").as("doc_id"),
        col("bm25")), Seq("doc_id"))
      .orderBy(desc("ce_score"), col("doc_id"))
      .limit(k)
      .select(col("query_id"), col("doc_id"), col("bm25"), col("ce_score"))
  }
}
