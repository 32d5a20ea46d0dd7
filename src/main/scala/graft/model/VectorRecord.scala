package graft.model

import org.apache.spark.sql.types._

/** The canonical collection record: (id, embedding, payload).
  *
  * Mirrors the reference's only materialized record format — an embedding
  * vector plus the source text it encodes
  * (`/root/reference/src/utils/embeddings.rs:55-62`), with an explicit id
  * (the reference's implicit line number made first-class). Collections may
  * carry additional typed payload columns (multimodal extension); this is the
  * minimum schema every collection shares.
  */
case class VectorRecord(id: Long, embedding: Array[Float], payload: String)

object VectorRecord {
  /** containsNull=false matches the testdata embeddings.parquet layout. */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("payload", StringType, nullable = true)))
}
