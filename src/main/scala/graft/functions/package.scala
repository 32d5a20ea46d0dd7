package graft

import org.apache.spark.sql.{Column, GraftSqlShims, SparkSession}
import org.apache.spark.sql.functions.lit

/** Public Column-level API for graft's custom Catalyst expressions.
  *
  * Usage mirrors `org.apache.spark.sql.functions`:
  * {{{
  *   import graft.functions._
  *   embeddings.select(cosine_sim($"embedding", vector_lit(q)).as("score"))
  * }}}
  * All functions are also SQL-registerable via [[functions.registerAll]]
  * (`SELECT cosine_sim(a, b)`), so `spark.sql` users get the same surface.
  */
package object functions {

  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlShims.column(CosineSimilarity(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  def l2_dist(a: Column, b: Column): Column =
    GraftSqlShims.column(L2Distance(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    GraftSqlShims.column(DotProduct(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  def l2_norm(a: Column): Column =
    GraftSqlShims.column(L2Norm(GraftSqlShims.expression(a)))

  def hamming_dist(a: Column, b: Column): Column =
    GraftSqlShims.column(HammingDistance(GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  /** Unicode NFC canonical composition — normalize BEFORE dedup or
    * fingerprinting so byte-level encoding variants of the same text
    * land in one dedup class.
    */
  def nfc_normalize(a: Column): Column =
    GraftSqlShims.column(NfcNormalize(GraftSqlShims.expression(a)))

  /** NFD-decompose and drop combining marks — diacritic folding for
    * fuzzy dedup keys (café ≡ café ≡ cafe).
    */
  def strip_accents(a: Column): Column =
    GraftSqlShims.column(StripAccents(GraftSqlShims.expression(a)))

  /** A float-vector literal usable against `array<float>` columns. */
  def vector_lit(v: Array[Float]): Column = lit(v)

  /** A double-vector literal (scores compute in double either way). */
  def vector_lit(v: Array[Double]): Column = lit(v)

  /** Register every graft function in the session's FunctionRegistry so they
    * are callable from SQL text. Idempotent.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSimilarity(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_dist", es => L2Distance(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_norm", es => L2Norm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hamming_dist", es => HammingDistance(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize", es => NfcNormalize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("strip_accents", es => StripAccents(es.head), "scala_udf")
  }
}
