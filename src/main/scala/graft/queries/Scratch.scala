package graft.queries

import org.apache.spark.sql.SparkSession

import graft.core.GraftDatabase

/** Scratch storage for effectful queries (q40-q47, q58, q66, q68...).
  *
  * Query functions return LAZY DataFrames — the backing files must outlive
  * the returned frame until the caller's action runs — so cleanup happens
  * at JVM exit, not at return: repeated Verify/Bench invocations no longer
  * accumulate orphaned parquet under the system temp dir.
  */
private[queries] object Scratch {

  /** A temp directory deleted when this JVM exits. */
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p.toString
  }

  /** A scratch graft database rooted in an exit-cleaned temp dir. */
  def db(s: SparkSession, prefix: String): GraftDatabase =
    GraftDatabase.create(s, dir(prefix), "qdb")

  /** A unique name for temp views / memory sinks: fixed names race when two
    * query invocations share a session (q58's convention, now shared).
    */
  def name(prefix: String): String =
    s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(delete))
    f.delete()
    ()
  }
}
