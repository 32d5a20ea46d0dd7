package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Copy-on-write mutation semantics over immutable columnar storage — the
  * dataflow behind UPDATE (`/root/reference/src/command/types.rs:82-93`) and
  * DELETE (`:95-106`).
  *
  * Scale notes: the anti-join key sets carry NO broadcast hint — Catalyst
  * broadcasts them automatically when they fit autoBroadcastJoinThreshold
  * (the common small-update case, leaving the big side unshuffled) and
  * falls back to a shuffled join when they don't. A forced hint here would
  * bypass the threshold and drive the driver out of memory on a large
  * delete/update set (e.g. "delete half the table by key"). Neither path
  * collects data to the driver.
  */
object Mutations {

  /** Rows of `current` whose key doesn't appear in `updates`, plus all of
    * `updates` — i.e. last-writer-wins upsert by `key`.
    */
  def upsert(current: DataFrame, updates: DataFrame, key: String = "id"): DataFrame =
    current
      .join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates.select(current.columns.map(col).toIndexedSeq: _*))

  /** Delete by predicate: keep every row where the predicate is not TRUE.
    * SQL DELETE semantics — a NULL-evaluating predicate must NOT delete the
    * row, so the complement is `!coalesce(pred, false)`, not `!pred` (which
    * is NULL on NULL and would silently drop those rows).
    */
  def deleteWhere(current: DataFrame, predicate: Column): DataFrame =
    current.filter(!coalesce(predicate, lit(false)))

  /** Delete by key set (anti-join; `keys` is one key column). */
  def deleteByKeys(current: DataFrame, keys: DataFrame, key: String = "id"): DataFrame =
    current.join(keys.select(key).distinct(), Seq(key), "left_anti")

  /** Snapshot diff — the incremental-ingest primitive: classify every key
    * across two corpus versions as `added` / `removed` / `changed` /
    * `unchanged` by comparing a content signature (any deterministic
    * fingerprint column, typically [[TextAnalysis.fingerprint]]). The
    * downstream pipeline then reprocesses ONLY `added` + `changed` —
    * re-embedding, re-scoring, re-deduping a 100 TB corpus because 0.1%
    * of it moved is the cost this diff exists to avoid.
    *
    * Semantics: FULL OUTER join on `idCol` (the one join shape the
    * mutation family didn't yet exercise); a key present only in `next`
    * is `added`, only in `prev` is `removed`, in both with equal
    * signatures `unchanged`, else `changed`. Signature NULLs are
    * compared with null-safe equality (two NULL signatures are
    * `unchanged`, one-sided NULL is `changed`) — presence is decided by
    * a separate non-null marker, never by the signature itself.
    *
    * Scale shape: one id-keyed shuffle of each side into a sort-merge
    * full outer join — unique keys, so no skew; the projection is two
    * columns per side regardless of corpus width (signature computation
    * pushes into each snapshot's scan).
    */
  def snapshotDiff(prev: DataFrame, next: DataFrame, idCol: String,
      sigCol: String): DataFrame = {
    val a = prev.select(col(idCol), col(sigCol).as("__sa"),
      lit(true).as("__ina"))
    val b = next.select(col(idCol), col(sigCol).as("__sb"),
      lit(true).as("__inb"))
    a.join(b, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__ina").isNull, "added")
          .when(col("__inb").isNull, "removed")
          .when(col("__sa") <=> col("__sb"), "unchanged")
          .otherwise("changed"))
      .select(col(idCol), col("status"))
  }
}
