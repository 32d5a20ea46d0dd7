package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-shard row-count histogram, built for `observe()` on the
  * export write pass (r15 verdict item 6): the per-shard audit of
  * [[graft.core.GraftDatabase.exportCollection]] rides the write's own
  * scan as ONE metrics aggregate — O(1) work per row, an `nShards`-long
  * buffer — so the export touches the collection exactly once (the
  * previous audit paid a second, id-only pruned scan; at 100 TB even a
  * single-column re-scan of the corpus is a real pass).
  *
  * Flat Array buffer + ExpressionEncoder (the round-2 Kryo rule). A
  * grouped-count formulation can't serve here because `observe` permits
  * only global aggregates — the histogram IS the group-by, carried in
  * the buffer.
  */
class ShardHistogram(n: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(n >= 1, s"shard count must be positive, got $n")

  override def zero: Array[Long] = Array.fill(n)(0L)

  override def reduce(buf: Array[Long], shard: Long): Array[Long] = {
    buf(shard.toInt) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
