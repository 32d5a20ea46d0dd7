package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distinct-collect with a HARD buffer cap: keeps at most `cap` distinct
  * (smallest) values per group, in every partial buffer and every merge —
  * the bounded-memory replacement for `collect_set` in LSH bucket
  * aggregation ([[Dedup.candidatePairs]]).
  *
  * Semantics contract with the caller: the caller drops groups whose
  * collected size EXCEEDS its threshold (cap = threshold + 1), so results
  * are identical to an unbounded collect_set + size filter — a group at or
  * under the threshold is kept whole (the cap never trims it), and an
  * over-threshold group yields exactly cap values, which the size filter
  * removes. Which cap members survive the overflow case is therefore
  * irrelevant; "smallest" just makes partial/merge trimming commutative
  * and the output deterministic.
  *
  * vs the row_number() window formulation: no extra shuffle+sort stage —
  * partial aggregation trims map-side and the shuffle carries ≤ cap values
  * per (partition × group).
  *
  * Buffer is a sorted distinct Array[Long] (flat, ExpressionEncoder-
  * friendly); inserts are O(cap) copies and merges are linear, with cap a
  * small constant by construction.
  */
class BoundedDistinctSetAgg(cap: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(cap >= 1, s"cap must be positive, got $cap")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, a)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (b.length >= cap && ins >= cap) b // larger than every kept value
      else {
        val n = math.min(cap, b.length + 1)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = a
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    // linear merge of two sorted distinct arrays, capped
    val out = new Array[Long](math.min(cap, x.length + y.length))
    var i = 0; var j = 0; var k = 0
    while (k < out.length && (i < x.length || j < y.length)) {
      val take =
        if (i >= x.length) { val v = y(j); j += 1; v }
        else if (j >= y.length) { val v = x(i); i += 1; v }
        else if (x(i) < y(j)) { val v = x(i); i += 1; v }
        else if (x(i) > y(j)) { val v = y(j); j += 1; v }
        else { val v = x(i); i += 1; j += 1; v }
      out(k) = take
      k += 1
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq // ascending

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
