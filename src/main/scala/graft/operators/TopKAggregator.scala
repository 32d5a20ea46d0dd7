package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Heap-based per-group top-k as a typed [[Aggregator]].
  *
  * The ranking-window formulation of per-query top-k shuffles EVERY scored
  * row to the query's reducer and sorts there; this aggregator keeps a
  * bounded heap per (partition × query) so partial aggregation ships at most
  * k rows per partition per query through the shuffle — the difference
  * between shuffling the corpus and shuffling k×partitions rows at 100 TB.
  *
  * Determinism: ordering is (score desc, id asc) everywhere, so ties
  * resolve identically to the window + row_number formulation and results
  * are reproducible run-to-run.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), mutable.PriorityQueue[(Double, Long)], Seq[(Long, Double)]] {

  // min-heap on (score, -id): the head is the weakest kept entry — evict it
  // when a better candidate arrives. Ordering.by gives max-heap; reverse for
  // min-heap on score, and on equal scores prefer keeping the SMALLER id,
  // so the heap head (eviction candidate) must be the larger id → sort ids
  // descending within equal scores via negation.
  private val heapOrd: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrd)

  override def reduce(heap: mutable.PriorityQueue[(Double, Long)],
      row: (Long, Double)): mutable.PriorityQueue[(Double, Long)] = {
    val entry = (row._2, row._1)
    if (heap.size < k) heap.enqueue(entry)
    else {
      val weakest = heap.head // (score, id) with min score / max id on ties
      if (Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
            .compare((entry._1, entry._2), (weakest._1, weakest._2)) < 0) {
        heap.dequeue(); heap.enqueue(entry)
      }
    }
    heap
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(e => reduce(a, (e._2, e._1)))
    a
  }

  override def finish(heap: mutable.PriorityQueue[(Double, Long)]): Seq[(Long, Double)] =
    heap.toSeq
      .sortBy { case (s, id) => (-s, id) }
      .map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
