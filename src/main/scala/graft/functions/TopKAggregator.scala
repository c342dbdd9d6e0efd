package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Scored candidate row (dist ascending wins; ties by id). */
case class Scored(dist: Double, id: Long)

/** Bounded top-k per group with MAP-SIDE PARTIAL AGGREGATION — the scale
  * form of per-group top-k. The window-function form shuffles every scored
  * row (n·q rows for exact kNN); this Aggregator combines to k rows per
  * partition per group before the exchange, so the shuffle carries
  * partitions·q·k rows regardless of corpus size — the same bounded-heap
  * idea as the reference's result heap (vamana.h:506-528), lifted into a
  * distributed aggregate.
  *
  * Determinism contract: keeps the k smallest by (dist, id) — identical
  * output to `row_number() OVER (ORDER BY dist, id) <= k`.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, mutable.PriorityQueue[Scored], Array[Scored]] {

  private def ord: Ordering[Scored] = Ordering.by(s => (s.dist, s.id)) // max-heap on (dist,id)

  override def zero: mutable.PriorityQueue[Scored] = mutable.PriorityQueue.empty(ord)

  override def reduce(heap: mutable.PriorityQueue[Scored], row: Scored): mutable.PriorityQueue[Scored] = {
    if (heap.size < k) heap.enqueue(row)
    else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row) }
    heap
  }

  override def merge(a: mutable.PriorityQueue[Scored], b: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] = {
    b.foreach(reduce(a, _))
    a
  }

  override def finish(heap: mutable.PriorityQueue[Scored]): Array[Scored] =
    heap.toArray.sortBy(s => (s.dist, s.id))

  override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
    Encoders.kryo[mutable.PriorityQueue[Scored]]

  override def outputEncoder: Encoder[Array[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Scored]]()
}
