package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (Aggregator[IN, BUF, OUT]) keeping the k
  * largest (value, id) pairs, ordered by value desc then id asc.
  *
  * Scale rationale vs a window `row_number`: the window form shuffles
  * EVERY row to its key's partition then sorts; this aggregator keeps at
  * most k elements per key in the partial (map-side) buffers, so the
  * shuffle carries ≤ k rows per key — the difference between shuffling
  * 100 TB and shuffling k×|keys| at scale. Semantics are identical when
  * the ordering has the same tiebreak.
  */
class TopKByValue(k: Int) extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  // value desc, id asc — the same total order as the window_rank query
  private val ord: Ordering[(Long, Double)] =
    Ordering.by[(Long, Double), (Double, Long)](p => (-p._2, p._1))

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
    if (buf.size < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
