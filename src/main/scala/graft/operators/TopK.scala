package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for per-group top-k — the §2.10 "typed UDAF" surface
  * exercised for real: a bounded buffer of ≤ k (value, id) pairs that
  * REDUCES row-by-row and MERGES buffer-by-buffer, so Spark runs it as a
  * partial aggregation (map-side combine) — each map task ships at most k
  * pairs per group to the shuffle, versus the window-function top-k
  * (row_number ≤ k) which sorts EVERY group row through the exchange. At
  * 100 TB the difference is the shuffle: O(groups × k) vs O(rows).
  *
  * Total order: value DESC, then id ASC — a deterministic tie-break, so
  * the result set is unique and the DuckDB oracle (`ROW_NUMBER() OVER
  * (ORDER BY value DESC, event_id ASC) <= k`) reproduces it exactly.
  *
  * The buffer is a sorted Vector (insert = binary-search position): k is
  * small by contract (top-N reporting), so per-row cost is O(log k) search
  * + O(k) insert on a tiny array — the classic bounded-heap trade-off
  * without a mutable heap's encoder friction.
  */
/** Typed `Aggregator` for the k smallest DISTINCT long values per group —
  * the state of a KMV (k-minimum-values) sketch when fed hash values.
  * Same partial-aggregation shape as [[TopKAggregator]] (bounded ≤ k
  * buffer, map-side combine, O(groups × k) shuffle), with in-buffer dedup:
  * duplicates of a value (same member hashing identically) collapse inside
  * the buffer, so no distinct() pre-shuffle of the raw pairs is needed —
  * the one property that keeps KMV a one-pass sketch. Deterministic and
  * merge-order-independent by construction (a sorted set is).
  */
final case class BottomKDistinctAggregator(k: Int)
  extends Aggregator[Long, Vector[Long], Vector[Long]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Vector[Long] = Vector.empty

  override def reduce(buf: Vector[Long], v: Long): Vector[Long] = {
    if (buf.length == k && v >= buf.last) buf
    else {
      val i = buf.search(v)(Ordering.Long) match {
        case scala.collection.Searching.Found(_) => return buf // already present
        case scala.collection.Searching.InsertionPoint(p) => p
      }
      buf.patch(i, Vector(v), 0).take(k)
    }
  }

  override def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Vector[Long]): Vector[Long] = buf

  override def bufferEncoder: Encoder[Vector[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Long]]()

  override def outputEncoder: Encoder[Vector[Long]] = bufferEncoder
}

final case class TopKAggregator(k: Int)
  extends Aggregator[(Double, Long), Vector[(Double, Long)], Vector[(Double, Long)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  /** value DESC, id ASC. */
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Vector[(Double, Long)] = Vector.empty

  override def reduce(buf: Vector[(Double, Long)], row: (Double, Long)): Vector[(Double, Long)] = {
    if (buf.length == k && !lt(row, buf.last)) buf
    else {
      val i = buf.indexWhere(e => lt(row, e)) match {
        case -1 => buf.length
        case idx => idx
      }
      (buf.patch(i, Vector(row), 0)).take(k)
    }
  }

  override def merge(a: Vector[(Double, Long)], b: Vector[(Double, Long)]): Vector[(Double, Long)] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(buf: Vector[(Double, Long)]): Vector[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Vector[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[(Double, Long)]]()

  override def outputEncoder: Encoder[Vector[(Double, Long)]] = bufferEncoder
}
