package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Streaming-summary aggregates for corpus profiling at 100 TB — the
  * sibling of the HLL distinct-count gate (`q_sketch_distinct`): sketches
  * whose partial states are tiny, merge associatively, and therefore ride
  * Spark's map-side partial aggregation so the shuffle carries O(m)
  * counters per partition instead of the token stream.
  */
object Sketches {

  /** Misra-Gries heavy-hitters summary with capacity `m` (mergeable form:
    * Agarwal et al., "Mergeable Summaries", PODS 2012). Invariants:
    *
    *  - at most `m` counters are ever held;
    *  - every element's stored count undercounts its true frequency by at
    *    most N/(m+1) over a stream of N elements, and the bound survives
    *    arbitrary merge trees — so any element with true frequency
    *    > N/(m+1) is GUARANTEED a surviving counter;
    *  - reduce is the classic decrement-on-overflow step; merge sums
    *    counter sets then subtracts the (m+1)-th largest count.
    *
    * The reference engine has no frequency sketch; this extends the
    * profiling family the way a training-data pipeline needs (vocabulary
    * heavy hitters, hot-key detection before a skewed join). The output is
    * the surviving counter map — callers gate it against exact counts for
    * the falsifiable-accuracy pattern (see `q_sketch_heavy_hitters`).
    */
  final class MisraGries(m: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(m > 0, s"capacity must be positive, got $m")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      b.get(tok) match {
        case Some(c) => b.updated(tok, c + 1L)
        case None if b.size < m => b.updated(tok, 1L)
        case None =>
          // decrement every counter; drop the ones that hit zero
          b.collect { case (k, v) if v > 1L => k -> (v - 1L) }
      }

    override def merge(
        a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      if (sum.size <= m) sum
      else {
        val d = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(m)
        sum.collect { case (k, v) if v > d => k -> (v - d) }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: `df.agg(Sketches.heavyHitters(512, col("token")))` →
    * MAP<STRING, BIGINT> of surviving counters. */
  def heavyHitters(m: Int, token: Column): Column =
    udaf(new MisraGries(m), ExpressionEncoder[String]())(token)
}
