package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
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
    * The buffer is a MUTABLE map (kryo-encoded; serialization only happens
    * at partial-aggregate boundaries): the decrement sweep mutates counters
    * in place, so the hot aggregation path allocates nothing per token.
    * The sweep itself stays O(m) but is amortized O(1) per input — each
    * sweep destroys m+1 units of stored mass and the stream only creates N,
    * so at most N/(m+1) sweeps happen over the whole stream. (The first
    * cut rebuilt an m-entry immutable Map on EVERY non-tracked token at
    * capacity — O(m) allocation per token on high-cardinality streams.)
    *
    * The reference engine has no frequency sketch; this extends the
    * profiling family the way a training-data pipeline needs (vocabulary
    * heavy hitters, hot-key detection before a skewed join). The output is
    * the surviving counter map — callers gate it against exact counts for
    * the falsifiable-accuracy pattern (see `q_sketch_heavy_hitters`).
    */
  final class MisraGries(m: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
    require(m > 0, s"capacity must be positive, got $m")

    override def zero: mutable.HashMap[String, Long] = new mutable.HashMap

    override def reduce(
        b: mutable.HashMap[String, Long], tok: String): mutable.HashMap[String, Long] = {
      b.get(tok) match {
        case Some(c) => b.update(tok, c + 1L)
        case None if b.size < m => b.update(tok, 1L)
        case None =>
          // classic MG step: the new token's +1 cancels against the round's
          // -1, every stored counter decrements in place, zeros drop
          b.mapValuesInPlace((_, v) => v - 1L)
          b.filterInPlace((_, v) => v > 0L)
      }
      b
    }

    override def merge(
        a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      // fold the smaller summary into the larger
      val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
      from.foreach { case (k, v) => into.update(k, into.getOrElse(k, 0L) + v) }
      if (into.size > m) {
        val d = into.valuesIterator.toArray.sorted(Ordering[Long].reverse)(m)
        into.mapValuesInPlace((_, v) => v - d)
        into.filterInPlace((_, v) => v > 0L)
      }
      into
    }

    override def finish(r: mutable.HashMap[String, Long]): Map[String, Long] =
      r.toMap

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: `df.agg(Sketches.heavyHitters(512, col("token")))` →
    * MAP<STRING, BIGINT> of surviving counters. */
  def heavyHitters(m: Int, token: Column): Column =
    udaf(new MisraGries(m), ExpressionEncoder[String]())(token)

  /** Count-Min row hashes over a `(token, cnt)` frame: one row per
    * (token, j ∈ [0, depth)) with the token's row-j bucket — the
    * md5-derived 60-bit hex fold mod `width` (the affine-MinHash
    * cross-engine parity idiom, so a DuckDB oracle can replay every
    * bucket). Shared by the `q_sketch_countmin` entry and the
    * mergeability spec. */
  def countMinHashed(
      tokenCounts: org.apache.spark.sql.DataFrame,
      depth: Int = 4, width: Int = 1024): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    tokenCounts.select(col("token"), col("cnt"),
      explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket",
        conv(substring(md5(concat(col("j").cast("string"), lit(":"),
          col("token")).cast("binary")), 1, 15), 16, 10)
          .cast("long") % width)
  }

  /** Count-Min cell table from [[countMinHashed]] output: (j, bucket) →
    * summed count. LINEAR in the input counts — cells of disjoint shards
    * ADD to the whole-corpus cells (the mergeable-summary property the
    * 100 TB story rests on; gated in SketchesSpec), so daily/shard
    * sketches re-aggregate without raw data. */
  def countMinCells(
      hashed: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    hashed.groupBy("j", "bucket").agg(sum("cnt").as("cell"))
  }
}
