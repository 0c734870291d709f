package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-join reduction: cut the big side of a join down BEFORE it reaches
  * the exchange, using a compact membership summary of the small side's
  * keys. This is the runtime-filter pattern (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` applies it to shuffle
  * joins it can see through; this operator makes it explicit and
  * composable — e.g. ahead of an aggregation, a window, or a sink where
  * the planner's rewrite does not reach).
  *
  * The result is EXACT: the Bloom filter only pre-filters (false positives
  * pass through and are eliminated by the real join); nothing true is ever
  * dropped. At 100 TB the win is shuffle-volume: a 1% - selective dim
  * predicate turns the fact exchange from full-table to ~1% + fpp.
  */
object SemiFilter {

  /** Inner-join `fact ⋈ dim` on `factKey == dimKey`, with the fact side
    * pre-filtered by a Bloom filter built from the dim side's keys
    * (`expectedKeys`/`fpp` size it — see `BloomFilter.create`). The dim
    * side is assumed broadcast-sized (that is what makes its key set
    * collectable); the fact side streams map-side through the filter and
    * only survivors shuffle. */
  def bloomPrefilterJoin(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    fact.filter(might(col(factKey)))
      .join(broadcast(dim), col(factKey) === col(dimKey))
  }
}
