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

  /** `fact` reduced to the rows whose `factKey` MIGHT be in `dim`'s
    * `dimKey` set (Bloom membership; `expectedKeys`/`fpp` size the filter —
    * see `BloomFilter.create`). A superset of the true semi-join: false
    * positives pass (bounded by fpp), nothing true is dropped. Compose it
    * ahead of whatever consumes the fact side — a shuffle join, an
    * aggregation, a window, a sink — the regimes the planner's own
    * runtime-filter rewrite does not reach. */
  def bloomPrefilter(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    fact.filter(might(col(factKey)))
  }

  /** Inner-join `fact ⋈ dim` on `factKey == dimKey` over the pre-filtered
    * fact side. The join strategy is left to the planner: when dim is
    * broadcast-sized the pre-filter buys nothing the broadcast join's own
    * map-side lookup doesn't (it is then pure belt-and-braces, and the
    * correctness gate exercises exactly that equivalence); the payoff
    * regime is a shuffle-shaped join or a non-join consumer — use
    * [[bloomPrefilter]] directly there. */
  def bloomPrefilterJoin(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame =
    bloomPrefilter(fact, dim, factKey, dimKey, expectedKeys, fpp)
      .join(dim, col(factKey) === col(dimKey))
}
