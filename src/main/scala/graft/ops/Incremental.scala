package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-pipeline maintenance operators: partial-aggregate rollup
  * refresh (the materialized-view pattern — absorb a delta batch WITHOUT
  * rescanning the base data) and SCD2 historization (turn an upsert change
  * log into validity intervals). Complements `ops/Merge.scala` (row-level
  * CDC apply) and `ops/Diff.scala` (snapshot compare): merge maintains the
  * TABLE, refreshRollup maintains its AGGREGATES, scd2 maintains its
  * HISTORY.
  *
  * Scale shapes: refreshRollup touches only the delta and the (small)
  * materialized aggregate — the base is never read, which is the entire
  * point at 100 TB where a full re-aggregation is a multi-hour job; scd2
  * windows over the change LOG partitioned by key (log-sized work, skew
  * bounded by a single key's change count, the same contract as
  * Merge.applyChanges).
  */
object Incremental {

  /** Merge a delta batch into a materialized rollup. `baseAgg` holds
    * per-group partial states (`n` = count, one `sum_<c>` per `sumCols`
    * entry); the delta's partials are computed (map-side combine) and the
    * two partial sets re-aggregate — valid because count/sum are
    * commutative monoids, the same algebra Spark's own partial aggregation
    * relies on. Returns the refreshed rollup with identical schema. */
  /** Per-group partial states of `rows`: (keys..., n, sum_<c>...) — the
    * stored shape of a maintained rollup, and the delta-side half of
    * [[refreshRollup]]. */
  def partials(
      rows: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  def refreshRollup(
      baseAgg: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    baseAgg.unionByName(partials(delta, keys, sumCols))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)

  /** SCD2 historization of an upsert log `(key, seq, payload...)`: collapse
    * consecutive versions with an UNCHANGED payload (null-safe struct
    * compare, the Diff.scala policy), then assign each surviving version a
    * validity interval [valid_from, valid_to) in `seq` units —
    * `valid_to` null marks the current version. Output: key, ver (1-based
    * change ordinal), valid_from, valid_to, is_current, payload columns.
    * Two windows, both partitioned by the log key. */
  /** Point-in-time lookup against an [[scd2]] history: each probe row
    * (key, at) joins to the single version whose
    * [valid_from, valid_to) interval contains `at` (open current versions
    * have null valid_to). The join is an EQUI-join on the key with the
    * interval check as a residual filter — per-key fan-out is bounded by
    * that key's version count (history depth, typically tiny), never a
    * range-join explosion. Probes earlier than the key's first version
    * get no row (inner semantics — the entity did not exist yet). */
  def asOfLookup(
      history: DataFrame, probes: DataFrame, key: String,
      atCol: String): DataFrame =
    probes.as("p")
      .join(history.as("h"),
        col(s"p.$key") === col(s"h.$key") &&
          col("h.valid_from") <= col(s"p.$atCol") &&
          (col("h.valid_to").isNull || col(s"p.$atCol") < col("h.valid_to")))
      .drop(col(s"h.$key"))

  def scd2(
      log: DataFrame, key: String, seq: String,
      payloadCols: Seq[String]): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(seq)
    val payload: Column = struct(payloadCols.map(col): _*)
    val changed = log
      .withColumn("_prev", lag(payload, 1).over(byKey))
      // first version of a key: lag is null AND a null-safe equality with
      // the payload still fails unless the payload is itself all-null —
      // guard on lag's frame position instead.
      .withColumn("_rn", row_number().over(byKey))
      .filter(col("_rn") === 1 || !(payload <=> col("_prev")))
    changed
      .withColumn("ver", row_number().over(byKey).cast("long"))
      .withColumn("valid_from", col(seq))
      .withColumn("valid_to", lead(col(seq), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select((Seq(col(key), col("ver"), col("valid_from"), col("valid_to"),
        col("is_current")) ++ payloadCols.map(col)): _*)
  }
}
