package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE / CDC-apply: fold a change log onto a base table — the mutation
  * path a table-format engine (Delta/Iceberg-style) runs on every commit,
  * and the batch form of the engine's insert/remove lifecycle.
  *
  * Semantics: the change log carries (key, seq, op ∈ {upsert, delete},
  * payload...). For each key the change with the HIGHEST seq wins
  * (last-writer-wins); a winning upsert replaces the base row (or inserts
  * a new one), a winning delete removes it. Rows whose key never appears
  * in the log pass through untouched.
  *
  * Scale shape: ONE shuffle of the (small) change log for the per-key
  * window, then a single join of base against the winners — broadcast when
  * the log is small (the common CDC case: log ≪ base), hash otherwise.
  * The base table is never shuffled in the broadcast regime. For repeated
  * applies at 100 TB, bucket the base by `key` so even the hash-join
  * regime keeps the base side shuffle-free (see tools/BucketProbe).
  */
object Merge {

  /** Apply `changes` to `base`. Both must share the `key` column; `changes`
    * additionally has `seqCol` (change ordering) and `opCol` ("upsert" |
    * "delete"); upsert payload columns must match base's non-key columns.
    * Ties on (key, seq) break deterministically: delete loses to upsert.
    */
  def applyChanges(
      base: DataFrame, changes: DataFrame,
      key: String, seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val payloadCols = base.columns.filter(_ != key).toSeq
    // Last change per key. op DESC after seq DESC: "upsert" > "delete"
    // lexicographically, so an (impossible-in-practice) same-seq tie
    // resolves to the upsert — matching the documented contract.
    val w = Window.partitionBy(key).orderBy(col(seqCol).desc, col(opCol).desc)
    val winner = changes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val upserts = winner.filter(col(opCol) === "upsert")
      .select(col(key) +: payloadCols.map(col): _*)
    // Broadcast the winner keys when the log plausibly fits an executor —
    // drops every touched key from base in one pass without shuffling the
    // base side (the common CDC case: log ≪ base). The hint is GATED on
    // the optimizer's size estimate of the log: a change log past the
    // broadcast limit must degrade to a hash anti-join, not fail the job.
    // The key projection is a fraction of the full log row, so the gate
    // allows 32× the session's autoBroadcastJoinThreshold before falling
    // back (well under the 8 GB hard broadcast cap at the 10 MB default).
    val keys = winner.select(key)
    val threshold =
      base.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val logBytes = changes.queryExecution.optimizedPlan.stats.sizeInBytes
    val antiSide =
      if (threshold > 0 && logBytes <= BigInt(threshold) * 32) broadcast(keys)
      else keys
    base.join(antiSide, Seq(key), "left_anti")
      .unionByName(upserts)
  }
}
