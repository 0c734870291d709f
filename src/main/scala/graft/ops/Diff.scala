package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: classify every key across two versions of a table as
  * added / removed / changed / unchanged — the regression check a data
  * pipeline runs between yesterday's and today's landed snapshot, and the
  * inverse of [[Merge.applyChanges]] (diff(base, apply(base, log)) recovers
  * the log's net effect).
  *
  * Scale shape: ONE full-outer hash join keyed on `key`; payload equality
  * is EXACT (null-safe struct compare — same policy as the engine's
  * bit-exact deduplicate: a digest compare would misclassify a 64-bit
  * collision as unchanged). The payload crosses the shuffle once per side,
  * as in any join of the two snapshots; callers diffing very wide tables
  * can pre-project the columns that matter. For repeated diffs of the same
  * table family, bucket both snapshots by `key` and the join plans with
  * zero Exchange (tools/BucketProbe).
  */
object Diff {

  /** (key columns..., change_type) for every key present in either side.
    * Column sets of `old` and `neu` must match. */
  def snapshotDiff(old: DataFrame, neu: DataFrame, key: Seq[String]): DataFrame = {
    val payload = old.columns.filterNot(key.contains).toSeq
    require(payload.nonEmpty, "diff needs at least one non-key column")
    def packed(df: DataFrame, tag: String) =
      df.select(
        key.map(col) :+
          struct(payload.map(col): _*).as(s"p_$tag"): _*)
    packed(old, "old")
      .join(packed(neu, "new"), key, "full_outer")
      .select(
        key.map(col) :+
          when(col("p_old").isNull, "added")
            .when(col("p_new").isNull, "removed")
            .when(col("p_old") <=> col("p_new"), "unchanged")
            .otherwise("changed").as("change_type"): _*)
  }
}
