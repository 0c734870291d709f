package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the other time-series join Spark's
  * planner handles badly: a raw `p.ts BETWEEN i.start AND i.end` predicate
  * plans as a broadcast-nested-loop or cartesian product, which is
  * O(points × intervals) and dead at scale.
  *
  * Spark-first design: BIN the domain. Every interval is exploded to the
  * ⌈len/binWidth⌉ + 1 bins it overlaps, every point maps to exactly one
  * bin, and the join becomes an EQUI-join on (keys…, bin) that
  * hash-partitions both sides — Catalyst plans a shuffled or broadcast
  * hash join, never a nested loop. The exact `BETWEEN` predicate then
  * filters the bin-colocated candidates. A point meets a qualifying
  * interval in exactly one bin (the point's own), so no dedup is needed
  * and the join is exact, not approximate.
  *
  * Pick `binWidth` near the typical interval length: replication is
  * len/binWidth + 1 copies per interval (2 when len ≤ binWidth), and a
  * bin's candidate set is what bounds per-task work at 100 TB.
  */
object RangeJoin {

  /** All (point, interval) matches with `start <= pt <= end` (inclusive
    * both ends) under equal `keys`. `pt`, `start`, `end` are long-valued
    * columns in the same units; non-key column names must be disjoint
    * across the two inputs. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pt: String, start: String, end: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val collide = points.columns.toSeq.filterNot(keys.contains)
      .intersect(intervals.columns.toSeq.filterNot(keys.contains))
    require(collide.isEmpty, s"non-key columns collide: ${collide.mkString(",")}")
    val binned = intervals.withColumn("__bin",
      explode(sequence(expr(s"$start div $binWidth"), expr(s"$end div $binWidth"))))
    val p = points.withColumn("__bin", expr(s"$pt div $binWidth"))
    p.join(binned, keys :+ "__bin")
      .filter(col(pt).between(col(start), col(end)))
      .drop("__bin")
  }
}
