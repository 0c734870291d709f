package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series join Spark lacks natively (DuckDB
  * `ASOF JOIN`, pandas `merge_asof`, kdb `aj` semantics): for every left
  * row, attach the single most recent right row with `right.ts <= left.ts`
  * under the same key.
  *
  * Spark-first design: NOT a range join (whose candidate set is
  * O(left × right-history) per key before pruning) but a union + ONE
  * window pass. Both sides are tagged, unioned, hash-partitioned by key,
  * sorted by (ts, side), and each left row picks up the latest right
  * payload via `last(_, ignoreNulls = true)` over an unbounded-preceding
  * frame. One shuffle on the key, zero joins, no broadcast: a key's
  * history never leaves its partition and cost is O(n log n) per key no
  * matter how dense the right side is — the same shuffle shape as
  * sessionization, so it survives a 100 TB event log wherever
  * sessionization does.
  *
  * Tie semantics: right rows sort BEFORE left rows at equal ts, so a
  * right row at exactly `left.ts` matches — inclusive `>=`, identical to
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`. The right side must be
  * unique per (key, ts) (pre-aggregate with an arg-max if it is not), or
  * the carried payload is sort-order-nondeterministic.
  */
object AsofJoin {

  /** Left rows with the payload columns of the matching right row
    * appended (null where no right row precedes). `keys` and `ts` must
    * exist on both sides; every other right column is payload and must
    * not collide with a left column name. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String): DataFrame = {
    val payload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == ts)
    val leftOnly = left.columns.toSeq.filterNot(c => keys.contains(c) || c == ts)
    require(payload.nonEmpty, "right side carries no payload columns")
    require(leftOnly.intersect(payload).isEmpty,
      s"right payload ${payload.mkString(",")} collides with left columns")

    val lSel = left.select(
      keys.map(col) ++ Seq(col(ts)) ++ leftOnly.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        Seq(lit(1).as("__side")): _*)
    val rSel = right.select(
      keys.map(col) ++ Seq(col(ts)) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col) ++ Seq(lit(0).as("__side")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Same window spec for every payload column: Catalyst collapses these
    // into a single Window node, so the carried payload costs one sort.
    val carried = payload.foldLeft(lSel.unionAll(rSel)) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }
}
