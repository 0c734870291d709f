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

  /** Tag, null-pad and union the two sides so they share one schema:
    * (keys…, ts, leftOnly…, payload…, __side 0=right/1=left). */
  private def tagged(
      left: DataFrame, right: DataFrame, keys: Seq[String], ts: String)
      : (DataFrame, Seq[String], Seq[String]) = {
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
    (lSel.unionAll(rSel), payload, leftOnly)
  }

  /** Left rows with the payload columns of the matching right row
    * appended (null where no right row precedes). `keys` and `ts` must
    * exist on both sides; every other right column is payload and must
    * not collide with a left column name. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String): DataFrame = {
    val (all, payload, _) = tagged(left, right, keys, ts)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The payload is carried as ONE struct, not per column: a right row's
    // struct is non-null even when its fields are null, so a NULL field in
    // the latest right row is carried as NULL instead of being shadowed by
    // an older row's value (per-column last(ignoreNulls) would stitch
    // fields from DIFFERENT right rows — not ASOF semantics).
    val packed = all.withColumn("__p",
      when(col("__side") === 0, struct(payload.map(col): _*)))
    val carried = packed
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val unpacked = payload.foldLeft(carried) { (d, c) =>
      d.withColumn(c, col(s"__p.$c"))
    }
    unpacked.filter(col("__side") === 1).drop("__side", "__p")
  }

  /** Skew-proof [[asof]]: identical semantics, but a hot key no longer
    * serializes into one task. [[asof]]'s window sorts each key's ENTIRE
    * history in a single partition — at 100 TB one bot user becomes the
    * straggler that AQE cannot split (skew-join splitting does not apply
    * to windows). This variant is the classic parallel prefix-scan
    * decomposition:
    *
    *  1. slice time into `bucketWidth` bins and run the carry window per
    *     (key, bin) — the hot key's history now spreads over its bins,
    *     each a separately-sorted task;
    *  2. reduce each bin to its LAST right row (an aggregate with
    *     map-side partials — skew-cheap);
    *  3. prefix-carry those bin summaries per key over bins strictly
    *     before (a window over #bins rows, not #events);
    *  4. join the carry back on (key, bin) — co-partitioned with step 1 —
    *     and take the in-bin match when present, the carried one
    *     otherwise.
    *
    * Cost: two narrow shuffles and one tiny window instead of one skewed
    * sort. Equality with [[asof]] for every bucketWidth is gated by a
    * random-corpus property test. */
  def asofBucketed(
      left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val (tag, payload, _) = tagged(left, right, keys, ts)
    val all = tag
      .withColumn("__bin", expr(s"$ts div ${bucketWidth}L"))
      // atomic payload struct, same rationale as in [[asof]]
      .withColumn("__p",
        when(col("__side") === 0, struct(payload.map(col): _*)))
    val binKeys = (keys :+ "__bin").map(col)

    // 1. in-bin carry (rights sort before lefts at equal ts, as in asof)
    val wBin = Window.partitionBy(binKeys: _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBin = all.withColumn("__in",
      last(col("__p"), ignoreNulls = true).over(wBin))

    // 2. each bin's last right row as one struct (rights are unique per
    //    (key, ts)), so fields can never mix across rows
    val lastRight = all.filter(col("__side") === 0)
      .groupBy(binKeys: _*)
      .agg(expr(s"max_by(__p, $ts)").as("__last"))

    // 3. prefix-carry bin summaries per key over STRICTLY earlier bins;
    //    the directory of bins comes from the data itself so lefts in
    //    right-free bins still receive a carry
    val bins = all.select(binKeys: _*).distinct()
    val wPrev = Window.partitionBy(keys.map(col): _*).orderBy(col("__bin").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bins.join(lastRight, keys :+ "__bin", "left")
      .withColumn("__prev", last(col("__last"), ignoreNulls = true).over(wPrev))
      .select((keys :+ "__bin").map(col) :+ col("__prev"): _*)

    // 4. in-bin match wins; otherwise the carry from earlier bins
    val resolved = payload.foldLeft(
      inBin.join(carry, keys :+ "__bin")
        .withColumn("__f", coalesce(col("__in"), col("__prev")))) { (d, c) =>
      d.withColumn(c, col(s"__f.$c"))
    }
    resolved.filter(col("__side") === 1)
      .drop("__side", "__bin", "__p", "__in", "__prev", "__f")
  }
}
