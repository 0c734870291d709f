package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered window-funnel over an event log (the shape ClickHouse exposes as
  * `windowFunnel`, here as a composable DataFrame transform): how many users
  * completed step1 → step2 → … → stepN, each step STRICTLY after the
  * previous one and all inside a window anchored at the user's FIRST step1.
  *
  * Built from per-step user-level aggregates instead of a per-user sequence
  * scan: step k reduces the event log to at most one row per user (the
  * minimum qualifying timestamp), and step k+1 joins that users-sized frame
  * back to its own filtered slice of the log. At 100 TB each step is one
  * pushed-down filter + partial-agg shuffle on the user key, every join's
  * build side is bounded by the number of users still in the funnel
  * (monotonically shrinking — AQE broadcasts the tail steps), and no
  * per-user event array is ever materialized. Timestamps are exact integer
  * µs end to end, so the result hash-matches a pure-SQL replay.
  *
  * Boundary semantics (spec-gated in FunnelSpec):
  *   - strict order: an event at exactly the previous step's timestamp does
  *     NOT advance the funnel (`us > prev_us`);
  *   - inclusive window: an event exactly `windowUs` after the first step1
  *     still counts (`us <= anchor + windowUs`);
  *   - the anchor is the first step1 even if a later step1 would have led
  *     to a completed funnel (the min-anchored form, chosen for its
  *     one-aggregate-per-step plan).
  */
object Funnel {

  /** Per-step reach frames: frame i has one row per user that reached step
    * i+1, columns `user`, `anchor_us`, `step_us` (that step's qualifying
    * minimum timestamp). */
  private def stepFrames(
      events: DataFrame,
      steps: Seq[String],
      windowUs: Long,
      userCol: String,
      usCol: String,
      typeCol: String): Seq[DataFrame] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val e = events.select(
      col(userCol).as("user"), col(usCol).as("us"), col(typeCol).as("et"))
    val first = e.filter(col("et") === steps.head)
      .groupBy("user").agg(min("us").as("step_us"))
      .withColumn("anchor_us", col("step_us"))
    steps.tail.scanLeft(first) { (prev, step) =>
      e.filter(col("et") === step)
        .join(prev.select(col("user"), col("anchor_us"),
          col("step_us").as("prev_us")), "user")
        .filter(col("us") > col("prev_us") &&
          col("us") <= col("anchor_us") + windowUs)
        .groupBy("user")
        .agg(min("us").as("step_us"), min("anchor_us").as("anchor_us"))
    }
  }

  /** One row per user that reached step 1, with the qualifying timestamp of
    * every reached step: `user`, `step_1_us` … `step_N_us` (null once the
    * funnel is dropped). */
  def funnelSteps(
      events: DataFrame,
      steps: Seq[String],
      windowUs: Long,
      userCol: String = "user_id",
      usCol: String = "us",
      typeCol: String = "event_type"): DataFrame = {
    val frames = stepFrames(events, steps, windowUs, userCol, usCol, typeCol)
    val base = frames.head.select(col("user"), col("step_us").as("step_1_us"))
    frames.zipWithIndex.tail.foldLeft(base) { case (acc, (f, i)) =>
      acc.join(f.select(col("user"), col("step_us").as(s"step_${i + 1}_us")),
        Seq("user"), "left")
    }
  }

  /** One-row funnel summary: `n_step_1 … n_step_N` user counts. */
  def funnelCounts(
      events: DataFrame,
      steps: Seq[String],
      windowUs: Long,
      userCol: String = "user_id",
      usCol: String = "us",
      typeCol: String = "event_type"): DataFrame = {
    val wide = funnelSteps(events, steps, windowUs, userCol, usCol, typeCol)
    wide.agg(
      count(col("step_1_us")).as("n_step_1"),
      steps.indices.tail
        .map(i => count(col(s"step_${i + 1}_us")).as(s"n_step_${i + 1}")): _*)
  }
}
