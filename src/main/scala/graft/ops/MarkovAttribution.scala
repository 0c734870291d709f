package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Markov-chain REMOVAL-EFFECT attribution — the data-driven member of the
  * attribution family (first/last/linear in `q_events_attribution`,
  * time-decay in `q_events_attribution_decay` are position heuristics; the
  * removal effect asks what the chain itself says a channel is worth):
  * model every user journey as a first-order Markov walk over channel
  * states with two absorbing states (`conv`, `null`), compute the
  * probability of absorbing at `conv` from `start`, then re-compute it
  * with each channel "removed" (entering it means never converting) — the
  * drop is that channel's removal effect, and credit shares are the
  * normalized drops (Anderl et al. 2014's standard formulation).
  *
  * Exactness contract (the hash-gate policy of [[Graph.pagerankInt]] and
  * [[KCenter]]): absorption probabilities are integer BASIS POINTS and the
  * fixed point is the K-step truncated iterate
  *
  *   p_0(s)   = 0
  *   p_k+1(s) = (n(s→conv)·10000 + Σ_t n(s→t)·p_k(t)) div n_out(s)
  *
  * (monotone nondecreasing from 0, bounded by 10000, every step integer
  * division) — bit-identical on any engine and any aggregation order, so
  * the DuckDB oracle replays the identical recurrence as K unrolled CTEs
  * over a (chain, state) grid ([[oracleSql]]). Removing channel c is
  * EXACTLY pinning p(c) = 0 inside the iteration: redirecting c's inbound
  * edges to `null` changes nothing else. Pinning also preserves
  * p_removed ≤ p_full at every step (same denominators, numerators
  * pointwise ≤, div monotone), so removal effects are provably
  * nonnegative despite truncation.
  *
  * Scale shape: the ONLY corpus-scale work is journey extraction — one
  * user-keyed window pass (lag/lead + row_number over lookback-bounded
  * touch lists, the `q_events_transitions` shape) feeding a partial-agg
  * count to the (channels+1)×(channels+2) transition grid. That grid is
  * collected (bounded by the channel vocabulary squared — same bound as
  * the transitions entry's OUTPUT) and the K·|channels|·|chains| integer
  * iteration runs on the driver: at 100 TB the chain solve costs
  * microseconds while events never shuffle twice. Long arithmetic is
  * exact to n(s→t) ≤ ~9·10¹⁴ edges per cell (n·10⁴ must fit 2⁶³);
  * beyond that, scale the grid counts down before solving.
  */
object MarkovAttribution {

  /** Per-channel removal effects over `events(user_id, us, event_id,
    * event_type)`: touches are `channelTypes` events; conversion is the
    * user's FIRST `convType` event; a converter's journey is its
    * lookback-window touches before that conversion (ending → `conv`),
    * a non-converter's journey is all its touches (ending → `null`);
    * converters with no in-window touch contribute `start → conv`;
    * touchless non-converters have an empty walk and drop out. Returns
    * one row per channel: (channel, p_full_bp, p_removed_bp, removal_bp,
    * share_bp) where share_bp splits 10000 by removal effect (remainder
    * to the largest effects, channel-name tiebreak). */
  def removalEffects(
      events: DataFrame,
      channelTypes: Seq[String] = Seq("view", "click"),
      convType: String = "purchase",
      lookbackUs: Long = 7L * 86400000000L,
      iters: Int = 64): DataFrame = {
    val s = events.sparkSession
    val e = events.select(col("user_id"), col("us"), col("event_id"),
      col("event_type"))
    val conv = e.filter(col("event_type") === convType)
      .groupBy("user_id").agg(min("us").as("c_us"))
    val touches = e.filter(col("event_type").isin(channelTypes: _*))
      .join(conv, Seq("user_id"), "left")
      .filter(col("c_us").isNull ||
        (col("us") < col("c_us") && col("us") >= col("c_us") - lookbackUs))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val r = touches
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead("event_type", 1).over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
    val edges = r.filter(col("rn") === 1)
      .select(lit("start").as("f"), col("event_type").as("t2"))
      .unionAll(r.filter(col("nxt").isNotNull)
        .select(col("event_type").as("f"), col("nxt").as("t2")))
      .unionAll(r.filter(col("rn") === col("n"))
        .select(col("event_type").as("f"),
          when(col("c_us").isNotNull, "conv").otherwise("null").as("t2")))
      .unionAll(conv
        .join(touches.select("user_id").distinct(), Seq("user_id"),
          "left_anti")
        .select(lit("start").as("f"), lit("conv").as("t2")))
    // Bounded collect: the grid is (|channels|+1)·(|channels|+2) rows —
    // the same vocabulary-squared bound q_events_transitions EMITS.
    val grid = edges.groupBy("f", "t2").agg(count(lit(1)).as("n"))
      .collect()
      .map(row => (row.getString(0), row.getString(1)) -> row.getLong(2))
      .toMap
    val states = grid.keys.map(_._1).filter(_ != "start").toSeq.sorted
    val nOut = grid.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val schema = StructType(Seq(
      StructField("channel", StringType, nullable = false),
      StructField("p_full_bp", LongType, nullable = false),
      StructField("p_removed_bp", LongType, nullable = false),
      StructField("removal_bp", LongType, nullable = false),
      StructField("share_bp", LongType, nullable = false)))
    // no journeys at all (empty frame, or nothing matching the channel/
    // conversion types): zero rows, not a key-not-found crash on 'start'
    if (states.isEmpty || !nOut.contains("start"))
      return s.createDataFrame(
        s.sparkContext.emptyRDD[Row], schema)

    def absorb(removed: Option[String]): Long = {
      var p = states.map(_ -> 0L).toMap
      for (_ <- 1 to iters) {
        p = states.map { st =>
          st -> (if (removed.contains(st)) 0L
                 else {
                   val num = grid.getOrElse((st, "conv"), 0L) * 10000L +
                     states.map(t => grid.getOrElse((st, t), 0L) * p(t)).sum
                   num / nOut(st)
                 })
        }.toMap
      }
      (grid.getOrElse(("start", "conv"), 0L) * 10000L +
        states.map(t => grid.getOrElse(("start", t), 0L) * p(t)).sum) /
        nOut("start")
    }

    val pFull = absorb(None)
    val removed = states.map(c => c -> absorb(Some(c))).toMap
    val eff = states.map(c => c -> (pFull - removed(c))).toMap
    val total = eff.values.sum
    val baseShare =
      states.map(c => c -> (if (total == 0L) 0L else eff(c) * 10000L / total))
        .toMap
    val rem = if (total == 0L) 0L else 10000L - baseShare.values.sum
    val ranked = states.sortBy(c => (-eff(c), c)).zipWithIndex.toMap
    val rows = states.map { c =>
      Row(c, pFull, removed(c), eff(c),
        baseShare(c) + (if (ranked(c) < rem) 1L else 0L))
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
      .orderBy("channel")
  }

  /** The unrolled-CTE DuckDB replay of [[removalEffects]] over an edge
    * relation — callers prepend CTEs defining `edges(f, t2)` (one row per
    * journey transition, absorbing states 'conv'/'null', virtual source
    * 'start'). Kept beside the operator so the recurrences can be read
    * side by side. */
  def oracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""it$k AS MATERIALIZED (
           SELECT g.chain, g.state,
                  (CASE WHEN g.chain = 'rm_' || g.state THEN 0
                        ELSE (g.cn * 10000 + coalesce(a.acc, 0)) // g.n_out
                   END)::BIGINT AS p
           FROM gbase g LEFT JOIN (
             SELECT p.chain, c.f AS state, sum(c.n * p.p) AS acc
             FROM cnt c JOIN it${k - 1} p ON p.state = c.t2
             GROUP BY 1, 2) a
             ON a.chain = g.chain AND a.state = g.state)"""
    }.mkString(",\n")
    s"""
      cnt AS MATERIALIZED (SELECT f, t2, count(*)::BIGINT AS n FROM edges GROUP BY 1, 2),
      outdeg AS MATERIALIZED (SELECT f, sum(n)::BIGINT AS n_out FROM cnt GROUP BY f),
      states AS MATERIALIZED (SELECT DISTINCT f AS state FROM cnt WHERE f <> 'start'),
      chains AS MATERIALIZED (SELECT 'full' AS chain
                 UNION ALL SELECT 'rm_' || state FROM states),
      gbase AS MATERIALIZED (SELECT ch.chain, st.state, coalesce(cv.n, 0) AS cn, o.n_out
                FROM chains ch CROSS JOIN states st
                JOIN outdeg o ON o.f = st.state
                LEFT JOIN cnt cv ON cv.f = st.state AND cv.t2 = 'conv'),
      it0 AS MATERIALIZED (SELECT chain, state, 0::BIGINT AS p
              FROM chains CROSS JOIN states),
      $rounds,
      pstart AS MATERIALIZED (
        SELECT ch.chain,
               ((coalesce((SELECT n FROM cnt
                          WHERE f = 'start' AND t2 = 'conv'), 0) * 10000
                + coalesce(sum(c.n * p.p), 0))
               // (SELECT n_out FROM outdeg WHERE f = 'start'))::BIGINT AS p
        FROM chains ch
        LEFT JOIN it$iters p ON p.chain = ch.chain
        LEFT JOIN cnt c ON c.f = 'start' AND c.t2 = p.state
        GROUP BY ch.chain),
      removal AS MATERIALIZED (
        SELECT st.state AS channel,
               (SELECT p FROM pstart WHERE chain = 'full') AS p_full_bp,
               (SELECT p FROM pstart p2
                WHERE p2.chain = 'rm_' || st.state) AS p_removed_bp
        FROM states st),
      shares AS MATERIALIZED (
        SELECT channel, p_full_bp, p_removed_bp,
               p_full_bp - p_removed_bp AS removal_bp,
               (CASE WHEN (SELECT sum(p_full_bp - p_removed_bp)
                           FROM removal) = 0 THEN 0
                    ELSE ((p_full_bp - p_removed_bp) * 10000)
                         // (SELECT sum(p_full_bp - p_removed_bp)
                            FROM removal)
               END)::BIGINT AS share_base,
               row_number() OVER (ORDER BY p_full_bp - p_removed_bp DESC,
                                  channel) AS rk
        FROM removal)"""
  }
}
