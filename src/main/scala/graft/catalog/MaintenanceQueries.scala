package graft.catalog

import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.Tables
import graft.ops.{Incremental, SemiFilter}

/** Catalog twins for the incremental-maintenance operators
  * (`ops/Incremental.scala`) and the explicit semi-join reduction
  * (`ops/SemiFilter.scala`). The rollup entry's oracle RECOMPUTES the
  * aggregate from scratch over the full table, so the hash gate proves the
  * partial-state merge algebra — the property that lets a 100 TB pipeline
  * absorb a delta without re-reading the base. The Bloom entry's oracle is
  * the plain join, proving the pre-filter lossless.
  */
object MaintenanceQueries {

  /** Incremental rollup refresh: materialize the aggregate over ~97% of
    * lineitem, absorb the remaining ~3% as a delta batch through
    * `refreshRollup`, and gate against DuckDB aggregating the WHOLE table
    * in one pass. All-integer measures (cent-scaled) — no float
    * accumulation risk. */
  val rollupIncremental = Q(
    "q_rollup_incremental",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        col("l_orderkey"),
        expr("cast(round(l_quantity * 100) as bigint)").as("qty_c"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("price_c"))
      val baseAgg = li.filter(col("l_orderkey") % 37 =!= 0)
        .groupBy("rf", "ls")
        .agg(count(lit(1)).as("n"), sum("qty_c").as("sum_qty_c"),
          sum("price_c").as("sum_price_c"))
      val delta = li.filter(col("l_orderkey") % 37 === 0)
      Incremental.refreshRollup(baseAgg, delta, keys = Seq("rf", "ls"),
        sumCols = Seq("qty_c", "price_c"))
        .orderBy("rf", "ls")
    },
    Some("""
      SELECT l_returnflag AS rf, l_linestatus AS ls, count(*)::BIGINT AS n,
             sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sum_qty_c,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
               AS sum_price_c
      FROM lineitem GROUP BY rf, ls ORDER BY rf, ls"""))

  /** SCD2 historization over a 3-wave upsert log on an orders subset.
    * Wave 1 repeats the unchanged payload for k%10=5 keys — those rows
    * must COLLAPSE (consecutive-dedup), which the version numbering then
    * witnesses. Intervals are [valid_from, valid_to) in seq units;
    * valid_to null = current. */
  val scd2History = Q(
    "q_scd2_history",
    (s, dir) => {
      val base = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").as("price"))
      val h = col("k") % 10
      val log = base.select(col("k"), lit(0).as("seq"), col("st"), col("price"))
        .unionByName(base.filter(h.isin(0, 1)).select(col("k"),
          lit(1).as("seq"), col("st"), (col("price") + 1000).as("price")))
        .unionByName(base.filter(h === 5).select(col("k"),
          lit(1).as("seq"), col("st"), col("price")))
        .unionByName(base.filter(h.isin(1, 3)).select(col("k"),
          lit(2).as("seq"), col("st"), lit(42.0).as("price")))
      Incremental.scd2(log, key = "k", seq = "seq",
        payloadCols = Seq("st", "price"))
        .select(col("k"), col("ver"), col("valid_from").cast("long").as("valid_from"),
          col("valid_to").cast("long").as("valid_to"), col("is_current"),
          col("st"), expr("cast(round(price * 100) as bigint)").as("price_c"))
        .orderBy("k", "ver")
    },
    Some("""
      WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                           o_totalprice AS price
                    FROM orders WHERE o_orderkey % 4 = 0),
      log AS (SELECT k, 0 AS seq, st, price FROM base
              UNION ALL SELECT k, 1, st, price + 1000 FROM base
              WHERE k % 10 IN (0, 1)
              UNION ALL SELECT k, 1, st, price FROM base WHERE k % 10 = 5
              UNION ALL SELECT k, 2, st, 42.0 FROM base
              WHERE k % 10 IN (1, 3)),
      ch AS (SELECT *, lag(st) OVER w AS pst, lag(price) OVER w AS pprice,
                    row_number() OVER w AS rn
             FROM log WINDOW w AS (PARTITION BY k ORDER BY seq)),
      kept AS (SELECT k, seq, st, price FROM ch
               WHERE rn = 1
                  OR NOT (st IS NOT DISTINCT FROM pst
                          AND price IS NOT DISTINCT FROM pprice)),
      scd AS (SELECT k, row_number() OVER w AS ver, seq AS valid_from,
                     lead(seq) OVER w AS valid_to, st, price
              FROM kept WINDOW w AS (PARTITION BY k ORDER BY seq))
      SELECT k, ver::BIGINT AS ver, valid_from::BIGINT AS valid_from,
             valid_to::BIGINT AS valid_to, (valid_to IS NULL) AS is_current,
             st, CAST(round(price * 100) AS BIGINT) AS price_c
      FROM scd ORDER BY k, ver"""))

  /** Point-in-time (time-travel) lookup against the SCD2 history: each
    * probe (k, at = k % 3) resolves to the version valid at `at`. Key
    * equi-join + interval residual — fan-out bounded by history depth.
    * Probes at seq 0 hit version 1; probes after a change hit the newer
    * version; k%10=5 keys (whose wave-1 upsert collapsed) resolve to
    * their single version at every probe time. */
  val scd2AsofLookup = Q(
    "q_scd2_asof_lookup",
    (s, dir) => {
      val base = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").as("price"))
      val h = col("k") % 10
      val log = base.select(col("k"), lit(0).as("seq"), col("st"), col("price"))
        .unionByName(base.filter(h.isin(0, 1)).select(col("k"),
          lit(1).as("seq"), col("st"), (col("price") + 1000).as("price")))
        .unionByName(base.filter(h === 5).select(col("k"),
          lit(1).as("seq"), col("st"), col("price")))
        .unionByName(base.filter(h.isin(1, 3)).select(col("k"),
          lit(2).as("seq"), col("st"), lit(42.0).as("price")))
      val history = Incremental.scd2(log, key = "k", seq = "seq",
        payloadCols = Seq("st", "price"))
      val probes = base.select(col("k"), (col("k") % 3).cast("int").as("at"))
      Incremental.asOfLookup(history, probes, key = "k", atCol = "at")
        .select(col("k"), col("at").cast("long").as("at"), col("ver"),
          col("st"), expr("cast(round(price * 100) as bigint)").as("price_c"))
        .orderBy("k")
    },
    Some("""
      WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                           o_totalprice AS price
                    FROM orders WHERE o_orderkey % 4 = 0),
      log AS (SELECT k, 0 AS seq, st, price FROM base
              UNION ALL SELECT k, 1, st, price + 1000 FROM base
              WHERE k % 10 IN (0, 1)
              UNION ALL SELECT k, 1, st, price FROM base WHERE k % 10 = 5
              UNION ALL SELECT k, 2, st, 42.0 FROM base
              WHERE k % 10 IN (1, 3)),
      ch AS (SELECT *, lag(st) OVER w AS pst, lag(price) OVER w AS pprice,
                    row_number() OVER w AS rn
             FROM log WINDOW w AS (PARTITION BY k ORDER BY seq)),
      kept AS (SELECT k, seq, st, price FROM ch
               WHERE rn = 1
                  OR NOT (st IS NOT DISTINCT FROM pst
                          AND price IS NOT DISTINCT FROM pprice)),
      scd AS (SELECT k, row_number() OVER w AS ver, seq AS valid_from,
                     lead(seq) OVER w AS valid_to, st, price
              FROM kept WINDOW w AS (PARTITION BY k ORDER BY seq)),
      probes AS (SELECT k, k % 3 AS at FROM base)
      SELECT p.k, p.at::BIGINT AS at, s.ver::BIGINT AS ver, s.st,
             CAST(round(s.price * 100) AS BIGINT) AS price_c
      FROM probes p JOIN scd s
        ON s.k = p.k AND s.valid_from <= p.at
       AND (s.valid_to IS NULL OR p.at < s.valid_to)
      ORDER BY p.k"""))

  /** Bloom-prefiltered dimension join: high-balance suppliers' lineitem
    * revenue. The oracle runs the plain join — the gate proves the Bloom
    * pre-filter drops nothing true (false positives die in the real
    * join). */
  val bloomPrefilter = Q(
    "q_bloom_prefilter_join",
    (s, dir) => {
      val fact = Tables.lineitem(s, dir).select(col("l_suppkey"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("price_c"))
      val dim = Tables.supplier(s, dir)
        .filter(col("s_acctbal") > 4500)
        .select(col("s_suppkey"), col("s_name"))
      SemiFilter.bloomPrefilterJoin(fact, dim, "l_suppkey", "s_suppkey",
        expectedKeys = math.max(1L, dim.count()), fpp = 0.01)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n"), sum("price_c").as("sum_price_c"))
        .orderBy("s_name")
    },
    Some("""
      SELECT s_name, count(*)::BIGINT AS n,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
               AS sum_price_c
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_acctbal > 4500
      GROUP BY s_name ORDER BY s_name"""))

  def qs: Seq[Q] = Seq(rollupIncremental, scd2History, scd2AsofLookup,
    bloomPrefilter)
}
