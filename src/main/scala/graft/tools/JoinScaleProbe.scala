package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{AsofJoin, RangeJoin}

/** Dev tool: scale probe for the time-series joins beyond the fixture.
  * Synthesizes n clicks + n purchases over n/100 users with
  * hash-uniform timestamps in a 30-day window, then measures:
  *
  *  - as-of join (every purchase → latest prior click): wall time plus a
  *    zero-violation invariant count (no matched click after its
  *    purchase);
  *  - range join (purchases into 1h windows opened at every 50th click):
  *    wall time, match count, and the bin replication factor (bins per
  *    interval — the number that decides shuffle width at scale).
  *
  * Both joins are one-shuffle shapes, so doubling n should double wall
  * time, not square it. Run at two sizes to see the curve:
  *   tools/run.sh graft.tools.JoinScaleProbe 1000000
  *   tools/run.sh graft.tools.JoinScaleProbe 4000000
  */
object JoinScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000000
    val users = math.max(n / 100, 1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val spanUs = 30L * 24 * 3600 * 1000000 // 30 days of microseconds
    def synth(salt: Int) = spark.range(n).select(
      col("id").as("event_id"),
      pmod(xxhash64(col("id"), lit(salt)), lit(users)).as("user_id"),
      pmod(xxhash64(col("id"), lit(salt + 7)), lit(spanUs)).as("us"))
    val clicks = synth(1)
      .groupBy("user_id", "us").agg(max("event_id").as("click_id"))
      .withColumn("click_us", col("us")).cache()
    val purchases = synth(2)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("us"))
      .cache()
    clicks.count(); purchases.count() // exclude synthesis from timings

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val asof = AsofJoin.asof(purchases, clicks, Seq("user_id"), "us").cache()
    val (nAsof, tAsof) = time(asof.count())
    val matched = asof.filter(col("click_id").isNotNull)
    val nMatched = matched.count()
    val violations = matched.filter(col("click_us") > col("us")).count()

    val winUs = 3600L * 1000000
    val intervals = clicks.filter(col("click_id") % 50 === 0)
      .select(col("click_id").as("window_id"), col("user_id"),
        col("click_us").as("win_start"),
        (col("click_us") + winUs).as("win_end")).cache()
    val nIntervals = intervals.count()
    val (nRange, tRange) = time(RangeJoin.pointInInterval(
      purchases.withColumnRenamed("us", "p_us"), intervals, Seq("user_id"),
      "p_us", "win_start", "win_end", binWidth = winUs).count())

    println(s"""{"probe":"joins","n_per_side":$n,"users":$users,""" +
      s""""asof_rows":$nAsof,"asof_matched":$nMatched,""" +
      s""""asof_violations":$violations,"asof_sec":$tAsof,""" +
      s""""range_windows":$nIntervals,"range_matches":$nRange,""" +
      s""""bins_per_interval":2,"range_sec":$tRange}""")

    // Skew leg: HALF of all events land on user 0 (a bot). The plain asof
    // serializes that user into one sorted task; the bucketed form splits
    // it across time bins — same result (property-gated), parallel again.
    def skewed(salt: Int) = spark.range(n).select(
      col("id").as("event_id"),
      when(xxhash64(col("id"), lit(salt + 13)) % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id"), lit(salt)), lit(users))).as("user_id"),
      pmod(xxhash64(col("id"), lit(salt + 7)), lit(spanUs)).as("us"))
    val sClicks = skewed(1)
      .groupBy("user_id", "us").agg(max("event_id").as("click_id")).cache()
    val sPurch = skewed(2)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("us"))
      .cache()
    sClicks.count(); sPurch.count()
    // count the MATCHED rows so the carried payload (and with it the
    // window) cannot be pruned out of the measured plan
    val (nPlain, tPlain) = time(
      AsofJoin.asof(sPurch, sClicks, Seq("user_id"), "us")
        .filter(col("click_id").isNotNull).count())
    val (nBuck, tBuck) = time(AsofJoin.asofBucketed(
      sPurch, sClicks, Seq("user_id"), "us", bucketWidth = spanUs / 64)
      .filter(col("click_id").isNotNull).count())
    println(s"""{"probe":"asof_skew","n_per_side":$n,"hot_share":0.5,""" +
      s""""plain_rows":$nPlain,"plain_sec":$tPlain,""" +
      s""""bucketed_rows":$nBuck,"bucketed_sec":$tBuck}""")

    // Funnel leg (ops/Funnel): synthetic view/click/purchase stream over
    // the same user population; measures the per-step-aggregate plan's
    // wall and asserts the step counts are monotone non-increasing (the
    // funnel invariant) with step 1 equal to the number of users that
    // ever view — an independent count.
    val types = array(lit("view"), lit("click"), lit("purchase"))
    val fEvents = spark.range(3L * n).select(
      pmod(xxhash64(col("id"), lit(31)), lit(users)).as("user_id"),
      pmod(xxhash64(col("id"), lit(37)), lit(spanUs)).as("us"),
      element_at(types,
        (pmod(xxhash64(col("id"), lit(41)), lit(3)) + 1).cast("int"))
        .as("event_type")).cache()
    fEvents.count()
    val (fRow, tFunnel) = time(graft.ops.Funnel.funnelCounts(
      fEvents, Seq("view", "click", "purchase"),
      windowUs = 24L * 3600 * 1000000).head())
    val (f1, f2, f3) = (fRow.getLong(0), fRow.getLong(1), fRow.getLong(2))
    val viewers = fEvents.filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(f1 == viewers, s"step-1 count $f1 != distinct viewers $viewers")
    assert(f1 >= f2 && f2 >= f3, s"funnel not monotone: $f1 $f2 $f3")
    println(s"""{"probe":"funnel","n_events":${3L * n},"users":$users,""" +
      s""""n_view":$f1,"n_click":$f2,"n_purchase":$f3,"sec":$tFunnel}""")

    // Retention leg (the q_events_retention shape): cohort by first-
    // activity epoch-week over the same synthetic stream. Invariants: the
    // offset-0 cell of every cohort retains 100% by construction (a
    // user's first week IS activity), and summed cohort sizes equal the
    // distinct-user count.
    val weekUs = 7L * 24 * 3600 * 1000000
    val rEvents = fEvents.select(col("user_id"),
      (col("us") - (col("us") % weekUs)).divide(weekUs).cast("long").as("wk"))
    val t2 = System.nanoTime()
    val activeW = rEvents.distinct()
    val cohortW = activeW.groupBy("user_id").agg(min("wk").as("c_wk"))
    val sizesW = cohortW.groupBy("c_wk").agg(count(lit(1)).as("n_cohort"))
    val cells = activeW.join(cohortW, "user_id")
      .groupBy(col("c_wk"), (col("wk") - col("c_wk")).as("off"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizesW, "c_wk").cache()
    val nCells = cells.count()
    val tRet = (System.nanoTime() - t2) / 1e9
    val offZeroBad = cells
      .filter(col("off") === 0 && col("n_active") =!= col("n_cohort")).count()
    val cohortSum = sizesW.agg(sum("n_cohort")).head().getLong(0)
    val nUsers = rEvents.select("user_id").distinct().count()
    println(s"""{"probe":"retention","n_events":${3L * n},"cells":$nCells,""" +
      s""""off0_violations":$offZeroBad,"cohort_sum":$cohortSum,""" +
      s""""distinct_users":$nUsers,"sec":$tRet}""")
    assert(offZeroBad == 0, "offset-0 retention must be 100%")
    assert(cohortSum == nUsers, "cohort sizes must partition the users")

    // AQE skew-join leg: the complementary case to asofBucketed — for
    // shuffled JOINS (not windows) Spark's AQE already splits skewed
    // partitions at runtime. Verify the engine's config actually fires it
    // on a 50%-hot-key shuffle join, so the division of labor is proven:
    // joins → AQE, windows → asofBucketed.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // payload must be INCOMPRESSIBLE and must survive the join, or the hot
    // partition's identical keys LZ4 away to under the skew threshold
    val fact = skewed(21)
      .withColumn("payload", md5(col("event_id").cast("string")))
    val dim = spark.range(users)
      .select(col("id").as("user_id"), (col("id") % 7).as("segment"))
    val joined = fact.join(dim, Seq("user_id"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n"), max(length(col("payload"))).as("plen"))
    val (nJoin, tJoin) = time(joined.collect().length)
    val finalPlan = joined.queryExecution.executedPlan.toString
    val skewHandled = finalPlan.contains("skew=true")
    if (sys.env.contains("GRAFT_DEBUG_PLAN")) println(finalPlan.take(4000))
    println(s"""{"probe":"aqe_skew_join","n_per_side":$n,""" +
      s""""rows":$nJoin,"sec":$tJoin,"aqe_split_fired":$skewHandled}""")
    spark.stop()
  }
}
