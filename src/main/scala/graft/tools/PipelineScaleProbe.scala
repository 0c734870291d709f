package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the COMPOSED curation pipeline (doc_pipeline_curate's
  * plan — exact dedup → quality/length gate → lang-ID → per-(source, lang)
  * rollup as ONE Catalyst plan), complementing the per-op probes in
  * TextScaleProbe: operators that each scale can still compose into a plan
  * that doesn't (a bad join order, a lost broadcast, an extra exchange).
  * Synthesizes n docs with a deterministic language prefix (4 stopwords of
  * en/de/fr by id%3 — lang-ID must recover it exactly) over an alphabetic
  * 40-word body (the quality gate must pass everything), 4 sources, plus
  * the pipeline's own simulated re-crawl doubling; asserts the rollup
  * accounts for EVERY doc with 100% language agreement, and reports
  * end-to-end wall at two sizes for the growth ratio.
  *
  * Run: tools/run.sh graft.tools.PipelineScaleProbe 250000 1000000
  */
object PipelineScaleProbe {
  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "dsir") {
      val spark0 = SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8").getOrCreate()
      spark0.sparkContext.setLogLevel("ERROR")
      val base = if (args.length > 1) args(1).toLong else 250000L
      Seq(base, 4 * base).foreach(dsirLeg(spark0, _))
      spark0.stop()
      return
    }
    if (args.nonEmpty && args(0) == "pack") {
      val spark0 = SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8").getOrCreate()
      spark0.sparkContext.setLogLevel("ERROR")
      val base = if (args.length > 1) args(1).toLong else 250000L
      Seq(base, 4 * base).foreach(packLeg(spark0, _))
      spark0.stop()
      return
    }
    if (args.nonEmpty && args(0) == "basketstream") {
      val spark0 = SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8").getOrCreate()
      spark0.sparkContext.setLogLevel("ERROR")
      basketStreamLeg(spark0,
        nPerEpoch = if (args.length > 1) args(1).toInt else 2000,
        epochs = if (args.length > 2) args(2).toInt else 24)
      spark0.stop()
      return
    }
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(250000L, 1000000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val langNames = array(lit("en"), lit("de"), lit("fr"))
    val langPrefix = array(
      lit("the and of it"), lit("der und ist nicht"), lit("le la les pour"))

    for (n <- sizes) {
      val idx = (pmod(col("id"), lit(3)) + 1).cast("int")
      val docs = spark.range(n).select(
        col("id").as("doc_id"),
        element_at(langNames, idx).as("lang"),
        concat(lit("s"), pmod(col("id"), lit(4))).as("source"),
        concat(
          element_at(langPrefix, idx), lit(" "),
          concat_ws(" ", transform(sequence(lit(0), lit(39)),
            j => translate(
              format_string("w%04d", pmod(xxhash64(col("id"), j), lit(2000))),
              "0123456789", "abcdefghij")))).as("text"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .localCheckpoint(eager = true)

      val t0 = System.nanoTime()
      val rollup = graft.catalog.PipelineQueries
        .curateFrom(spark, docs, nearDupDrop = None, recrawlShift = n * 10)
        .collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val nDocs = rollup.map(_.getAs[Long]("n_docs")).sum
      val nMatch = rollup.map(_.getAs[Long]("n_lang_match")).sum
      println(s"""{"probe":"pipeline_curate","n_docs_in":$n,""" +
        s""""crawl_rows":${2 * n},"rollup_rows":${rollup.length},""" +
        s""""n_docs_out":$nDocs,"n_lang_match":$nMatch,""" +
        f""""wall_sec":$wall%.2f}""")
      assert(nDocs == n, s"rollup lost docs: $nDocs != $n")
      assert(nMatch == nDocs, s"lang-ID disagreement: $nMatch != $nDocs")
      System.out.flush()

      // Shard leg: the sampling+packing cascade (doc_pipeline_pretrain's
      // plan — dedup → gate → temperature mix → train split → packing →
      // per-source report). The synthetic corpus passes the gate whole, so
      // the kept-count invariant is independently recomputable: a doc
      // survives iff its md5 mix draw clears its lang's threshold AND its
      // md5 split bucket is train — checked with a SECOND plan that never
      // touches the cascade (same md5 predicates over the raw frame, using
      // the closed-form keep-all thresholds of this corpus's exact-thirds
      // lang balance). Tokens must conserve exactly: sum_tokens equals the
      // independent sum over the kept set.
      val t1 = System.nanoTime()
      val shard = graft.catalog.PipelineQueries
        .shardFrom(spark, docs, recrawlShift = n * 10)
        .collect()
      val shardWall = (System.nanoTime() - t1) / 1e9
      val sDocs = shard.map(_.getAs[Long]("n_docs")).sum
      val sSeqs = shard.map(_.getAs[Long]("n_seqs")).sum
      val sTok = shard.map(_.getAs[Long]("sum_tokens")).sum
      // independent keep-set: lang counts here are exact thirds (rate
      // thresholds derived the same closed-form way temperatureSample
      // does, but over the raw corpus — no pipeline code shared)
      val langCnt = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nMin = langCnt.values.min
      val thrOf = langCnt.map { case (l, c) =>
        l -> (if (nMin >= c) "g"
              else f"${math.floor(math.sqrt(nMin.toDouble / c) * (1 << 24)).toLong}%06x")
      }
      import spark.implicits._
      val indep = docs
        .join(broadcast(thrOf.toSeq.toDF("lang", "thr")), "lang")
        .filter(substring(md5(concat(lit("m"), col("doc_id").cast("string"))), 1, 6)
          < col("thr"))
        .filter(substring(md5(concat(lit("v"), col("doc_id").cast("string"))), 1, 2)
          < "cc")
        .agg(count(lit(1)).as("n"),
          sum(size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"),
            lit(0))).cast("long")).as("tok"))
        .head()
      println(s"""{"probe":"pipeline_shard","n_docs_in":$n,""" +
        s""""n_docs_kept":$sDocs,"n_seqs":$sSeqs,"sum_tokens":$sTok,""" +
        f""""wall_sec":$shardWall%.2f}""")
      assert(sDocs == indep.getLong(0),
        s"shard kept ${sDocs} docs, independent keep-set says ${indep.getLong(0)}")
      assert(sTok == indep.getLong(1),
        s"shard tokens $sTok != independent ${indep.getLong(1)}")
      System.out.flush()

      // v2 leg: the modern cascade (… → bigram-LM filter → token-budget
      // selection → packing). The LM count tables are train-bigram-
      // bounded and the budget stage windows only its bucket histogram,
      // so end-to-end wall should stay ~linear in n. Budget scales with
      // n (n/10 tokens) so the selection stays live at every size;
      // greedy-prefix semantics guarantee the kept mass lands within one
      // doc (≤ 45 tokens here) of the budget when the train mass
      // exceeds it.
      val v2Budget = n / 10
      val t2 = System.nanoTime()
      val v2 = graft.catalog.PipelineQueries
        .shardV2From(docs, recrawlShift = n * 10, budget = v2Budget,
          tauMicro = 80500L, materialize = true) // synthetic-corpus tau:
        // random-draw bigrams score ~8.1 nats (ln(c1+V) smoothing floor);
        // 8.05 keeps the seen-bigram head and drops the unseen tail
        .collect()
      val v2Wall = (System.nanoTime() - t2) / 1e9
      val v2Tok = v2.map(_.getAs[Long]("sum_tokens")).sum
      val v2Docs = v2.map(_.getAs[Long]("n_docs")).sum
      println(s"""{"probe":"pipeline_shard_v2","n_docs_in":$n,""" +
        s""""n_docs_kept":$v2Docs,"sum_tokens":$v2Tok,""" +
        s""""budget":$v2Budget,""" + f""""wall_sec":$v2Wall%.2f}""")
      assert(v2Tok <= v2Budget, s"budget exceeded: $v2Tok > $v2Budget")
      assert(v2Tok > v2Budget - 45,
        s"budget underfilled: $v2Tok vs $v2Budget (boundary should stop " +
          "within one doc of the budget)")
      System.out.flush()

      // ccnet leg: the per-language perplexity bucketing. The scored
      // frame (lang-ID ⋈ LM) is consumed by BOTH the tercile agg and the
      // bucket join, so the probe passes materialize=true (the entry's
      // pure-plan form would re-execute the corpus-sized cascade per
      // consumer); wall should stay ~linear in n, and every language's
      // head/middle/tail partition must cover it.
      val t3 = System.nanoTime()
      val cc = graft.catalog.PipelineQueries
        .ccnetFrom(docs.select("doc_id", "text"), materialize = true)
        .groupBy("pred_lang", "bucket").count()
        .collect()
      val ccWall = (System.nanoTime() - t3) / 1e9
      val ccDocs = cc.map(_.getLong(2)).sum
      println(s"""{"probe":"pipeline_ccnet","n_docs_in":$n,""" +
        s""""n_docs_bucketed":$ccDocs,""" + f""""wall_sec":$ccWall%.2f}""")
      assert(ccDocs == n, s"ccnet lost docs: $ccDocs != $n")
      assert(cc.map(_.getString(1)).toSet.subsetOf(Set("head", "middle", "tail")))
      System.out.flush()
    }
    spark.stop()
  }

  /** Basket-stream bounded-state leg (`basketstream <nPerEpoch> <epochs>`,
    * round 14 — the claim behind basketPairsStream's event-time
    * retirement): a long-running order stream must hold state for the
    * OPEN-ORDER horizon only, never the whole order history. Feeds
    * `epochs` micro-batches of `nPerEpoch` fresh orders each (4 items per
    * order, event time advancing one hour per epoch, TTL 4 hours), tracks
    * the state-store row count per epoch from the query progress, and
    * asserts (a) emission correctness — every order's C(4,2)=6 pairs emit
    * exactly once, so retirement never costs output; (b) the PLATEAU —
    * late-epoch state stays within noise of mid-run state and far below
    * the NoTimeout counterfactual (epochs·nPerEpoch, which is also
    * reported from the pre-retirement history for contrast). */
  def basketStreamLeg(spark: SparkSession, nPerEpoch: Int, epochs: Int): Unit = {
    import spark.implicits._
    require(epochs >= 12, s"basketstream needs >= 12 epochs, got $epochs")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp)]
    val sink = "basketstream_probe_sink"
    val stateRows = Seq.newBuilder[Long]
    val q = graft.streaming.StreamOps
      .basketPairsStream(mem.toDF().toDF("order_id", "part_id", "ts"),
        lateness = "4 hours")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      (0 until epochs).foreach { e =>
        val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
        val rows = (0 until nPerEpoch).flatMap { i =>
          val order = (e.toLong * nPerEpoch) + i
          (0 until 4).map(j =>
            (order, order * 10 + j,
              new java.sql.Timestamp(t0 + e * 3600000L + (i % 60) * 1000L)))
        }
        mem.addData(rows)
        q.processAllAvailable()
        stateRows += q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      }
    } finally q.stop()
    val emitted = spark.table(sink).count()
    val expected = epochs.toLong * nPerEpoch * 6
    assert(emitted == expected,
      s"retirement cost emissions: $emitted pairs != $expected")
    val st = stateRows.result()
    // retirement fires 2x lateness behind the event-time frontier: the
    // watermark itself lags `lateness` and the timeout adds `lateness`
    // past the order's last activity — so the open horizon is ~8 epochs
    // (2 x 4h / 1h-per-epoch) plus the current one; NoTimeout would be
    // epochs·nPerEpoch and growing (measured plateau: 16,033 at 24x2000)
    val horizonBound = 9L * nPerEpoch
    assert(st.last <= horizonBound,
      s"state did not retire: ${st.last} rows > $horizonBound " +
        s"(history: ${st.mkString(",")})")
    assert(st.last <= st(epochs / 2) * 3 / 2 + nPerEpoch,
      s"state still growing past mid-run: ${st.mkString(",")}")
    println(s"""{"probe":"basket_stream_state","n_per_epoch":$nPerEpoch,""" +
      s""""epochs":$epochs,"pairs_emitted":$emitted,""" +
      s""""state_rows_by_epoch":${st.mkString("[", ",", "]")},""" +
      s""""no_timeout_counterfactual":${epochs.toLong * nPerEpoch},""" +
      s""""plateau":true,"emissions_exact":true}""")
    System.out.flush()
  }

  /** DSIR leg (`dsir <n>`, the scale claim behind `sample_dsir_select` /
    * `stream_dsir_exec`): a 90/10 two-pool corpus (pool A and pool B draw
    * words from DISJOINT 2000-word vocabularies; target = a 1% pool-A
    * sample), scored two ways at n and 4n — the declarative plan
    * (training included) and the frozen-weight per-row kernel (the
    * at-ingest deployment). Asserts the weight table broadcasts, pool-A
    * docs separate from pool-B by score (min-A > max-B — disjoint vocab
    * makes the gap structural), and reports both walls: train+score
    * should be corpus-linear, and the kernel pass — one digest stream,
    * no joins, no aggregation shuffle — strictly cheaper. */
  def dsirLeg(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    val pool = when(pmod(col("id"), lit(10)) === 0, lit("a")).otherwise(lit("b"))
    val docs = spark.range(n).select(
      col("id").as("doc_id"), pool.as("pool"),
      concat_ws(" ", transform(sequence(lit(0), lit(39)),
        j => concat(pool, format_string("w%04d",
          pmod(xxhash64(col("id"), j), lit(2000)))))).as("text"))
      .localCheckpoint(eager = true)
    val target = docs.filter(col("pool") === "a" && col("doc_id") % 100 === 0)
      .select(col("doc_id"), col("text"))
    val scoreIn = docs.select(col("doc_id"), col("text"))

    val t0 = System.nanoTime()
    val scored = graft.ops.QualityModels.dsirScore(scoreIn, target).cache()
    val nScored = scored.count()
    val declWall = (System.nanoTime() - t0) / 1e9
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "weight table did not broadcast")
    val sep = scored.join(docs.select("doc_id", "pool"), "doc_id")
      .groupBy("pool")
      .agg(min("dsir_score").as("lo"), max("dsir_score").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sep("a")._1 > sep("b")._2,
      s"pool separation lost: minA=${sep("a")._1} maxB=${sep("b")._2}")

    val wt = graft.ops.QualityModels.dsirWeights(scoreIn, target)
      .as[(Long, Long)].collect().toMap
    val k = graft.ops.QualityModels.dsirScoreKernel(wt)
    val t1 = System.nanoTime()
    val kerAgg = scoreIn.select(k(col("text")).as("s"))
      .agg(count(lit(1)), sum("s._2")).collect()(0)
    val kerWall = (System.nanoTime() - t1) / 1e9
    assert(kerAgg.getLong(0) == n, "kernel pass lost rows")
    println(s"""{"probe":"dsir","n_docs":$n,"n_scored":$nScored,""" +
      s""""min_a":${sep("a")._1},"max_b":${sep("b")._2},""" +
      f""""wall_train_score_sec":$declWall%.2f,"wall_kernel_sec":$kerWall%.2f}""")
    scored.unpersist()
    System.out.flush()
  }

  /** `pack <base>` leg — the SURVEY §8.2 claim behind pack_sequences_ffd:
    * salted-group FFD stays one shuffle and scales with the corpus while
    * the waste stays near the bound. Lengths are deterministic
    * pseudo-random in [1, 600] at capacity 512 (so ~15% of docs are
    * oversize and excluded by contract); the leg asserts the capacity
    * invariant globally, reports bins vs the ceil(total/512) lower bound
    * and the padding waste in basis points, and times the pass at n and
    * 4n. */
  def packLeg(spark: SparkSession, n: Long): Unit = {
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      (pmod(xxhash64(col("id"), lit(42)), lit(600)) + 1).as("n_tok"))
      .localCheckpoint(eager = true)
    val cap = 512L
    val t0 = System.nanoTime()
    val packed = graft.ops.BinPack
      .packFirstFitDecreasing(docs, capacity = cap)
      .persist()
    val loads = packed.groupBy("grp", "bin").agg(sum("n_tok").as("load"))
    val over = loads.filter(col("load") > cap).count()
    val agg = loads.agg(count(lit(1)).as("bins"), sum("load").as("total"))
      .head()
    val wall = (System.nanoTime() - t0) / 1e9
    val (bins, total) = (agg.getLong(0), agg.getLong(1))
    val lb = (total + cap - 1) / cap
    val wasteBp = (bins * cap - total) * 10000L / (bins * cap)
    val placed = packed.count()
    packed.unpersist()
    println(f""""pack":{"n":$n,"placed":$placed,"bins":$bins,""" +
      f""""lower_bound":$lb,"over_capacity":$over,"waste_bp":$wasteBp,""" +
      f""""wall_sec":$wall%.2f}""")
    assert(over == 0L, s"$over bins over capacity")
    System.out.flush()
  }
}
