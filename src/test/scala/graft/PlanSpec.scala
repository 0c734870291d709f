package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{IndexQueries, RelationalQueries, VectorQueries}
import graft.core.Tables
import graft.index.LshForest
import graft.ops.{Ivf, SimSearch}

/** Physical-plan regression gates: the scale properties this engine is
  * built on — bounded map-side top-k instead of windows, broadcast joins
  * on every index/dim join, partition pruning reaching the scans — must
  * survive refactors, not just the one `.explain` session where they were
  * first checked. String-level assertions on stable plan markers. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sf0001

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val embeddings = Tables.embeddings(spark, dir)
  private lazy val queries = embeddings.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding"))

  test("exact kNN: bounded top-k aggregate with a partial phase, no window") {
    val p = plan(SimSearch.exactTopK(queries, embeddings, 10))
    assert(p.contains("partial_topkagg"), s"missing map-side partial top-k:\n$p")
    assert(!p.contains("Window"), s"window operator crept into the kNN path:\n$p")
  }

  test("LSH topK: broadcast rerank joins, no shuffled corpus join") {
    val (buckets, model) = IndexQueries.LshCache.ensure(spark, dir)
    val p = plan(LshForest.topK(queries, buckets, embeddings, model, 10))
    assert(p.contains("BroadcastHashJoin"), s"rerank join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join means the corpus shuffled:\n$p")
    assert(p.contains("partial_topkagg"), s"missing bounded top-k:\n$p")
  }

  test("IVF topK: probed-cell partition pruning reaches the index scan") {
    val (index, model) = VectorQueries.IvfCache.ensure(spark, dir, nlist = 16)
    val p = plan(Ivf.topK(queries, index, model, k = 10, nprobe = 4))
    assert(p.contains("PartitionFilters") && p.contains("cell_id"),
      s"cell_id partition filter missing from the index scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probe join must broadcast:\n$p")
  }

  test("Q3-shaped join: every predicate pushed to its scan, dims broadcast") {
    val p = plan(RelationalQueries.q3Shipping.run(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter not pushed to the customer scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dim joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join:\n$p")
  }

  test("ngram prefix filter: equi-joins only, never a cartesian expansion") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val p = plan(graft.catalog.DedupQueries.ngramJaccardPairs(docs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the shingle self-join must stay an equi-join on shingle:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"shingle/candidate counts must partial-aggregate map-side:\n$p")
  }

  test("merge-apply: winners broadcast, base side never shuffles") {
    import spark.implicits._
    val base = (0L until 100L).map(k => (k, s"p$k")).toDF("k", "p")
    val log = Seq((5L, 1L, "upsert", "x"), (6L, 1L, "delete", "y"))
      .toDF("k", "seq", "op", "p")
    val p = plan(graft.ops.Merge.applyChanges(base, log, key = "k"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"touched keys must drop via broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"base shuffled for the anti-join:\n$p")
    // exactly ONE exchange: the (tiny) change log's window partitioning
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"unexpected shuffles ($exchanges):\n$p")
  }

  test("chunking: pure map + generate — zero exchanges") {
    val p = plan(graft.ops.Curation.chunkDocs(
      Tables.documents(spark, dir), chunkSize = 32, stride = 24))
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), s"missing chunk explosion:\n$p")
  }

  test("temperature mix: corpus filtered map-side via broadcast thresholds") {
    val p = plan(graft.ops.Curation.temperatureSample(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
      strata = "lang", tau = 0.5))
    assert(p.contains("BroadcastHashJoin"),
      s"threshold table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled for the threshold join:\n$p")
  }

  test("PassJoin: corpus candidates stay equi-join; only the tiny pool nests") {
    val strs = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), substring(col("text"), 1, 24).as("s"))
    val p = plan(graft.ops.FuzzyJoin.selfJoin(strs, d = 2))
    assert(!p.contains("CartesianProduct"),
      s"PassJoin degenerated to all-pairs:\n$p")
    // exactly ONE nested-loop join is legitimate: the tiny-string pool
    // (both sides filtered to len < d+1 — at most |alphabet|^d strings
    // EXIST at those lengths, so its product is a constant, not a
    // corpus-shaped expansion). A second one would mean the segment path
    // degenerated.
    val nested = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(nested <= 1, s"corpus-side candidate join degenerated:\n$p")
    assert(p.contains("< 3"), // the tiny pool's len < d+1 filter guards it
      s"tiny-pool nested loop is missing its length guard:\n$p")
  }

  test("span dedup: join-back keyed on the md5 gram hash, not gram text") {
    val p = plan(graft.ops.TextMatch.spanDedupStats(
      Tables.documents(spark, dir), k = 8))
    assert(p.contains("md5"), s"gram hash missing — text would shuffle:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"span dedup must stay an equi-join:\n$p")
  }

  test("curriculum order: rank windows partitioned by micro-bucket") {
    val p = plan(graft.ops.Curation.curriculumOrder(
      Tables.documents(spark, dir)))
    val rn = p.linesIterator.filter(_.contains("row_number")).toSeq
    assert(rn.nonEmpty && rn.forall(_.contains("bucket")),
      s"the per-doc rank must window WITHIN (bucket, hex) — a global " +
        s"row_number is the zipWithIndex anti-pattern:\n${rn.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the histogram offsets must broadcast:\n$p")
  }

  test("rare-span audit: hashes shuffle, no window, equi-join only") {
    val p = plan(graft.ops.TextMatch.rareSpanAudit(
      Tables.documents(spark, dir), k = 8))
    assert(p.contains("md5"), s"gram hash missing — window text would shuffle:\n$p")
    assert(!p.contains("Window"), s"no window belongs in the df rollup:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"df join-back must stay an equi-join:\n$p")
  }

  test("phrase search: postings term-filtered below the adjacency joins") {
    val df = graft.ops.TextMatch.phraseSearch(
      Tables.documents(spark, dir), Seq("table", "value"))
    val p = plan(df)
    assert(p.contains("IN (table,value)") || p.contains("IN (value,table)"),
      s"term filter missing from the postings scan side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"adjacency must be an equi-join:\n$p")
  }

  test("per-group top-k: bounded aggregate, no ranking window") {
    val p = plan(RelationalQueries.topkPerGroup.run(spark, dir))
    assert(p.contains("partial_topkagg"),
      s"missing map-side bounded top-k:\n$p")
    assert(!p.contains("Window"), s"ranking window crept back in:\n$p")
  }

  test("affine minhash bands: one projection chain off the scan, zero exchanges") {
    val p = plan(graft.catalog.DedupQueries.bandsOfFast(
      Tables.documents(spark, dir)))
    assert(!p.contains("Exchange"), s"signature/banding must not shuffle:\n$p")
    assert(p.contains("Generate"), s"missing band posexplode:\n$p")
  }

  test("attribution: conversions broadcast, no events-sized self join") {
    val p = plan(RelationalQueries.eventsAttribution.run(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"users-sized conversions frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"touch join shuffled the events side against events:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("relational agg: map-side partials, codegen after AQE finalizes") {
    val df = RelationalQueries.q1Agg.run(spark, dir)
    val pre = plan(df)
    assert(pre.contains("partial_sum"), s"no map-side partial aggregation:\n$pre")
    df.collect() // AQE only materializes codegen spans in the final plan
    val post = df.queryExecution.executedPlan.toString
    // the finalized AQE plan prints codegen spans as "*(n) Operator"
    assert(post.contains("*(") || post.contains("WholeStageCodegen"),
      s"aggregation fell out of codegen:\n$post")
  }

  test("lm score: partial-agg count tables, broadcast vocab scalar, no window") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val p = plan(graft.ops.QualityModels.lmScore(docs,
      docs.filter(col("doc_id") % 4 === 0), tauMicro = 34200L))
    assert(p.contains("partial_count"),
      s"bigram count tables must partial-aggregate map-side:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row vocab frame must broadcast:\n$p")
    assert(!p.contains("Window"), s"no window belongs in LM scoring:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the vocab cross join must stay a broadcast, never a cartesian:\n$p")
  }

  test("classifier: pure explode/agg — no join operator at all") {
    val p = plan(graft.ops.QualityModels.hashedLinearScore(
      Tables.documents(spark, dir).select(col("doc_id"), col("text"))))
    assert(!p.contains("Join"), s"closed-form weights need no join:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"feature counts must partial-aggregate map-side:\n$p")
  }

  test("dsir: weight table broadcasts; partial-agg counts; no window, no cartesian") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val p = plan(graft.ops.QualityModels.dsirScore(docs,
      docs.filter(col("doc_id") % 7 === 0)))
    assert(p.contains("BroadcastExchange"),
      s"the <=dim-row weight table must broadcast, never shuffle the corpus:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no corpus-side shuffle join belongs in DSIR scoring:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"bucket counts must partial-aggregate map-side:\n$p")
    assert(!p.contains("Window"), s"no window belongs in scoring:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("token budget: histogram before windows; full buckets keep via semi-join") {
    val nTokens = size(split(col("text"), " ")).cast("long")
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 1000000L).as("q"),
        nTokens.as("n_tokens"))
    val df = graft.ops.Curation.tokenBudgetSelect(
      scored, "q", "n_tokens", budget = 15000L, bucketDiv = 1000L,
      bestLow = false)
    val p = plan(df)
    // every Window must sit above an aggregation (the bucket histogram),
    // so the corpus is never globally ordered raw: a regression to a
    // global running-sum window over the scored rows would put a Window
    // directly on the scan with no Aggregate below it. The histogram is
    // materialized through Bounded.frame (persist + counted require), so
    // it may surface as an InMemoryRelation leaf — that's the SAME
    // guarantee, asserted at runtime rather than by plan shape.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the histogram/boundary windows")
    wins.foreach { w =>
      val bounded = w.child.collectFirst {
        case a: Aggregate => a: LogicalPlan
        case m: InMemoryRelation => m: LogicalPlan
      }.isDefined
      assert(bounded,
        s"window with no aggregate/bounded frame below it — corpus globally ordered:\n$w")
    }
    assert(p.contains("LeftSemi"),
      s"full buckets must keep via semi-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("decay attribution: user-partitioned windows only, conversions broadcast") {
    val df = RelationalQueries.eventsAttributionDecay.run(spark, dir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"users-sized conversions frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"touch join shuffled events against events:\n$p")
    // every window must partition on user_id — a global (unpartitioned)
    // window would single-task the corpus
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(df.queryExecution.optimizedPlan.toString)
      .map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty)
    assert(winSpecs.forall(_.contains("user_id")),
      s"window not partitioned on user_id: $winSpecs")
  }

  test("embedding increment: frozen cuts broadcast to the delta assign") {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val model = graft.index.LshForest.build(e)
    val raw = graft.index.LshForest.bucketTable(e, model)
    val cuts = graft.catalog.DedupQueries.bucketCuts(raw, e)
    val delta = e.select((col("vec_id") + 100000).as("vec_id"),
      col("embedding"))
    val p = plan(graft.catalog.DedupQueries.assignSubKeys(
      graft.index.LshForest.bucketTable(delta, model), delta, cuts))
    assert(p.contains("BroadcastHashJoin"),
      s"leaf-bounded cuts table must broadcast to the assign:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the delta assign must never shuffle against the cuts:\n$p")
    assert(!p.contains("Window"), s"no window belongs in the assign:\n$p")
  }

  test("triangles: equi-joins only — orientation kills the symmetric blowup") {
    val df = graft.catalog.GraphQueries.triangles.run(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"wedge/closure must stay equi-joins:\n$p")
    assert(!p.contains("Window"),
      s"no window belongs in triangle counting:\n$p")
    assert(p.contains("partial_count"),
      s"degree and per-node counts must partial-aggregate map-side:\n$p")
  }

  test("markov attribution: one user-keyed window pass feeds the grid; " +
    "no events-sized self join") {
    // The catalog entry collects the grid, so gate the EDGE EXTRACTION
    // stage (the only corpus-scale plan) directly.
    val e = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
    val conv = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("us").as("c_us"))
    val touches = e.filter(col("event_type").isin("view", "click"))
      .join(conv, Seq("user_id"), "left")
    val p = plan(touches)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"users-sized conversions frame must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"touch join shuffled events against events:\n$p")
    val full = RelationalQueries.eventsAttributionMarkov.run(spark, dir)
    assert(full.schema.fieldNames.toSeq ==
      Seq("channel", "p_full_bp", "p_removed_bp", "removal_bp", "share_bp"))
  }

  test("paths top-k: user-partitioned window, take-ordered cut, no global sort") {
    val df = RelationalQueries.eventsPathsTopk.run(spark, dir)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 must be a TakeOrdered, not a global sort+limit:\n$p")
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(df.queryExecution.optimizedPlan.toString)
      .map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty && winSpecs.forall(_.contains("user_id")),
      s"recency window must partition on user_id: $winSpecs")
    assert(!p.contains("SortMergeJoin"),
      s"touch join shuffled events against events:\n$p")
  }

  test("cohort ltv: cumulative window over the grid, not raw events") {
    val df = RelationalQueries.eventsLtv.run(spark, dir)
    val p = plan(df)
    // the cumulative window must consume the (cohort, offset) aggregate —
    // plan strings print top-down, so Window appears ABOVE the partial agg
    val firstWin = p.indexOf("Window")
    val firstAgg = p.indexOf("partial_count")
    assert(firstWin >= 0 && firstAgg >= 0 && firstWin < firstAgg,
      s"cumulative window must run over the aggregated grid:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"cohort-sizes join must broadcast:\n$p")
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(df.queryExecution.optimizedPlan.toString)
      .map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty && winSpecs.forall(_.contains("c_wk")),
      s"cumulative window must partition on the cohort key: $winSpecs")
  }

  test("basket lift: apriori semi-join broadcast, take-ordered cut, " +
    "no cartesian pair expansion") {
    val df = RelationalQueries.basketLift.run(spark, dir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"frequent-part prune and count joins must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay an order-keyed equi-join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must be a TakeOrdered, not a global sort+limit:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
  }

  test("boilerplate strip: hot set broadcasts into a LeftAnti, no window") {
    val p = plan(graft.catalog.TextMatchQueries.boilerplate.run(spark, dir))
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"),
      s"the strip must be a broadcast anti-join against the hot set:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join means the corpus-sized lines frame shuffled " +
        s"for the strip:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
  }

  test("html extract: one zero-shuffle projection per doc, no join, no window") {
    val p = plan(graft.catalog.HtmlQueries.extract.run(spark, dir))
    // markup must never leave the executor: the whole parse→segment→
    // verdict pipeline is a map pass; the only exchange is the output sort
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
    assert(!p.contains("Join"), s"extraction must not join:\n$p")
    assert(p.contains("rangepartitioning") || p.contains("Sort"),
      s"expected only the output sort:\n$p")
  }

  test("crawl cascade: hot chunks broadcast into a LeftAnti, no corpus window") {
    val p = plan(graft.catalog.HtmlQueries.crawl.run(spark, dir))
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"),
      s"cross-doc strip must be a broadcast anti-join against the hot set:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join means the chunks frame shuffled for the strip:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
  }

  test("url dedup: keeper table broadcasts, no window, no shuffle join") {
    val p = plan(graft.catalog.UrlQueries.urlDedup.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"the groups-sized keeper table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join means the urls frame shuffled for first-wins:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
  }

  test("cluster keep-best: aggregate argmax, no corpus window") {
    val p = plan(
      graft.catalog.DedupQueries.clusterKeepBest.run(spark, dir))
    // the survivor is a groupBy struct-max per cluster — a ranking
    // window here would sort the corpus inside every cluster partition
    // (and an unpartitioned one would sort the whole corpus on one task)
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
    // struct-typed max lowers to SortAggregate (still partial/map-side)
    assert(p.contains("SortAggregate") || p.contains("HashAggregate"),
      s"per-cluster argmax must be an aggregate:\n$p")
  }

  test("expectations gate: one aggregation pass, no join, no window") {
    val p = plan(
      graft.catalog.ProfileQueries.expectations.run(spark, dir))
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
    // every check rides the single conditional-sum aggregation (the
    // distinct-id count expands inside the same agg); a second corpus
    // scan means a check broke out of the shared pass
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 1, s"expected one corpus scan, saw $scans:\n$p")
  }

  test("count-min: downstream consumers read the checkpointed vocab, " +
    "not the corpus") {
    val p = plan(graft.catalog.ProfileQueries.countMin.run(spark, dir))
    assert(!p.contains("Scan parquet"),
      s"a parquet scan below the sketch means a consumer re-read the " +
        s"corpus instead of the materialized vocab frame:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"heavy-token and cell joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"vocab-sized joins must not shuffle-sort, and no window belongs " +
        s"here:\n$p")
  }

  test("anomaly: corpus pre-aggregates to the hourly table before the window") {
    val p = plan(RelationalQueries.eventsAnomaly.run(spark, dir))
    val firstAgg = p.indexOf("partial_count")
    val firstWin = p.indexOf("Window")
    assert(firstAgg >= 0 && firstWin >= 0,
      s"expected a partial hourly aggregation and a trailing window:\n$p")
    // plan strings print top-down: the Window consumes the aggregate, so
    // it must appear ABOVE (before) the partial agg in the string
    assert(firstWin < firstAgg,
      s"the trailing window must run over the aggregated hourly series, " +
        s"not raw events:\n$p")
  }
}
