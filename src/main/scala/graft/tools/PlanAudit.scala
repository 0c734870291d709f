package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.{IndexQueries, VectorQueries}
import graft.core.Tables
import graft.ops.Ivf

/** Dev tool: print the physical plans of the index-probed paths to confirm
  * partition pruning + broadcast joins + absence of unbounded windows. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val (index, model) = VectorQueries.IvfCache.ensure(spark, dir, nlist = 16)
    println("===== IVF topK =====")
    Ivf.topK(queries, index, model, k = 10, nprobe = 4).explain("formatted")
    val (buckets, fmodel) = IndexQueries.LshCache.ensure(spark, dir)
    println("===== LSH topK =====")
    graft.index.LshForest.topK(queries, buckets, e, fmodel, k = 10).explain("formatted")
    println("===== Q3 shipping =====")
    graft.catalog.RelationalQueries.q3Shipping.run(spark, dir).explain("formatted")
    println("===== window funnel =====")
    // expect: filters pushed to the events scan, per-step partial aggs
    // before their exchanges, AQE broadcasting the users-sized step frames
    graft.catalog.RelationalQueries.windowFunnel.run(spark, dir)
      .explain("formatted")
    println("===== cohort retention =====")
    // expect: one distinct exchange on (user, week), user-sized aggregates,
    // broadcast of the cohort-sizes frame
    graft.catalog.RelationalQueries.eventsRetention.run(spark, dir)
      .explain("formatted")
    println("===== multi-touch attribution =====")
    // expect: purchase/touch filters pushed to the events scans, one
    // user-keyed join against the users-sized conversions aggregate, rank
    // window partitioned on user_id, map-side 3-model explode before the
    // final (model, channel) aggregation
    graft.catalog.RelationalQueries.eventsAttribution.run(spark, dir)
      .explain("formatted")
    println("===== affine minhash bands (fast family) =====")
    // expect: ZERO exchanges — one projection chain (UDF signature +
    // band-key transform + posexplode) straight off the documents scan
    graft.catalog.DedupQueries
      .bandsOfFast(Tables.documents(spark, dir)).explain("formatted")
    println("===== bigram-LM quality scoring =====")
    // expect: map-side partial aggs on the bigram count tables, the 1-row
    // vocab frame broadcast, one corpus-sized equi-join, no window
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    graft.ops.QualityModels
      .lmScore(d, d.filter(col("doc_id") % 4 === 0), tauMicro = 34200L)
      .explain("formatted")
    println("===== hashed-linear classifier =====")
    // expect: explode → partial (doc, feature) agg → doc rollup; no join
    graft.ops.QualityModels.hashedLinearScore(d).explain("formatted")
    println("===== token-budget selection =====")
    // expect: corpus → bucket histogram (partial agg) → tiny bucket
    // window; full buckets keep via LeftSemi; boundary bucket broadcast
    graft.catalog.CurationQueries.tokenBudgetSample.run(spark, dir)
      .explain("formatted")
    println("===== hourly anomaly =====")
    // expect: events pre-aggregate to the hours × types table before the
    // trailing window ever runs
    graft.catalog.RelationalQueries.eventsAnomaly.run(spark, dir)
      .explain("formatted")
    println("===== time-decay attribution =====")
    // expect: conversions broadcast, all windows partitioned on user_id,
    // no events-sized self join
    graft.catalog.RelationalQueries.eventsAttributionDecay.run(spark, dir)
      .explain("formatted")
    println("===== embedding increment: frozen-cut delta assign =====")
    // expect: leaf-bounded cuts broadcast, no sort-merge join, no window
    val model2 = graft.index.LshForest.build(e)
    val raw2 = graft.index.LshForest.bucketTable(e, model2)
    val delta2 = e.select((col("vec_id") + 100000).as("vec_id"),
      col("embedding"))
    graft.catalog.DedupQueries.assignSubKeys(
      graft.index.LshForest.bucketTable(delta2, model2), delta2,
      graft.catalog.DedupQueries.bucketCuts(raw2, e))
      .explain("formatted")
    println("===== rare-span audit =====")
    // expect: windows explode map-side, only md5 hashes in the exchanges,
    // equi-join back on the hash, no window operator
    graft.ops.TextMatch
      .rareSpanAudit(Tables.documents(spark, dir), k = 8)
      .explain("formatted")
    println("===== soft-dedup weights =====")
    // expect: components on the pairs-sized graph; ONE corpus-sized left
    // join to label docs; cluster-sized count join; no window
    graft.catalog.DedupQueries.softWeights.run(spark, dir)
      .explain("formatted")
    println("===== triangle counting =====")
    // expect: equi-joins only (wedge join on u, closure on (v, w)), every
    // count partial-aggregated map-side, no window, no nested-loop join
    graft.catalog.GraphQueries.triangles.run(spark, dir)
      .explain("formatted")
    println("===== top converting paths =====")
    // expect: conversions broadcast to the touch join, recency window
    // partitioned on user_id, path rollup partial map-side, TakeOrdered cut
    graft.catalog.RelationalQueries.eventsPathsTopk.run(spark, dir)
      .explain("formatted")
    println("===== FFD packing =====")
    // expect: one exchange on the salt group key feeding MapGroups; the
    // only other exchange is the output ordering's range partition
    graft.ops.BinPack.packFirstFitDecreasing(
      Tables.documents(spark, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")),
      capacity = 512L).explain("formatted")
    println("===== hadamard rotation kernel =====")
    // expect: one projection chain (UDF + posexplode) off the documents
    // scan — zero exchanges before the final sort
    graft.catalog.EmbedQueries.rotHadamard.run(spark, dir)
      .explain("formatted")
    println("===== count-min sketch =====")
    // expect: ONE corpus exchange (the vocab agg, partial map-side); the
    // depth-explode, cell agg, heavy filter and estimate joins all run on
    // vocab-sized or smaller frames, heavy + cells broadcast
    graft.catalog.ProfileQueries.countMin.run(spark, dir)
      .explain("formatted")
    println("===== boilerplate strip =====")
    // expect: line-keyed df aggregate is the only pre-reassembly exchange;
    // the hot-line set broadcasts into a BroadcastHashJoin LeftAnti; one
    // docId exchange for reassembly
    graft.catalog.TextMatchQueries.boilerplate.run(spark, dir)
      .explain("formatted")
    spark.stop()
  }
}
