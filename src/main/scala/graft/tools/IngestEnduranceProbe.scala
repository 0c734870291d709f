package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{EngineConfig, ZebraEngine}
import graft.ops.SimSearch

/** Dev tool: incremental-ingest ENDURANCE — grow the corpus to 11× its
  * indexed build size through micro-batch appends with compaction enabled,
  * the regime where leaf-local splits (`ZebraEngine.compactIndexIfNeeded` /
  * `splitLeaf`) either hold the index together or quietly rot it. The unit
  * specs exercise one compaction at toy scale; this drives many batches
  * until splits, re-splits, and (possibly) the full-rebuild fallback all
  * fire, then checks the properties that matter after sustained ingest:
  *
  *  - recall@10 at DEFAULT query budgets vs the exact scan (floor 0.95 —
  *    an index whose leaves outgrew their probes would sink this);
  *  - stale/live bucket-row ratio (leaf-local splits strand the old leaf's
  *    rows; the compaction economics only work if dead weight stays
  *    bounded — floor: stale must not exceed 1.5× live, the level where
  *    the full-rebuild fallback should have fired);
  *  - warm query latency before vs after the growth (scan-proportional
  *    drift would show a leaf-pruning failure).
  *
  * Usage: IngestEnduranceProbe [n0] [batches] [kind]  (10 micro-batches
  * of n0 each → 11·n0 final; kind = lsh | ivfpq). The ivfpq leg drives
  * the FROZEN-quantizer regime instead: every micro-batch is assigned and
  * encoded by the original fit, and `maintainIvfPqIfNeeded` must fire the
  * full retrain once growth crosses 4× — the gates check recall@10 ≥ 0.9
  * at default budgets after 11× growth (the round-6 staleness ask) and
  * that at least one retrain actually happened. Two interesting LSH
  * regimes, both measured in SURVEY.md §8.2:
  *
  *  - n0 ≲ sampleCap/4 (default 20k): every leaf outgrows what a fresh
  *    rebuild would give, so leaf-local splits fire on every batch — the
  *    splitLeaf endurance path proper;
  *  - n0 ≫ sampleCap (e.g. 100k → 1.1M): the occupancy-scaled threshold
  *    recognizes a rebuild would be no better (leaves are sample-capped
  *    either way) and compaction correctly declines — recall must hold
  *    through raw leaf growth alone.
  */
object IngestEnduranceProbe {
  def main(args: Array[String]): Unit = {
    val n0 = if (args.nonEmpty) args(0).toInt else 20000
    val batches = if (args.length > 1) args(1).toInt else 10
    val kind = if (args.length > 2) args(2) else "lsh"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // same synthetic family as EngineScaleProbe: 1000 loose clusters plus
    // per-id jitter, so neighborhoods are non-trivial at every scale
    def synth(from: Long, until: Long) =
      spark.range(from, until).select(
        col("id"),
        transform(sequence(lit(0), lit(63)), j => (
          (pmod(xxhash64(col("id") % 1000, j), lit(1000)) / lit(250.0) - 2.0) +
            (pmod(xxhash64(col("id"), j), lit(1000)) / lit(1000.0) - 0.5)
        ).cast("float")).as("embedding"))
        .select(format_string("v%d", col("id")).as("id"), col("embedding"))

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2fs")
      (r, s)
    }

    val path = s"/tmp/graft_endurance_${kind}_$n0"
    ZebraEngine.destroy(path)
    val eng = ZebraEngine.create(
      spark, path, EngineConfig(dim = 64, indexKind = kind))
    time(s"build_ingest_$n0")(eng.insertRecords(synth(0, n0)))
    time("build_index")(eng.refreshIndex())

    val queries = synth(0, 32)
      .select(col("id").as("query_id"), col("embedding")).cache()
    queries.count()
    eng.queryVectors(queries, 10).count() // warm codegen/broadcast
    val (_, qBefore) = time("query_warm_before")(
      eng.queryVectors(queries, 10).count())

    var compactions = 0
    (0 until batches).foreach { b =>
      val from = n0.toLong * (b + 1)
      time(f"micro_batch_${b + 1}of$batches")(
        eng.insertRecords(synth(from, from + n0)))
      val maintained =
        if (kind == "ivfpq") eng.maintainIvfPqIfNeeded()
        else eng.compactIndexIfNeeded()
      if (maintained) compactions += 1
    }
    val total = n0.toLong * (batches + 1)
    println(s"count: ${eng.count()} (expect $total), " +
      s"${if (kind == "ivfpq") "retrains" else "compactions"}: $compactions")

    // Stale/live only applies to the LSH leaf-split path: IVF-PQ appends
    // route through live cells and the retrain rewrites the index whole.
    val staleRatio = if (kind == "ivfpq") 0.0 else {
      val bucketRows = spark.read.parquet(s"$path/index").count()
      val liveRows = eng.liveIndex.count()
      val r = (bucketRows - liveRows).toDouble / liveRows
      println(f"bucket_rows: $bucketRows, live: $liveRows, stale/live: $r%.3f")
      r
    }
    // vacuum: reclaim the split dead weight WITHOUT a retrain, then
    // re-measure — the decoupling compactIndexIfNeeded alone can't give
    val postVacuumRatio = if (kind == "ivfpq") 0.0 else {
      val (reclaimed, _) = time("vacuum")(eng.vacuumIndex())
      val bucketRows = spark.read.parquet(s"$path/index").count()
      val liveRows = eng.liveIndex.count()
      val r = (bucketRows - liveRows).toDouble / liveRows
      println(f"vacuum reclaimed: $reclaimed, stale/live after: $r%.3f")
      r
    }

    eng.queryVectors(queries, 10).count()
    val (_, qAfter) = time("query_warm_after")(
      eng.queryVectors(queries, 10).count())

    val approx = eng.queryVectors(queries, 10).withColumnRenamed("id", "vec_id")
    val exact = SimSearch.exactTopK(queries, eng.vectors, 10, vecId = "id")
      .withColumnRenamed("id", "vec_id")
    val recall = SimSearch.recallAtK(approx, exact)
    println(f"recall_at10(default budgets, post-endurance): $recall%.4f")

    var fails = 0
    def gate(name: String, ok: Boolean, detail: String): Unit = {
      println(s"${if (ok) "PASS" else "FAIL"} $name: $detail")
      if (!ok) fails += 1
    }
    gate("count", eng.count() == total, s"${eng.count()} == $total")
    val recallFloor = if (kind == "ivfpq") 0.9 else 0.95
    gate("recall_at10", recall >= recallFloor, f"$recall%.4f >= $recallFloor")
    if (kind == "ivfpq")
      gate("retrains_fired", compactions >= 1,
        s"$compactions >= 1 (growth 11x must cross the 4x trigger)")
    else {
      gate("stale_ratio", staleRatio <= 1.5, f"$staleRatio%.3f <= 1.5")
      gate("post_vacuum_stale", postVacuumRatio == 0.0,
        f"$postVacuumRatio%.3f == 0.0 (vacuum must reclaim all dead rows)")
    }
    gate("latency_drift", qAfter <= qBefore * 10 + 2.0,
      f"warm query $qBefore%.2fs -> $qAfter%.2fs at 11x corpus")
    spark.stop()
    if (fails > 0) sys.exit(1)
  }
}
