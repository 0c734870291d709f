package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Emits the round's QUALITY artifact: every recall/accuracy self-gate
  * observable in the catalog, run at the given SF, as one JSON object
  * `{"sf": ..., "observables": {name: {column: value, ...}, ...}}`.
  * The driver's correctness artifact records only row/schema/hash state
  * for these (they are rows-only entries), so regressions in the VALUES
  * were invisible between rounds — this file makes them diffable.
  * Usage: tools/run.sh graft.tools.QualityReport <sfDir>[,<sfDir2>...] <outFile>
  * (with several SF dirs the artifact is {"reports": [one object per SF]},
  * so one round file carries the whole recall picture across scales).
  */
object QualityReport {

  /** Single-row quality observables in the catalog (name → columns). */
  val observables: Seq[String] = Seq(
    "lsh_recall_at10",
    "ann_ivf_recall_at10",
    "ann_pq_adc_only_recall_at10",
    "ann_pq16_adc_only_recall_at10",
    "ann_pq_rerank_recall_at10",
    "ann_ivfpq_recall_at10",
    "ann_sq_recall_at10",
    "ann_pq_rot_gain_at10",
    "knn_join_recall_at3")

  def main(args: Array[String]): Unit = {
    val sfDirs = (if (args.length > 0) args(0) else "/root/testdata/sf0.01")
      .split(",").toSeq
    val out = if (args.length > 1) args(1) else "/root/repo/QUALITY_r9.json"
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Static context so the artifact is self-explaining round over round:
    // the 8 B adc-only number is an INFORMATION FLOOR, not a regression —
    // PqPermProbe pinned the permutation-lever ceiling (scoring all 24
    // seeded candidates directly on corpus recall — overfit by
    // construction, an upper bound for ANY selector) at 0.52 at sf0.1;
    // the shipped codes-only answer is the 16 B tier. See SURVEY §8 r11.
    val context: Map[String, String] = Map(
      "ann_pq_adc_only_recall_at10" ->
        (""""permutation_ceiling_sf0.1": 0.52, """ +
          """"ceiling_source": "PqPermProbe (overfit upper bound)", """ +
          """"shipped_codes_only_tier": "ann_pq16_adc_only_recall_at10""""))
    def report(sfDir: String): String = {
      val entries = observables.map { name =>
        val row = graft.SparkEntry.queries(name)(spark, sfDir).collect().head
        val cols = (row.schema.fields.zipWithIndex.map { case (f, i) =>
          s""""${f.name}": ${row.get(i)}"""
        } ++ context.get(name)).mkString("{", ", ", "}")
        s""""$name": $cols"""
      }
      // MRL is the one ANN family whose per-query hit counts are
      // HASH-GATED (ann_mrl_recall_at10 is not rows-only), so the value
      // cannot regress silently — it is summarized here anyway so this
      // artifact stays the complete recall picture across families.
      val mrlRows = graft.SparkEntry
        .queries("ann_mrl_recall_at10")(spark, sfDir).collect()
      val mrlHits = mrlRows.map(_.getAs[Long]("n_hit")).sum
      val mrl = f""""ann_mrl_recall_at10": {"recall_at_10": ${
        mrlHits.toDouble / (10.0 * mrlRows.length)}%.4f, "n_queries": ${
        mrlRows.length}, "hash_gated": true}"""
      // Ring-drop observability (VERDICT r12 ask 5): run the three
      // streaming near-dup gates and surface their occupancy-ring drop
      // totals next to the recall observables. Expected 0 on the fixture
      // corpora — a nonzero here means the cap started biting (recall
      // silently degrades at the bitten buckets), which was previously
      // visible only by re-running probes outside the round artifacts.
      val dropGates = Seq(
        "stream_neardup_exec", "stream_neardup_fast_exec",
        "stream_embdedup_exec")
      val ringDrops = dropGates.map { name =>
        // A gate failure (stream env / RocksDB issue) must not lose the
        // recall observables already computed above: emit null for that
        // gate's drop total and keep the rest of the artifact.
        val v =
          try {
            graft.SparkEntry.queries(name)(spark, sfDir).count()
            graft.streaming.StreamDropStats.get(name)
              .map(_.toString).getOrElse("null")
          } catch { case _: Throwable => "null" }
        s""""$name": $v"""
      }.mkString("{", ", ", "}")
      s"""{"sf": "$sfDir", "observables": ${
        (entries :+ mrl).mkString("{", ", ", "}")}, "ring_drops": $ringDrops}"""
    }
    val json =
      if (sfDirs.size == 1) report(sfDirs.head)
      else s"""{"reports": ${sfDirs.map(report).mkString("[", ", ", "]")}}"""
    Files.writeString(Paths.get(out), json)
    println(json)
    spark.stop()
  }
}
