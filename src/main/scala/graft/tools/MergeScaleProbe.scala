package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Diff, Merge}

/** Dev tool: scale probe for the mutation surface beyond the fixture.
  * Synthesizes an n-row base table and an n/10-row CDC log (90% updates,
  * 10% deletes, plus n/100 brand-new keys), then measures:
  *
  *  - MERGE apply (Merge.applyChanges): wall time; the log-side window +
  *    broadcast anti-join means base never shuffles — wall should track
  *    the base SCAN, near-linear in n;
  *  - snapshot diff (Diff.snapshotDiff base vs merged): wall time plus
  *    exact per-class counts checked against the log's composition — the
  *    correctness invariant at scale, not just at sf0.01.
  *
  * Run at two sizes to see the curve:
  *   tools/run.sh graft.tools.MergeScaleProbe 1000000
  *   tools/run.sh graft.tools.MergeScaleProbe 4000000
  */
object MergeScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.range(n).select(
      col("id").as("k"),
      (xxhash64(col("id"), lit(1)) % 1000).as("v1"),
      xxhash64(col("id"), lit(2)).cast("string").as("v2")).cache()
    // touched keys: every 10th; 90% upsert / 10% delete; new keys beyond n
    val touched = spark.range(n / 10).select((col("id") * 10).as("k"))
      .withColumn("op",
        when(pmod(xxhash64(col("k"), lit(3)), lit(10)) === 0, "delete")
          .otherwise("upsert"))
    val inserts = spark.range(n / 100).select(
      (col("id") + n).as("k"), lit("upsert").as("op"))
    val log = touched.unionByName(inserts)
      .select(col("k"), lit(1L).as("seq"), col("op"),
        lit(-1L).as("v1"), lit("new").as("v2")).cache()
    base.count(); log.count() // exclude synthesis from timings

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val merged = Merge.applyChanges(base, log, key = "k").cache()
    val (nMerged, tMerge) = time(merged.count())
    val (classes, tDiff) = time(
      Diff.snapshotDiff(base, merged, key = Seq("k"))
        .groupBy("change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)

    val deletes = log.filter(col("op") === "delete" && col("k") < n).count()
    val updates = n / 10 - deletes
    println(f"n=$n merged=$nMerged  merge=${tMerge}%.2fs diff=${tDiff}%.2fs")
    println(s"diff classes: $classes")
    assert(classes("added") == n / 100, "added != insert count")
    assert(classes("removed") == deletes, "removed != delete count")
    assert(classes("changed") == updates, "changed != update count")
    assert(classes("unchanged") == n - n / 10, "unchanged != untouched count")
    println("invariants OK")
    spark.stop()
  }
}
