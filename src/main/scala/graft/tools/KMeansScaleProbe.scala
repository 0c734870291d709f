package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distributed integer k-means at corpus scale: planted integer blobs at
  * 1M and 4M rows x 32-d, k = 4, 3 Lloyd rounds. What the probe
  * establishes for SURVEY §8.2: per-round cost is one narrow assignment
  * map + one (cluster, dim) partial aggregation (k·dim rows to the
  * driver), so wall time scales with the scan, not the shuffle; planted
  * blobs are recovered exactly (purity 1.0) at every size; and two
  * independent runs produce identical assignment digests (the
  * determinism the unrolled-CTE oracle rests on). */
object KMeansScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._

    def blobs(n: Long) = spark.range(n).toDF("doc_id")
      .withColumn("blob", (col("doc_id") % 4).cast("int"))
      .withColumn("embedding",
        expr("""transform(sequence(0, 31), j ->
          cast(blob * 1000 + (doc_id * 31 + j * 7) % 21 - 10 as float))"""))
      .select(col("doc_id"), col("blob"), col("embedding"))

    for (n <- Seq(1000000L, 4000000L)) {
      val data = blobs(n).localCheckpoint(eager = true)
      val t0 = System.nanoTime()
      val out = graft.ops.KMeansInt.fitAssign(
        data.select("doc_id", "embedding"), k = 4, iters = 3)
      val joined = out.join(data.select("doc_id", "blob"), "doc_id")
      // purity: every blob maps to exactly one cluster and vice versa
      val confusion = joined.groupBy("blob", "cluster").count()
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val pure = confusion.length == 4 &&
        confusion.map(_._2).distinct.length == 4
      val digest = out.agg(
        expr("bit_xor(cluster * (doc_id + 1) + dist2)")).head().getLong(0)
      println(f"kmeans n=$n: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"(3 rounds + final assign), pure=$pure, digest=$digest")
      System.out.flush()

      // Greedy k-center over the same blobs: per-selection cost is one
      // broadcast-center map + one TakeOrdered(1) reduce — wall should
      // track the scan (k passes), never a shuffle of the corpus. The
      // 4 planted blobs must each be hit by at least one of the 8 picks
      // (farthest-point provably covers separated blobs), and reruns
      // must be digest-identical.
      val t1 = System.nanoTime()
      val kc = graft.ops.KCenter.selectAssign(
        data.select("doc_id", "embedding"), k = 8)
      val kcJoined = kc.join(data.select("doc_id", "blob"), "doc_id")
      val blobsHit = kcJoined.filter(col("doc_id") === col("center_id"))
        .select("blob").distinct().count()
      val kcDigest = kc.agg(
        expr("bit_xor(center_order * (doc_id + 1) + dist2)")).head().getLong(0)
      println(f"kcenter n=$n: ${(System.nanoTime() - t1) / 1e9}%.1f s " +
        f"(8 selections + assign), blobs_hit=$blobsHit/4, digest=$kcDigest")
      System.out.flush()
    }
    spark.stop()
  }
}
