package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PageRank at index scale: a synthetic affine digraph (3 out-edges per
  * node — the catalog topology at 200-2,000x the fixture), 10 rounds of
  * the exact-integer recurrence. What the probe establishes for SURVEY
  * §8.2:
  *
  *  - per-round wall time is FLAT across rounds (localCheckpoint cuts the
  *    lineage every round, so round 10 plans the same two joins as round
  *    1 — without the cut the plan doubles per round and the driver dies
  *    around round 15);
  *  - scaling nodes 1M -> 4M (edges 3M -> 12M) scales the total roughly
  *    linearly (each round is one dst-keyed exchange + one broadcast-sized
  *    outdegree join);
  *  - the integer fixed point is reproducible: two independent runs at 1M
  *    nodes produce identical rank vectors (checked via sum + xor digest).
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._

    def edges(n: Long) = spark.range(n).toDF("src")
      .select(col("src"), explode(array(
        (col("src") * 31 + 7) % n,
        (col("src") * 17 + 3) % n,
        (col("src") * 13 + 11) % n)).as("dst"))
      .filter(col("src") =!= col("dst"))

    def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(sum("pr"), expr("bit_xor(pr * (id + 1))")).head()
      (r.getLong(0), r.getLong(1))
    }

    val sizes = if (args.isEmpty) Seq(1000000L, 4000000L) else args.map(_.toLong).toSeq
    for (n <- sizes) {
      val t0 = System.nanoTime()
      val pr = graft.ops.Graph.pagerankInt(edges(n), iters = 10)
      val d = digest(pr)
      println(f"pagerank n=$n: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"(10 rounds), mass=${d._1}, digest=${d._2}")
      System.out.flush()
    }
    // reproducibility at the smallest probed size
    val nr = sizes.min
    val a = digest(graft.ops.Graph.pagerankInt(edges(nr), iters = 10))
    val b = digest(graft.ops.Graph.pagerankInt(edges(nr), iters = 10))
    println(s"reproducible at $nr: ${a == b} ($a vs $b)")
    spark.stop()
  }
}
