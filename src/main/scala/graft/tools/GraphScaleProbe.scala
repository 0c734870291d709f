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

    // `triangles [sizes…]` leg: the SURVEY §8.2 claim behind
    // graph_triangles — degree-ordered orientation bounds the wedge join
    // under a hub that would make the unoriented form quadratic. Topology:
    // the affine digraph symmetrized PLUS a hub wired to every 20th node
    // (raw hub degree = n/20). The probe reports the raw max degree vs the
    // max ORIENTED out-degree and the wedge-pair total Σ C(d_out, 2) —
    // orientation must keep the hub's out-list tiny (its neighbors almost
    // all order below it) — plus wall and a reproducibility digest.
    if (args.headOption.contains("triangles")) {
      val sizes = if (args.length <= 1) Seq(250000L, 1000000L)
        else args.drop(1).map(_.toLong).toSeq
      for (n <- sizes) {
        val hub = spark.range(0, n, 20).toDF("dst")
          .select(lit(0L).as("src"), col("dst"))
        // ring rails (i, i+1) and (i, i+2) close a triangle at every node,
        // so the closure join produces ~n real triangles, not just wedges
        val rails = spark.range(n).toDF("src").select(col("src"),
          explode(array((col("src") + 1) % n, (col("src") + 2) % n)).as("dst"))
        val e = edges(n).unionAll(hub).unionAll(rails)
        val t0 = System.nanoTime()
        val tri = graft.ops.Graph.triangleCounts(e)
          .agg(sum("n_tri").as("s"), expr("bit_xor(n_tri * (id + 1))").as("x"),
            count(lit(1)).as("nodes"))
          .head()
        val wall = (System.nanoTime() - t0) / 1e9
        // orientation diagnostics (recomputed the operator's way)
        val und = e.select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .filter(col("a") =!= col("b")).distinct()
        val deg = und.select(explode(array(col("a"), col("b"))).as("id"))
          .groupBy("id").agg(count(lit(1)).as("deg"))
        val rawMax = deg.agg(max("deg")).head().getLong(0)
        val out = und
          .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
          .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
          .select(when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")), col("a"))
            .otherwise(col("b")).as("u"))
          .groupBy("u").agg(count(lit(1)).as("c"))
        val od = out.agg(max("c"), sum(expr("c * (c - 1) div 2"))).head()
        println(f"triangles n=$n (hub deg=${n / 20}): $wall%.1f s, " +
          s"tri_sum=${tri.getLong(0)}, nodes=${tri.getLong(2)}, " +
          s"digest=${tri.getLong(1)}, raw_max_deg=$rawMax, " +
          s"oriented_max_out=${od.getLong(0)}, wedge_pairs=${od.getLong(1)}")
        System.out.flush()
      }
      spark.stop(); return
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
