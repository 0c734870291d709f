package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall-clock probe for the PassJoin catalog entry at a given SF (the
  * catalog gate checks correctness; this checks the fixed-overhead budget
  * — the entry regressed to ~5 s when its probe enumeration was a
  * 75-branch higher-order `filter(array(CASE...))`, which Spark evaluates
  * interpreted; the explode-then-compute form stays in codegen). The
  * corpus comes from TextMatchQueries.fuzzyCorpus — the exact workload the
  * catalog entry runs. */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    val strs = graft.catalog.TextMatchQueries.fuzzyCorpus(s, dir)
    println("n strings: " + strs.count())
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.ops.FuzzyJoin.selfJoin(strs, d = 2).count()
      println(f"round $round: $n pairs in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
