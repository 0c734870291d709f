package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock probe for the PassJoin catalog entry at a given SF (the
  * catalog gate checks correctness; this checks the fixed-overhead budget
  * — the entry regressed to ~5 s when its probe enumeration was a
  * 75-branch higher-order `filter(array(CASE...))`, which Spark evaluates
  * interpreted; the explode-then-compute form stays in codegen). */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    val docs = graft.core.Tables.documents(s, dir)
    val orig = docs.select(col("doc_id").as("id"),
      substring(col("text"), 1, 24).as("s"))
    val mut = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("s0"),
        (col("doc_id") % 20 + 2).cast("int").as("p"))
      .select(col("doc_id"), col("p"),
        expr("concat(substr(s0, 1, p-1), 'z', substr(s0, p+1, 100))").as("m"))
      .select((col("doc_id") + 100000).as("id"),
        when(col("doc_id") % 10 === 0,
          expr("concat(substr(m, 1, p+2), substr(m, p+4, 100))"))
          .otherwise(col("m")).as("s"))
    val strs = orig.unionAll(mut)
    println("n strings: " + strs.count())
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.ops.FuzzyJoin.selfJoin(strs, d = 2).count()
      println(f"round $round: $n pairs in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
