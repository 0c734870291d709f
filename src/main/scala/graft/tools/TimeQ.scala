package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time named catalog queries (warmup + N samples each),
  * printing every sample — exposes first-run vs warm cost and variance,
  * which the bench's single min hides. Usage:
  *   tools/run.sh graft.tools.TimeQ <sfDir> <iters> <name,name,...>
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names =
      if (args.length > 2) args(2).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench: don't let codegen-cache thrash masquerade as query cost
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val samples = (0 until (iters + 1)).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s cold=${samples.head}%6.2f  warm: " +
        samples.tail.map(t => f"$t%5.2f").mkString(" "))
    }
    spark.stop()
  }
}
