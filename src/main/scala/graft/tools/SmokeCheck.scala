package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the driver's t1 smoke in one command — SparkEntry.entry must
  * return rows > 0 on sf0.001. */
object SmokeCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry_rows: $n")
    assert(n > 0)
    spark.stop()
  }
}
