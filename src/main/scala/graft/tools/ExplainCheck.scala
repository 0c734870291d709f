package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.SimSearch

/** Dev tool: print the physical plans of the hot paths for shuffle audit. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    SimSearch.exactTopK(q, e, 10).explain("formatted")
    spark.stop()
  }
}
