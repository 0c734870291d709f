package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.index.LshForest
import graft.ops.SimSearch

/** Dev tool: recall/candidate-count vs searchK for the forest. */
object LshTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val model = LshForest.build(emb)
    val buckets = LshForest.bucketTable(emb, model).cache()
    val exact = SimSearch.exactTopK(queries, emb, k = 10).cache()
    val maxLeaf = buckets.groupBy("tree_id", "leaf_id").count().agg(max("count")).head().getLong(0)
    println(s"maxLeaf=$maxLeaf trees=${model.numTrees}")
    Seq(10, 20, 30, 40, 60).foreach { sk =>
      val cand = LshForest.candidates(queries, buckets, model, sk)
      val nCand = cand.count() / 5
      val approx = LshForest.topK(queries, buckets, emb, model, k = 10, searchKOpt = Some(sk))
      val r = SimSearch.recallAtK(approx, exact)
      println(s"searchK=$sk candidates/query=$nCand recall@10=$r")
    }
    spark.stop()
  }
}
