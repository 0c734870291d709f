package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.index.LshForest
import graft.ops.SimSearch

/** Dev tool: recall/candidate-count vs searchK for the forest.
  * Usage: tools/run.sh graft.tools.LshTune [sfDir] [nQueries] [sk,sk,...] */
object LshTune {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val nq = if (args.length > 1) args(1).toInt else 20
    val sks = (if (args.length > 2) args(2) else "10,20,40,80,150,250")
      .split(",").map(_.toInt).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir).cache()
    val queries = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val model = LshForest.build(emb)
    val buckets = LshForest.bucketTable(emb, model).cache()
    val exact = SimSearch.exactTopK(queries, emb, k = 10).cache()
    val maxLeaf = buckets.groupBy("tree_id", "leaf_id").count().agg(max("count")).head().getLong(0)
    println(s"n=${emb.count()} maxLeaf=$maxLeaf trees=${model.numTrees}")
    sks.foreach { sk =>
      val cand = LshForest.candidates(queries, buckets, model, sk)
      val nCand = cand.count() / nq
      val approx = LshForest.topK(queries, buckets, emb, model, k = 10, searchKOpt = Some(sk))
      val r = SimSearch.recallAtK(approx, exact)
      println(f"searchK=$sk candidates/query=$nCand recall@10=$r%.4f")
    }
    spark.stop()
  }
}
