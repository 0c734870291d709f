package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.SimSearch

/** Dev tool: print physical plans for shuffle audit. With no args, the
  * exact-kNN hot path; otherwise each arg is a catalog query name
  * (optionally preceded by an sf dir):
  *   tools/run.sh graft.tools.ExplainCheck [sfDir] q_events_asof ...
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (dir, names) =
      if (args.headOption.exists(_.startsWith("/")))
        (args.head, args.tail.toSeq)
      else ("/root/testdata/sf0.001", args.toSeq)
    if (names.isEmpty) {
      val e = Tables.embeddings(spark, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      SimSearch.exactTopK(q, e, 10).explain("formatted")
    } else names.foreach { n =>
      println(s"===== $n =====")
      // streamplan:<family> — the pre-start plan of nearDupPairsStream on a
      // MemoryStream input (the catalog gates only expose the SINK read's
      // trivial plan; this shows the fan-out projection + state operator,
      // the part the r16 binary wire format changed)
      if (n.startsWith("streamplan:")) {
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        import spark.implicits._
        val mem = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(java.sql.Timestamp, Long, String)]
        graft.streaming.StreamOps
          .nearDupPairsStream(mem.toDF().toDF("ts", "doc_id", "text"),
            family = n.stripPrefix("streamplan:"))
          .explain("extended")
      } else graft.Catalog.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
