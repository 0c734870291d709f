package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.embed.{AudioSpectrogramEmbedder, Embedder, HashingTextEmbedder, ImageFeatureEmbedder}
import graft.engine.{EngineConfig, ZebraEngine}

/** CLI driver — the reference's `main.rs` surface (C1–C5, SURVEY.md §2.5):
  * `<modality> insert|insert-from-files|query|clear` against an engine
  * directory. Modalities mirror the reference's defaults
  * (src/database/default/): text = 384-d l2sq, image/audio = 768-d cosine.
  *
  * {{{
  *   graft.tools.Cli text   insert <engine-dir> "some document" ...
  *   graft.tools.Cli text   insert-from-files <engine-dir> <file|dir> ...
  *   graft.tools.Cli text   query  <engine-dir> "query text" [k]
  *   graft.tools.Cli image  insert-from-files <engine-dir> <file|dir> ...
  *   graft.tools.Cli audio  query-from-files <engine-dir> <wav> [k]
  *   graft.tools.Cli <mod>  clear  <engine-dir>
  * }}}
  */
object Cli {

  private def embedderFor(modality: String): (Embedder, EngineConfig) =
    modality match {
      case "text" => (HashingTextEmbedder(), EngineConfig(dim = 384, metric = "l2sq"))
      case "image" => (ImageFeatureEmbedder(), EngineConfig(dim = 768, metric = "cosine"))
      case "audio" => (AudioSpectrogramEmbedder(), EngineConfig(dim = 768, metric = "cosine"))
      case other => sys.error(s"unknown modality: $other (text|image|audio)")
    }

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: Cli <text|image|audio> <insert|insert-from-files|query|query-from-files|clear> <engine-dir> [args...]")
      sys.exit(2)
    }
    val Array(modality, cmd, dir) = args.take(3)
    val rest = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val (embedder, config) = embedderFor(modality)
    val engine = ZebraEngine.openOrCreate(spark, dir, config)

    val t0 = System.nanoTime()
    cmd match {
      case "insert" => // C1: documents from CLI args (text only)
        val docs = rest.zipWithIndex
          .map { case (t, i) => (f"cli${System.nanoTime()}%x$i%04d", t.getBytes("UTF-8")) }
          .toDF("id", "document")
        engine.insertDocuments(docs, embedder)
        println(s"inserted ${rest.length} documents")

      case "insert-from-files" => // C1/C3/C4: binaryFile source, like the reference's dir walk
        val paths = rest.mkString(",")
        val files = spark.read.format("binaryFile").load(paths)
          .select(col("path").as("id"), col("content").as("document"))
        engine.insertDocuments(files, embedder)
        println(s"inserted ${files.count()} files")

      case "query" => // C2: query strings, k defaults to 1 (reference main.rs:86-87)
        val (texts, k) = rest.lastOption.flatMap(x => scala.util.Try(x.toInt).toOption) match {
          case Some(n) if rest.length > 1 => (rest.dropRight(1), n)
          case _ => (rest, 1)
        }
        val queries = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t.getBytes("UTF-8")) }
          .toDF("query_id", "document")
        engine.queryDocuments(queries, embedder, k)
          .select(col("query_id"), col("id"), col("dist"),
            substring(col("document").cast("string"), 1, 80).as("preview"))
          .orderBy("query_id", "dist")
          .show(100, truncate = false)

      case "query-from-files" => // C3/C4 query with binary inputs
        val (paths, k) = rest.lastOption.flatMap(x => scala.util.Try(x.toInt).toOption) match {
          case Some(n) if rest.length > 1 => (rest.dropRight(1), n)
          case _ => (rest, 1)
        }
        val queries = spark.read.format("binaryFile").load(paths: _*)
          .select(col("path").as("query_id"), col("content").as("document"))
        engine.queryDocuments(queries, embedder, k)
          .select(col("query_id"), col("id"), col("dist"))
          .orderBy("query_id", "dist")
          .show(100, truncate = false)

      case "clear" => // C5
        engine.clear()
        println("cleared")

      case other => sys.error(s"unknown command: $other")
    }
    println(f"done in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
