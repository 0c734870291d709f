package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.MultimodalQueries
import graft.core.Tables
import graft.embed.{MultimodalFixtures, VideoFrames}

/** Regenerates the committed oracle-fixture parquets under `fixtures/`:
  *
  *  - `multimodal_image_digest.parquet` — expected decode/resize/normalize
  *    stats for the 24 deterministic PNG fixtures (`multimodal_image_decode`
  *    oracle).
  *  - `multimodal_video_digest.parquet` — per-sampled-frame stats for the
  *    12 GVID fixtures (`multimodal_video_frames` oracle).
  *  - `multimodal_phash.parquet` — frozen aHash64 perceptual hashes of
  *    the 24 base PNGs + 6 jittered near-duplicates
  *    (`multimodal_image_phash_dedup` oracle).
  *  - `embedding_bits.parquet` — the sf0.01 embeddings' per-component
  *    IEEE-754 bit patterns zero-extended to BIGINT, plus the float
  *    column the Spark side reads (`dist_hamming` oracle: DuckDB can
  *    popcount-XOR integers, it just can't reinterpret a float's bits).
  *
  * The digests are computed through the SAME functions the catalog queries
  * call (`MultimodalQueries.imageDigest`/`frameDigest`), so the
  * frozen values are bit-identical to a correct run by construction; a
  * later regression in the decode path changes the live values away from
  * the frozen ones and trips the driver's hash gate. `FixtureOracleSpec`
  * fails `sbt test` if these files go stale (testdata refresh or an
  * intentional decode change) — rerun
  * `SPARK_GRAFT_CPUS=4 tools/run.sh graft.tools.GenOracleFixtures`
  * and commit the result.
  */
object GenOracleFixtures {

  /** Raw float bits, zero-extended so BIGINT XOR equals int XOR. Mirrors
    * the VectorDistance.Hamming kernel (floatToRawIntBits per component). */
  def floatBits(emb: Seq[Float]): Array[Long] =
    emb.map(f => java.lang.Float.floatToRawIntBits(f) & 0xffffffffL).toArray

  def imageDigestRows: Seq[(Long, Int, Double, Double)] =
    (0 until 24).map { i =>
      val (n, mean, max) =
        MultimodalQueries.imageDigest(MultimodalFixtures.makePng(i))
      (i.toLong, n, mean, max)
    }

  def videoDigestRows: Seq[(Long, Int, Int, Double)] =
    (0 until 12).flatMap { i =>
      VideoFrames.sampleFrames(MultimodalFixtures.makeVideo(i), stride = 2)
        .map { case (fi, png) =>
          val (n, mean) = MultimodalQueries.frameDigest(png)
          (i.toLong, fi, n, mean)
        }
    }

  /** Expected extraction for the 24 adversarial soup pages, computed
    * through the SAME Html.blocks/extract path the catalog entry runs
    * (shared extractStats) — `text_html_extract_soup` oracle. */
  def htmlExtractRows: Seq[(Long, Int, Int, String)] =
    graft.ops.HtmlFixtures.corpus.map { case (id, html) =>
      val (nBlocks, nKept, _, main) =
        graft.catalog.HtmlQueries.extractStats(html)
      (id, nBlocks, nKept, main)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "fixtures"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    writeOne(imageDigestRows.toDF("vec_id", "n_values", "mean_val", "max_val"),
      s"$outDir/multimodal_image_digest.parquet")
    writeOne(videoDigestRows.toDF("vec_id", "frame_idx", "n_values", "mean_val"),
      s"$outDir/multimodal_video_digest.parquet")

    // Frozen kNN results for the three multimodal retrieval entries,
    // computed through the CATALOG QUERIES THEMSELVES — any regression in
    // decode, embed, or the kNN kernel moves the live result off the
    // recorded one and trips the driver's hash gate.
    writeOne(
      Seq("image" -> MultimodalQueries.imageKnn,
        "audio" -> MultimodalQueries.audioKnn,
        "video" -> MultimodalQueries.videoKnn)
        .map { case (m, q) =>
          q.run(spark, sfDir).select(lit(m).as("modality"),
            col("query_id"), col("vec_id"), col("dist"))
        }
        .reduce(_ unionAll _),
      s"$outDir/multimodal_knn_expected.parquet")

    // Frozen perceptual hashes for the image near-dup gate: all 24 base
    // PNGs plus the 6 planted jittered near-duplicates, hashed through
    // the SAME aHash64 the catalog entry runs.
    writeOne(
      ((0 until 24).map(i =>
        (i.toLong, graft.embed.ImagePhash.aHash64(MultimodalFixtures.makePng(i)))) ++
        (0 until 24).filter(_ % 4 == 0).map(i =>
          (100L + i,
            graft.embed.ImagePhash.aHash64(MultimodalFixtures.makePngJittered(i)))))
        .toDF("vec_id", "phash"),
      s"$outDir/multimodal_phash.parquet")

    // Frozen per-sampled-frame perceptual hashes for the VIDEO near-dup
    // gate: 12 base GVIDs + 4 jittered twins, sampled and hashed through
    // the SAME sampleFrames/aHash64 the catalog entry runs.
    writeOne(
      MultimodalQueries.videoPhashRows.toDF("vec_id", "frame_idx", "phash"),
      s"$outDir/multimodal_video_phash.parquet")

    // Frozen per-time-strip spectrogram hashes for the AUDIO near-dup
    // gate: 12 chord clips + 4 amplitude-scaled twins, hashed through the
    // SAME spectrogram/stripHashes path the catalog entry runs.
    writeOne(
      MultimodalQueries.audioPhashRows.toDF("vec_id", "strip_idx", "phash"),
      s"$outDir/multimodal_audio_phash.parquet")

    // Both the floats AND their bit patterns: the dist_hamming catalog
    // entry reads the floats from THIS file (not the live sfDir) so the
    // entry is scale-factor-independent — Spark side and DuckDB oracle
    // are pinned to the same frozen rows at every SF.
    val bitsUdf = udf(floatBits _)
    writeOne(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"),
          bitsUdf(col("embedding")).as("bits")),
      s"$outDir/embedding_bits.parquet")

    // Frozen expected extraction for the adversarial HTML soup corpus,
    // through the SAME parser the catalog entry runs.
    writeOne(
      htmlExtractRows.toDF("page_id", "n_blocks", "n_kept", "main_text"),
      s"$outDir/html_extract_expected.parquet")

    println(s"[fixtures] wrote 8 fixture parquets to $outDir (bits from $sfDir)")
    spark.stop()
  }

  /** Spark's parquet write lands a directory of part files; the oracle's
    * read_parquet wants one flat file — move the single part out, drop the
    * scaffolding. */
  private def writeOne(df: DataFrame, dest: String): Unit = {
    val tmp = dest + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written under $tmp"))
    Option(Paths.get(dest).getParent).foreach(Files.createDirectories(_))
    Files.move(part.toPath, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(tmp).listFiles().foreach(_.delete())
    Files.deleteIfExists(Paths.get(tmp))
  }
}
