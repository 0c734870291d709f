package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Fixtures, Tables}
import graft.tools.GenOracleFixtures

/** Staleness gate for the committed oracle-fixture parquets (fixtures/):
  * every fixture is recomputed in-process through the same shared functions
  * the catalog queries use and compared value-for-value against the frozen
  * file. Goes red when the testdata embeddings are regenerated or the
  * decode path changes — the fix is rerunning graft.tools.GenOracleFixtures
  * and committing, never hand-editing. */
class FixtureOracleSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("image digest fixture matches a live recompute") {
    val frozen = spark.read.parquet(Fixtures.path("multimodal_image_digest.parquet"))
      .as[(Long, Int, Double, Double)].collect().sortBy(_._1).toSeq
    assert(frozen == GenOracleFixtures.imageDigestRows)
  }

  test("video frame digest fixture matches a live recompute") {
    val frozen = spark.read.parquet(Fixtures.path("multimodal_video_digest.parquet"))
      .as[(Long, Int, Int, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(frozen == GenOracleFixtures.videoDigestRows)
  }

  test("multimodal kNN expected-result fixture matches live pipeline runs") {
    for ((m, q) <- Seq(
        "image" -> graft.catalog.MultimodalQueries.imageKnn,
        "audio" -> graft.catalog.MultimodalQueries.audioKnn,
        "video" -> graft.catalog.MultimodalQueries.videoKnn)) {
      val live = q.run(spark, "unused")
        .orderBy("query_id", "vec_id").collect().toSeq
      val frozen = spark.read
        .parquet(Fixtures.path("multimodal_knn_expected.parquet"))
        .filter(col("modality") === m)
        .select("query_id", "vec_id", "dist")
        .orderBy("query_id", "vec_id").collect().toSeq
      assert(live == frozen,
        s"stale multimodal_knn_expected ($m) — rerun GenOracleFixtures")
    }
  }

  test("phash fixture matches a live aHash recompute") {
    val live = ((0 until 24).map(i =>
      i.toLong -> graft.embed.ImagePhash.aHash64(
        graft.embed.MultimodalFixtures.makePng(i))) ++
      (0 until 24).filter(_ % 4 == 0).map(i =>
        (100L + i) -> graft.embed.ImagePhash.aHash64(
          graft.embed.MultimodalFixtures.makePngJittered(i)))).toMap
    val frozen = spark.read.parquet(Fixtures.path("multimodal_phash.parquet"))
      .as[(Long, Long)].collect().toMap
    assert(frozen == live, "stale multimodal_phash.parquet — rerun GenOracleFixtures")
  }

  test("video phash fixture matches a live sample+hash recompute") {
    val live = graft.catalog.MultimodalQueries.videoPhashRows
      .sortBy(r => (r._1, r._2))
    val frozen = spark.read.parquet(Fixtures.path("multimodal_video_phash.parquet"))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(frozen == live, "stale multimodal_video_phash.parquet — rerun GenOracleFixtures")
  }

  test("audio phash fixture matches a live spectrogram+hash recompute") {
    val live = graft.catalog.MultimodalQueries.audioPhashRows
      .sortBy(r => (r._1, r._2))
    val frozen = spark.read.parquet(Fixtures.path("multimodal_audio_phash.parquet"))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(frozen == live, "stale multimodal_audio_phash.parquet — rerun GenOracleFixtures")
  }

  test("embedding bit fixture matches the sf0.01 embeddings' raw float bits") {
    val live = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, emb) =>
        id -> (emb, GenOracleFixtures.floatBits(emb).toSeq)
      }
      .toMap
    val frozen = spark.read.parquet(Fixtures.path("embedding_bits.parquet"))
      .select(col("vec_id"), col("embedding"), col("bits"))
      .as[(Long, Seq[Float], Seq[Long])].collect()
      .map { case (id, emb, bits) => id -> (emb, bits) }
      .toMap
    assert(frozen.keySet == live.keySet)
    // spot mismatches with a useful message rather than a giant diff; the
    // float column matters too — dist_hamming's SPARK side reads it
    val bad = live.collect { case (id, v) if frozen(id) != v => id }
    assert(bad.isEmpty, s"stale fixture rows for vec_ids: ${bad.take(5).toList}")
  }

  test("html extraction fixture matches a live parse of the soup corpus") {
    val live = GenOracleFixtures.htmlExtractRows.sortBy(_._1)
    val frozen = spark.read
      .parquet(Fixtures.path("html_extract_expected.parquet"))
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(frozen == live,
      "stale html_extract_expected.parquet — rerun GenOracleFixtures")
  }
}
