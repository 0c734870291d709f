package graft.catalog

import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.Fixtures
import graft.embed.{AudioSpectrogramEmbedder, ImageFeatureEmbedder, MultimodalFixtures, VideoFrameEmbedder, VideoFrames}
import graft.functions.Distances
import graft.ops.SimSearch

/** Multimodal surface (SURVEY.md §2.4 E3–E7, §2.5 C3/C4): images and audio
  * as opaque BINARY columns flowing through decode → feature-embed → kNN.
  * No binary fixtures ship in /root/testdata (FIXTURES.md §3), so the
  * inputs are deterministic generated PNGs/WAVs. The kNN entries and
  * the decode paths are hash-checked against frozen fixtures (the kNN
  * results themselves are frozen through the SAME pipeline by
  * GenOracleFixtures — a regression anywhere in decode/embed/kNN moves
  * the live result off the recorded one; contracts additionally gated in
  * MultimodalSpec), the decode digests against frozen
  * digest fixtures (`fixtures/multimodal_*_digest.parquet`): the inputs are
  * bit-reproducible, so the expected per-item stats are precomputed once by
  * `graft.tools.GenOracleFixtures` and the oracle is a SELECT from the
  * digest table — a regression anywhere in decode/resize/normalize changes
  * the recorded values and trips the driver's hash gate. */
object MultimodalQueries {

  /** E3 digest: decoded-tensor statistics for one image after resize +
    * ImageNet normalization. Shared by the catalog query, the fixture
    * generator, and FixtureOracleSpec so all three are bit-identical by
    * construction. */
  def imageDigest(bytes: Array[Byte]): (Int, Double, Double) = {
    val t = ImageFeatureEmbedder.loadImage224(bytes)
    if (t == null) (0, 0.0, 0.0)
    else {
      val flat = t.flatten.flatten
      (flat.length,
        math.rint(flat.sum / flat.length * 10000) / 10000,
        math.rint(flat.max * 10000) / 10000)
    }
  }

  /** Per-frame variant of [[imageDigest]] (no max — frame digests
    * track the mean drift across the clip). */
  def frameDigest(png: Array[Byte]): (Int, Double) = {
    val t = ImageFeatureEmbedder.loadImage224(png)
    if (t == null) (0, 0.0)
    else {
      val flat = t.flatten.flatten
      (flat.length, math.rint(flat.sum / flat.length * 10000) / 10000)
    }
  }

  private val imageEmbedder = ImageFeatureEmbedder()
  private val audioEmbedder = AudioSpectrogramEmbedder()

  /** C3 image insert+query: 24 generated PNGs → decode/resize/normalize →
    * 768-d features → cosine kNN, queried with re-generated (bit-identical)
    * images: top-1 must be self at distance 0. */
  val imageKnn = Q(
    "multimodal_image_knn",
    (s, dir) => {
      import s.implicits._
      val images = (0 until 24).map(i => (i.toLong, MultimodalFixtures.makePng(i)))
      val df = images.toDF("vec_id", "document")
      val vecs = imageEmbedder.embed(df, "document", "embedding")
        .select(col("vec_id"), col("embedding"))
      val queries = vecs.filter(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding"))
      SimSearch.exactTopK(queries, vecs, k = 3, metric = Distances.Cosine)
        .orderBy("query_id", "vec_id")
    },
    Some(s"""
      SELECT query_id, vec_id, dist
      FROM read_parquet('${Fixtures.path("multimodal_knn_expected.parquet")}')
      WHERE modality = 'image'
      ORDER BY query_id, vec_id"""))

  /** C4 audio insert+query: sine sweeps + noise clips → spectrogram-as-
    * image (the reference's core audio trick) → 768-d → cosine kNN. */
  val audioKnn = Q(
    "multimodal_audio_knn",
    (s, dir) => {
      import s.implicits._
      val clips =
        (0 until 8).map(i => (i.toLong, MultimodalFixtures.makeWavSine(220.0 * (i + 1)))) ++
          (8 until 12).map(i => (i.toLong, MultimodalFixtures.makeWavNoise(i)))
      val df = clips.toDF("vec_id", "document")
      val vecs = audioEmbedder.embed(df, "document", "embedding")
        .select(col("vec_id"), col("embedding"))
      val queries = vecs.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      SimSearch.exactTopK(queries, vecs, k = 3, metric = Distances.Cosine)
        .orderBy("query_id", "vec_id")
    },
    Some(s"""
      SELECT query_id, vec_id, dist
      FROM read_parquet('${Fixtures.path("multimodal_knn_expected.parquet")}')
      WHERE modality = 'audio'
      ORDER BY query_id, vec_id"""))

  /** E3 decode-path probe: per-image tensor statistics after resize +
    * ImageNet normalization (the plumbing a real ViT would consume). */
  val imageDecodeStats = Q(
    "multimodal_image_decode",
    (s, dir) => {
      import s.implicits._
      val images = (0 until 24).map(i => (i.toLong, MultimodalFixtures.makePng(i)))
      val statsUdf = udf((b: Array[Byte]) => imageDigest(b))
      images.toDF("vec_id", "document")
        .select(col("vec_id"), statsUdf(col("document")).as("s"))
        .select(col("vec_id"), col("s._1").as("n_values"),
          col("s._2").as("mean_val"), col("s._3").as("max_val"))
        .orderBy("vec_id")
    },
    Some(s"""
      SELECT vec_id, n_values, mean_val, max_val
      FROM read_parquet('${Fixtures.path("multimodal_image_digest.parquet")}')
      ORDER BY vec_id"""))

  private val videoEmbedder = VideoFrameEmbedder()

  /** Video frame-sampling: opaque GVID binaries → every 2nd frame exploded
    * to (video, frame_idx) rows → per-frame decoded-tensor stats. The
    * explode happens executor-side inside one projection — a 100 TB video
    * table fans out to frames with no shuffle and no driver involvement. */
  val videoFrames = Q(
    "multimodal_video_frames",
    (s, dir) => {
      import s.implicits._
      val videos = (0 until 12).map(i => (i.toLong, MultimodalFixtures.makeVideo(i)))
      val sampleUdf = udf { (bytes: Array[Byte]) =>
        val sampled = VideoFrames.sampleFrames(bytes, stride = 2)
        if (sampled == null) Array.empty[(Int, Array[Byte])] else sampled
      }
      val statsUdf = udf((b: Array[Byte]) => frameDigest(b))
      videos.toDF("vec_id", "document")
        .select(col("vec_id"), explode(sampleUdf(col("document"))).as("f"))
        .select(col("vec_id"), col("f._1").as("frame_idx"),
          statsUdf(col("f._2")).as("s"))
        .select(col("vec_id"), col("frame_idx"),
          col("s._1").as("n_values"), col("s._2").as("mean_val"))
        .orderBy("vec_id", "frame_idx")
    },
    Some(s"""
      SELECT vec_id, frame_idx, n_values, mean_val
      FROM read_parquet('${Fixtures.path("multimodal_video_digest.parquet")}')
      ORDER BY vec_id, frame_idx"""))

  /** Video kNN: sampled frames → per-frame E4 features → temporal mean
    * pool → cosine kNN, queried with re-generated (bit-identical) videos:
    * top-1 must be self at distance 0. */
  val videoKnn = Q(
    "multimodal_video_knn",
    (s, dir) => {
      import s.implicits._
      val videos = (0 until 12).map(i => (i.toLong, MultimodalFixtures.makeVideo(i)))
      val df = videos.toDF("vec_id", "document")
      val vecs = videoEmbedder.embed(df, "document", "embedding")
        .select(col("vec_id"), col("embedding"))
      val queries = vecs.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      SimSearch.exactTopK(queries, vecs, k = 3, metric = Distances.Cosine)
        .orderBy("query_id", "vec_id")
    },
    Some(s"""
      SELECT query_id, vec_id, dist
      FROM read_parquet('${Fixtures.path("multimodal_knn_expected.parquet")}')
      WHERE modality = 'video'
      ORDER BY query_id, vec_id"""))

  /** Image near-dup dedup via perceptual hashing
    * ([[graft.embed.ImagePhash]]): the multimodal member of the dedup
    * family. Corpus = the 24 fixture PNGs plus 6 planted jittered
    * near-duplicates (ids 100+i); hashes band into 4×16-bit chunks, only
    * bucket-collisions become candidate pairs (the SimHash shape —
    * never all-pairs image comparison), popcount verifies at radius 6.
    * The oracle replays banding + Hamming over the FROZEN hash fixture
    * (regenerated by GenOracleFixtures through the same aHash64 code and
    * staleness-gated in FixtureOracleSpec), so a decode or hash
    * regression breaks the gate while the cascade is checked
    * independently in SQL. */
  val imagePhashDedup = Q(
    "multimodal_image_phash_dedup",
    (s, dir) => {
      import s.implicits._
      val phashUdf = udf((b: Array[Byte]) => graft.embed.ImagePhash.aHash64(b))
      val imgs = ((0 until 24).map(i => (i.toLong, MultimodalFixtures.makePng(i))) ++
        (0 until 24).filter(_ % 4 == 0)
          .map(i => (100L + i, MultimodalFixtures.makePngJittered(i))))
        .toDF("vec_id", "document")
      val hashed = imgs.select(col("vec_id"), phashUdf(col("document")).as("ph"))
      val bands = hashed.select(col("vec_id"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("band"),
            expr(s"shiftright(ph, ${16 * j}) & 65535").as("chunk"))): _*))
          .as("b"))
        .select(col("vec_id"), col("b.band").as("band"), col("b.chunk").as("chunk"))
      val cand = bands.as("a")
        .join(bands.as("b2"),
          col("a.band") === col("b2.band") && col("a.chunk") === col("b2.chunk") &&
            col("a.vec_id") < col("b2.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b2.vec_id").as("id_b"))
        .distinct()
      cand
        .join(hashed.select(col("vec_id").as("id_a"), col("ph").as("ph_a")), "id_a")
        .join(hashed.select(col("vec_id").as("id_b"), col("ph").as("ph_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          expr("bit_count(ph_a ^ ph_b)").cast("long").as("hamming"))
        .filter(col("hamming") <= 6)
        .orderBy("id_a", "id_b")
    },
    Some(s"""
      WITH h AS (SELECT vec_id, phash
                 FROM read_parquet('${Fixtures.path("multimodal_phash.parquet")}')),
      b AS (SELECT vec_id, j.j AS band, (phash >> (16 * j.j)) & 65535 AS chunk
            FROM h, (VALUES (0), (1), (2), (3)) j(j)),
      cand AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
               FROM b a JOIN b b2 ON a.band = b2.band AND a.chunk = b2.chunk
                                 AND a.vec_id < b2.vec_id)
      SELECT id_a, id_b,
             bit_count(xor(ha.phash, hb.phash))::BIGINT AS hamming
      FROM cand
      JOIN h ha ON ha.vec_id = cand.id_a
      JOIN h hb ON hb.vec_id = cand.id_b
      WHERE bit_count(xor(ha.phash, hb.phash)) <= 6
      ORDER BY id_a, id_b"""))

  /** 12-base + 4-planted-twin corpus builders, ONE definition per
    * modality, shared between the catalog entry, the *PhashRows fixture
    * rows, and the staleness spec — so an edit to the corpus (say the
    * twin planting) cannot silently diverge the live Spark side from the
    * frozen oracle rows. */
  private[catalog] def videoPhashCorpus: Seq[(Long, Array[Byte])] =
    (0 until 12).map(i => (i.toLong, MultimodalFixtures.makeVideo(i))) ++
      (0 until 12).filter(_ % 3 == 0)
        .map(i => (100L + i, MultimodalFixtures.makeVideoJittered(i)))

  private[catalog] def audioPhashCorpus: Seq[(Long, Array[Byte])] =
    (0 until 12).map(i => (i.toLong, MultimodalFixtures.makeWavChord(i))) ++
      (0 until 12).filter(_ % 3 == 0)
        .map(i => (100L + i, MultimodalFixtures.makeWavChord(i, ampMil = 985)))

  /** Shared banded perceptual-hash near-dup cascade over per-time-unit
    * hashes `(vec_id, <tCol>, ph)`: each 64-bit hash bands into 4×16-bit
    * chunks, candidates collide on (tCol, band, chunk) — timeline-aligned,
    * never all-pairs — then popcount ≤ 6 verifies each aligned unit and a
    * pair survives when ≥ 3/4 of its compared units are close (integer
    * cross-multiplied). One definition drives BOTH modalities, and
    * [[phashBandOracle]] mirrors it in SQL — a cascade change (radius,
    * vote, band width) cannot apply to one modality and miss the other. */
  private def phashBandDedup(
      hashed: org.apache.spark.sql.DataFrame, tCol: String,
      nName: String): org.apache.spark.sql.DataFrame = {
    val bands = hashed.select(col("vec_id"), col(tCol),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band"),
          expr(s"shiftright(ph, ${16 * j}) & 65535").as("chunk"))): _*))
        .as("b"))
      .select(col("vec_id"), col(tCol),
        col("b.band").as("band"), col("b.chunk").as("chunk"))
    val cand = bands.as("a")
      .join(bands.as("b2"),
        col(s"a.$tCol") === col(s"b2.$tCol") &&
          col("a.band") === col("b2.band") &&
          col("a.chunk") === col("b2.chunk") &&
          col("a.vec_id") < col("b2.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b2.vec_id").as("id_b"))
      .distinct()
    cand
      .join(hashed.select(col("vec_id").as("id_a"), col(tCol),
        col("ph").as("ph_a")), "id_a")
      .join(hashed.select(col("vec_id").as("id_b"), col(tCol),
        col("ph").as("ph_b")), Seq("id_b", tCol))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as(nName),
        sum(when(expr("bit_count(ph_a ^ ph_b)") <= 6, 1L).otherwise(0L))
          .as("n_close"))
      .filter(col("n_close") * 4 >= col(nName) * 3)
      .select(col("id_a"), col("id_b"), col(nName), col("n_close"))
      .orderBy("id_a", "id_b")
  }

  /** SQL twin of [[phashBandDedup]] over a frozen `(vec_id, <tCol>,
    * phash)` fixture. */
  private def phashBandOracle(
      fixture: String, tCol: String, nName: String): String = s"""
      WITH h AS (SELECT vec_id, $tCol, phash
                 FROM read_parquet('${Fixtures.path(fixture)}')),
      b AS (SELECT vec_id, $tCol, j.j AS band,
                   (phash >> (16 * j.j)) & 65535 AS chunk
            FROM h, (VALUES (0), (1), (2), (3)) j(j)),
      cand AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
               FROM b a JOIN b b2 ON a.$tCol = b2.$tCol
                                 AND a.band = b2.band AND a.chunk = b2.chunk
                                 AND a.vec_id < b2.vec_id),
      v AS (SELECT c.id_a, c.id_b, count(*) AS $nName,
                   coalesce(sum(CASE WHEN bit_count(xor(ha.phash, hb.phash)) <= 6
                                     THEN 1 END), 0) AS n_close
            FROM cand c
            JOIN h ha ON ha.vec_id = c.id_a
            JOIN h hb ON hb.vec_id = c.id_b AND hb.$tCol = ha.$tCol
            GROUP BY c.id_a, c.id_b)
      SELECT id_a, id_b, $nName::BIGINT AS $nName,
             n_close::BIGINT AS n_close
      FROM v WHERE n_close * 4 >= $nName * 3
      ORDER BY id_a, id_b"""

  /** The video near-dup corpus's per-sampled-frame perceptual hashes —
    * shared by the fixture generator and the staleness spec so the frozen
    * oracle rows are bit-identical to the catalog entry's live pipeline
    * (same makeVideo/sampleFrames/aHash64 functions throughout). */
  def videoPhashRows: Seq[(Long, Int, Long)] =
    videoPhashCorpus.flatMap { case (id, bytes) =>
      VideoFrames.sampleFrames(bytes, stride = 2).toSeq.map { case (fi, png) =>
        (id, fi, graft.embed.ImagePhash.aHash64(png))
      }
    }

  /** VIDEO near-dup dedup — the temporal composition of
    * [[imagePhashDedup]]: sample frames (stride 2) → per-frame aHash64 →
    * band each frame hash into 4×16-bit chunks → candidates collide on
    * (frame_idx, band, chunk) (never all-pairs video comparison, and a
    * clip can only pair with a video sharing its TIMELINE, not just one
    * still) → verify per shared frame index with popcount ≤ 6 → a pair is
    * a near-dup when ≥ 3/4 of its compared frames are close (integer
    * cross-multiplied). Corpus = 12 GVID fixtures + 4 planted re-encode
    * twins (every frame byte-distinct but perceptually unchanged). The
    * oracle replays banding + Hamming + the majority vote over the FROZEN
    * per-frame hash fixture (regenerated through the same code by
    * GenOracleFixtures, staleness-gated in FixtureOracleSpec), so a
    * decode/sample/hash regression breaks the gate while the cascade is
    * independently SQL-checked. */
  val videoPhashDedup = Q(
    "multimodal_video_phash_dedup",
    (s, dir) => {
      import s.implicits._
      val sampleUdf = udf { (bytes: Array[Byte]) =>
        val sampled = VideoFrames.sampleFrames(bytes, stride = 2)
        if (sampled == null) Array.empty[(Int, Array[Byte])] else sampled
      }
      val phashUdf = udf((b: Array[Byte]) => graft.embed.ImagePhash.aHash64(b))
      val hashed = videoPhashCorpus.toDF("vec_id", "document")
        .select(col("vec_id"), explode(sampleUdf(col("document"))).as("f"))
        .select(col("vec_id"), col("f._1").as("frame_idx"),
          phashUdf(col("f._2")).as("ph"))
        .localCheckpoint(eager = true) // decode+hash once, not per consumer
      phashBandDedup(hashed, "frame_idx", "n_frames")
    },
    Some(phashBandOracle(
      "multimodal_video_phash.parquet", "frame_idx", "n_frames")))

  /** The audio near-dup corpus's per-time-strip perceptual hashes — shared
    * by the fixture generator and the staleness spec (same
    * makeWavChord/stripHashes code path as the catalog entry). */
  def audioPhashRows: Seq[(Long, Int, Long)] =
    audioPhashCorpus.flatMap { case (id, bytes) =>
      graft.embed.AudioPhash.stripHashes(bytes).toSeq.map { case (s, h) =>
        (id, s, h)
      }
    }

  /** AUDIO near-dup dedup — the audio member of the pHash family, through
    * the reference's audio-as-spectrogram-picture trick
    * ([[graft.embed.AudioPhash]]): spectrogram PNG → 4 TIME strips →
    * per-strip aHash64 → band each strip hash into 4×16-bit chunks →
    * candidates collide on (strip_idx, band, chunk) → per-strip popcount
    * ≤ 6 verify → near-dup when ≥ 3/4 of strips are close. Corpus = 12
    * two-segment harmonic-chord clips + 4 planted amplitude-scaled twins
    * (the re-mastered/re-encoded copy: log-magnitude shifts by a constant,
    * so strip hashes barely move while the bytes are entirely distinct).
    * Same frozen-fixture oracle pattern as the image/video entries. */
  val audioPhashDedup = Q(
    "multimodal_audio_phash_dedup",
    (s, dir) => {
      import s.implicits._
      val stripUdf = udf { (bytes: Array[Byte]) =>
        val hs = graft.embed.AudioPhash.stripHashes(bytes)
        if (hs == null) Array.empty[(Int, Long)] else hs
      }
      val hashed = audioPhashCorpus.toDF("vec_id", "document")
        .select(col("vec_id"), explode(stripUdf(col("document"))).as("f"))
        .select(col("vec_id"), col("f._1").as("strip_idx"),
          col("f._2").as("ph"))
        .localCheckpoint(eager = true) // decode+FFT+hash once, not per consumer
      phashBandDedup(hashed, "strip_idx", "n_strips")
    },
    Some(phashBandOracle(
      "multimodal_audio_phash.parquet", "strip_idx", "n_strips")))

  def qs: Seq[Q] = Seq(imageKnn, audioKnn, imageDecodeStats, videoFrames,
    videoKnn, imagePhashDedup, videoPhashDedup, audioPhashDedup)
}
