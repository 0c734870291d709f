package graft.embed

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Video as an opaque BINARY column: container parse → frame-sample →
  * per-frame decode/embed → temporal mean-pool (the builder brief's
  * multimodal frame-sampling path; the reference stops at images/audio).
  *
  * No video codec ships in this container, so the FORMAT is a deliberate
  * stub: `"GVID" | int32 nFrames | nFrames x (int32 len | PNG bytes)`
  * (little-endian). Everything around that codec — the opaque-binary
  * schema, frame explosion, deterministic sampling stride, per-frame
  * image decode + feature embed, pooling back to one vector per video —
  * is the real Spark plumbing; swap [[VideoFrames.decodeFrames]] for an
  * ffmpeg/JavaCV demuxer and nothing else changes. */
object VideoFrames {
  private val Magic = Array[Byte]('G', 'V', 'I', 'D')

  def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val size = 8 + frames.map(4 + _.length).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic).putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** All frames, or null when the bytes are not a GVID container (the
    * same degrade-to-null contract as image/audio decode). */
  def decodeFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
    if (bytes == null || bytes.length < 8) return null
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    buf.get(magic)
    if (!java.util.Arrays.equals(magic, Magic)) return null
    val n = buf.getInt
    if (n < 0 || n > (1 << 20)) return null
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (buf.remaining() < 4) return null
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return null
      val f = new Array[Byte](len)
      buf.get(f)
      out(i) = f
      i += 1
    }
    out
  }

  /** Every `stride`-th frame starting at 0 — the deterministic sampling a
    * training pipeline uses so re-runs pick identical frames. */
  def sampleFrames(bytes: Array[Byte], stride: Int): Array[(Int, Array[Byte])] = {
    val all = decodeFrames(bytes)
    if (all == null) null
    else (0 until all.length by math.max(1, stride)).map(i => (i, all(i))).toArray
  }
}

/** Sampled frames through the image feature path (E4), mean-pooled over
  * time and re-normalized — one unit vector per video. */
final case class VideoFrameEmbedder(stride: Int = 2, dim: Int = 768, seed: Int = 7)
    extends Embedder {

  private val frameEmbedder = ImageFeatureEmbedder(dim, seed)

  def embedVideo(bytes: Array[Byte]): Array[Float] = {
    val sampled = VideoFrames.sampleFrames(bytes, stride)
    if (sampled == null || sampled.isEmpty) return new Array[Float](dim)
    val acc = new Array[Double](dim)
    var used = 0
    sampled.foreach { case (_, png) =>
      val v = frameEmbedder.embedImage(png)
      if (v != null) {
        var i = 0
        while (i < dim) { acc(i) += v(i); i += 1 }
        used += 1
      }
    }
    if (used == 0) return new Array[Float](dim)
    var norm = 0.0
    var i = 0
    while (i < dim) { acc(i) /= used; norm += acc(i) * acc(i); i += 1 }
    val inv = if (norm == 0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) { out(i) = (acc(i) * inv).toFloat; i += 1 }
    out
  }

  override def embed(df: DataFrame, inCol: String, outCol: String): DataFrame = {
    val u = udf((b: Array[Byte]) => embedVideo(b))
    df.withColumn(outCol, u(col(inCol)))
  }
}
