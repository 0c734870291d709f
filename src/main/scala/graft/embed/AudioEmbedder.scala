package graft.embed

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E5–E7: audio decode → log spectrogram → image → 768-d embedding
  * (reference: src/model/audio.rs). The reference's key trick is preserved:
  * **audio is embedded as a picture of its spectrogram** (audio.rs:86-99) —
  * the audio path reduces to the image path.
  *
  *  - E5 `audio_to_data` (audio.rs:35-75): decode (JVM: javax.sound WAV/PCM
  *    — fixture scope; the reference uses symphonia for any container),
  *    interleaved 16-bit samples + rate.
  *  - E6 `audio_to_image_tensor224` (audio.rs:86-99): 1024-point Hann FFT,
  *    hop 512, 512 magnitude bins, log scale, rendered into a 224×224
  *    grayscale PNG (the reference uses a rainbow colormap — cosmetic;
  *    deviation documented).
  *  - E7: E5 + E6 composed with [[ImageFeatureEmbedder]] (the ViT stand-in).
  */
final case class AudioSpectrogramEmbedder(dim: Int = 768, seed: Int = 7)
    extends Embedder {

  private val imageEmbedder = ImageFeatureEmbedder(dim, seed)

  def embedAudio(bytes: Array[Byte]): Array[Float] = {
    val png = AudioSpectrogramEmbedder.spectrogramPng(bytes)
    if (png == null) new Array[Float](dim) else imageEmbedder.embedImage(png)
  }

  override def embed(df: DataFrame, inCol: String, outCol: String): DataFrame = {
    val embedUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) new Array[Float](dim) else embedAudio(bytes)
    }
    df.withColumn(outCol, embedUdf(col(inCol).cast("binary")))
  }
}

object AudioSpectrogramEmbedder {

  /** E5: WAV bytes → (interleaved 16-bit samples, sample rate). Null on
    * undecodable input. */
  def audioToSamples(bytes: Array[Byte]): (Array[Short], Float) = {
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val frameSize = fmt.getFrameSize
      val raw = in.readAllBytes()
      in.close()
      val n = raw.length / 2
      val samples = new Array[Short](n)
      val bigEndian = fmt.isBigEndian
      var i = 0
      while (i < n) {
        val lo = raw(2 * i) & 0xff
        val hi = raw(2 * i + 1) & 0xff
        samples(i) =
          (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort
        i += 1
      }
      val _ = frameSize
      (samples, fmt.getSampleRate)
    } catch { case _: Exception => null }
  }

  /** In-place iterative radix-2 FFT (re, im modified). */
  private def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
          val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** E6: WAV bytes → 224×224 grayscale spectrogram PNG (512-bin log-
    * magnitude STFT, Hann window 1024, hop 512). Null if undecodable. */
  def spectrogramPng(bytes: Array[Byte]): Array[Byte] = {
    val decoded = audioToSamples(bytes)
    if (decoded == null) return null
    val (samples, _) = decoded
    if (samples.length < 1024) return null
    val win = 1024
    val hop = 512
    val frames = (samples.length - win) / hop + 1
    val bins = 512
    val spec = Array.ofDim[Double](frames, bins)
    val hann = Array.tabulate(win)(i =>
      0.5 * (1 - math.cos(2.0 * math.Pi * i / (win - 1))))
    var f = 0
    var maxDb = Double.MinValue
    var minDb = Double.MaxValue
    while (f < frames) {
      val re = new Array[Double](win)
      val im = new Array[Double](win)
      var i = 0
      while (i < win) {
        re(i) = samples(f * hop + i) / 32768.0 * hann(i)
        i += 1
      }
      fft(re, im)
      var b = 0
      while (b < bins) {
        val mag = math.sqrt(re(b) * re(b) + im(b) * im(b))
        val db = 20.0 * math.log10(mag + 1e-10)
        spec(f)(b) = db
        if (db > maxDb) maxDb = db
        if (db < minDb) minDb = db
        b += 1
      }
      f += 1
    }
    val range = math.max(maxDb - minDb, 1e-9)
    val img = new BufferedImage(224, 224, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 224) {
      var x = 0
      while (x < 224) {
        // x → time frame, y → frequency bin (low at bottom)
        val fr = math.min(frames - 1, x * frames / 224)
        val b = math.min(bins - 1, (223 - y) * bins / 224)
        val v = ((spec(fr)(b) - minDb) / range * 255.0).toInt.max(0).min(255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }
}

/** Perceptual AUDIO hash — the audio member of the pHash dedup family,
  * through the reference's own audio-as-spectrogram-picture trick: the
  * clip's spectrogram PNG splits into `strips` equal TIME strips and each
  * strip gets an [[ImagePhash.aHash64]]. Per-strip hashing is what makes
  * the hash discriminative (a whole-clip hash of a mostly-dark spectrogram
  * collapses distinct clips to within a bit or two) and gives dedup its
  * timeline alignment: two clips can only match strip-for-strip. */
object AudioPhash {

  /** (strip_idx, aHash64) per time strip; null when undecodable. */
  def stripHashes(bytes: Array[Byte], strips: Int = 4): Array[(Int, Long)] = {
    val png = AudioSpectrogramEmbedder.spectrogramPng(bytes)
    if (png == null) return null
    val img = ImageIO.read(new ByteArrayInputStream(png))
    if (img == null) return null
    (0 until strips).map { s =>
      val sub = img.getSubimage(
        s * img.getWidth / strips, 0, img.getWidth / strips, img.getHeight)
      val out = new ByteArrayOutputStream()
      ImageIO.write(sub, "png", out)
      (s, ImagePhash.aHash64(out.toByteArray))
    }.toArray
  }
}
