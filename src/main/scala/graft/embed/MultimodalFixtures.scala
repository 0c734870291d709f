package graft.embed

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Deterministic in-memory image/audio fixtures (FIXTURES.md §3): no binary
  * files ship in /root/testdata, so the multimodal paths are exercised on
  * generated PNGs (solid colors + gradients) and WAV sine/noise clips —
  * mirroring the reference's accepted inputs without any model downloads. */
object MultimodalFixtures {

  /** PNG idx: a deterministic 64×64 image — hue rotates with idx, with an
    * idx-dependent diagonal gradient (distinct images embed apart; equal
    * idx bytes are identical). */
  def makePng(idx: Int): Array[Byte] = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    val r0 = (idx * 53) % 256
    val g0 = (idx * 97) % 256
    val b0 = (idx * 193) % 256
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val grad = ((x + y) * (idx % 7 + 1)) % 256
        val r = (r0 + grad) % 256
        val g = (g0 + (x * 2)) % 256
        val b = (b0 + (y * 2)) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** [[makePng]] with a tiny deterministic perturbation (+2 on the blue
    * channel of every 16th pixel) — a planted NEAR-duplicate: the change
    * is invisible to an 8×8 block-mean perceptual hash (a few bits at
    * most), while remaining a distinct byte stream. */
  def makePngJittered(idx: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(makePng(idx)))
    var y = 0
    while (y < 64) {
      var x = y % 4
      while (x < 64) {
        if ((x + y * 64) % 16 == 0) {
          val rgb = img.getRGB(x, y)
          val b = math.min(255, (rgb & 0xff) + 2)
          img.setRGB(x, y, (rgb & 0xffffff00) | b)
        }
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** GVID "video" idx: `nFrames` PNG frames whose content drifts with the
    * frame index — deterministic, distinct per idx, re-generable
    * bit-identically (the self-retrieval property video kNN needs). */
  def makeVideo(idx: Int, nFrames: Int = 8): Array[Byte] =
    VideoFrames.encode((0 until nFrames).map(f => makePng(idx * 131 + f)))

  /** Mono 16-bit PCM WAV: `freqHz` sine, 0.5 s at 8 kHz (deterministic). */
  def makeWavSine(freqHz: Double, rate: Float = 8000f, seconds: Double = 0.5): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (math.sin(2.0 * math.Pi * freqHz * i / rate) * 12000).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    wrapWav(pcm, rate)
  }

  /** Mono 16-bit PCM WAV of seeded uniform noise. */
  def makeWavNoise(seed: Int, rate: Float = 8000f, seconds: Double = 0.5): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = rng.nextInt(24000) - 12000
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    wrapWav(pcm, rate)
  }

  private def wrapWav(pcm: Array[Byte], rate: Float): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, 1, true, false) // 16-bit LE mono
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
