package graft.embed

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Perceptual hashing for image near-dup detection — the multimodal
  * member of the dedup family (SimHash : text :: aHash : images). The
  * 64-bit average hash: decode, 8×8 block-mean downsample to grayscale,
  * threshold each cell against the global mean — a recompression, small
  * brightness shift, or light noise moves few bits, so near-duplicate
  * images land within a small Hamming radius while distinct images are
  * ~32 bits apart in expectation.
  *
  * Determinism: our PNG fixtures decode bit-identically through ImageIO
  * and the arithmetic is integer (sums and one integer mean), so the
  * hash is frozen-fixture-gateable (FixtureOracleSpec) like the decode
  * digests. At scale the hash is one narrow map over the binary column;
  * dedup then reuses the banded-signature shape shared with SimHash:
  * only (band, 16-bit chunk) keys shuffle, candidates verify by
  * popcount — never an all-pairs image comparison.
  */
object ImagePhash {

  /** 64-bit aHash; bit (r*8 + c), LSB-first, is 1 iff block (r, c)'s mean
    * luma exceeds the global mean (strict — ties to 0). Null/undecodable
    * bytes hash to 0L (the engine's null-embedding convention). */
  def aHash64(bytes: Array[Byte]): Long = {
    if (bytes == null) return 0L
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return 0L
    val w = img.getWidth
    val h = img.getHeight
    if (w < 8 || h < 8) return 0L
    // integer luma sums per 8x8 block grid (block edges by integer div —
    // exact, no resampling filter to disagree about)
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val r = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val c = math.min(x * 8 / w, 7)
        val rgb = img.getRGB(x, y)
        // integer ITU-R 601 luma: (77 R + 150 G + 29 B) >> 8
        val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
          29 * (rgb & 0xff)) >> 8
        val i = r * 8 + c
        sums(i) += luma
        counts(i) += 1
        x += 1
      }
      y += 1
    }
    var total = 0L
    var n = 0L
    var i = 0
    while (i < 64) { total += sums(i); n += counts(i); i += 1 }
    val mean = total / n // integer mean — deterministic
    var hash = 0L
    i = 0
    while (i < 64) {
      if (sums(i) / counts(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }
}
