package graft.embed

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E3 + E4: image decode/normalize and a deterministic 768-d image feature
  * embedder (reference: src/model/image.rs).
  *
  * E3 `load_image224` (image.rs:24-43) is reproduced faithfully: decode any
  * ImageIO format, resize-to-fill 224×224 (bilinear), RGB → CHW float
  * tensor, scale /255, ImageNet mean/std normalize.
  *
  * E4 deviates deliberately (SURVEY.md §7.5): the reference flattens the
  * ViT *patch-embedding* output and `try_into`s 151,296 floats into
  * `[f32;768]`, silently yielding the zero vector — "all images embed to
  * ~zero". This engine instead computes a real 768-d feature: 16×16-patch
  * mean pooling per channel (the 14×14×3 = 588 patch grid a ViT-base sees),
  * feature-hashed into 768 signed buckets and unit-normalized. No model
  * weights, deterministic, honors the contract "image → 768-d vector whose
  * distances reflect visual similarity".
  */
final case class ImageFeatureEmbedder(dim: Int = 768, seed: Int = 7) extends Embedder {

  import ImageFeatureEmbedder._

  /** Deterministic feature vector of raw image bytes. Undecodable bytes →
    * zero vector (mirrors the reference's failed-conversion default,
    * model/text.rs:28). */
  def embedImage(bytes: Array[Byte]): Array[Float] = {
    val tensor = loadImage224(bytes)
    if (tensor == null) return new Array[Float](dim)
    // 14x14 grid of 16x16 patches, mean per channel -> 588 features
    val acc = new Array[Double](dim)
    var c = 0
    while (c < 3) {
      var py = 0
      while (py < 14) {
        var px = 0
        while (px < 14) {
          var sum = 0.0
          var y = py * 16
          while (y < (py + 1) * 16) {
            var x = px * 16
            while (x < (px + 1) * 16) {
              sum += tensor(c)(y)(x)
              x += 1
            }
            y += 1
          }
          val mean = sum / 256.0
          val fid = c * 196 + py * 14 + px
          // two signed hashed buckets per feature
          var rep = 0
          while (rep < 2) {
            val h = scala.util.hashing.MurmurHash3.productHash((fid, rep), seed)
            val bucket = math.floorMod(h >>> 1, dim)
            val sign = if ((h & 1) == 0) 1.0 else -1.0
            acc(bucket) += sign * mean
            rep += 1
          }
          px += 1
        }
        py += 1
      }
      c += 1
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) { out(i) = (acc(i) * inv).toFloat; i += 1 }
    out
  }

  override def embed(df: DataFrame, inCol: String, outCol: String): DataFrame = {
    val embedUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) new Array[Float](dim) else embedImage(bytes)
    }
    df.withColumn(outCol, embedUdf(col(inCol).cast("binary")))
  }
}

object ImageFeatureEmbedder {
  // ImageNet normalization constants (reference: image.rs:38-41).
  private val Mean = Array(0.485, 0.456, 0.406)
  private val Std = Array(0.229, 0.224, 0.225)

  /** E3 `load_image224` (image.rs:24-43): decode → 224×224 bilinear resize
    * → CHW double tensor, /255 then ImageNet mean/std. Null on decode
    * failure. */
  def loadImage224(bytes: Array[Byte]): Array[Array[Array[Double]]] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val resized = new BufferedImage(224, 224, BufferedImage.TYPE_INT_RGB)
    val g = resized.createGraphics()
    g.setRenderingHint(
      RenderingHints.KEY_INTERPOLATION, RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 224, 224, null)
    g.dispose()
    val t = Array.ofDim[Double](3, 224, 224)
    var y = 0
    while (y < 224) {
      var x = 0
      while (x < 224) {
        val rgb = resized.getRGB(x, y)
        val r = ((rgb >> 16) & 0xff) / 255.0
        val gg = ((rgb >> 8) & 0xff) / 255.0
        val b = (rgb & 0xff) / 255.0
        t(0)(y)(x) = (r - Mean(0)) / Std(0)
        t(1)(y)(x) = (gg - Mean(1)) / Std(1)
        t(2)(y)(x) = (b - Mean(2)) / Std(2)
        x += 1
      }
      y += 1
    }
    t
  }
}
