package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** The MinHash signature kernel shared by the batch banding pipeline
  * (`DedupQueries.bandsOf`) and the streaming near-dup detector
  * (`StreamOps.nearDupPairsStream`): sig[j-1] = min over word-3-gram
  * shingles of md5(j || '|' || shingle), as 32-char lowercase hex.
  *
  * Computed in ONE tight JVM loop per row instead of the declarative
  * explode → md5 → groupBy-min form: the HOF equivalent
  * (transform/array_min) evaluates interpreted (the known non-codegen
  * tax, SURVEY §8.2, measured 5× slower), and the explode form pays a
  * |shingles|·nPerms row blow-up plus two aggregation shuffles for a
  * result a per-row fold produces with zero shuffles. Byte-identical to
  * both: duplicates in the sliding shingle stream cannot change a min, so
  * the batch side's DISTINCT is also unnecessary — every consumer's
  * DuckDB oracle hash is the cross-engine parity proof.
  *
  * Tokenization contract (must match `DedupQueries.shingleCol` and the
  * oracles 1:1): lowercase, split on the literal space KEEPING trailing
  * empties (Spark's `split` default), 3-word shingles, whole-text shingle
  * for docs under 3 words. */
object Minhash {

  /** UDF: text → nPerms-entry signature (array of 32-char hex strings). */
  def signatureUdf(nPerms: Int): UserDefinedFunction = udf { (text: String) =>
    val w = Option(text).getOrElse("").toLowerCase.split(" ", -1)
    val shingles: Iterator[String] =
      if (w.length >= 3) w.sliding(3).map(_.mkString(" "))
      else Iterator(w.mkString(" "))
    val mins = new Array[String](nPerms)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hexd = "0123456789abcdef".toCharArray
    shingles.foreach { sh =>
      var j = 1
      while (j <= nPerms) {
        md.reset()
        val d = md.digest((j.toString + "|" + sh).getBytes("UTF-8"))
        val out = new Array[Char](32)
        var i = 0
        while (i < 16) {
          out(2 * i) = hexd((d(i) >> 4) & 0xf)
          out(2 * i + 1) = hexd(d(i) & 0xf)
          i += 1
        }
        val hex = new String(out)
        if (mins(j - 1) == null || hex < mins(j - 1)) mins(j - 1) = hex
        j += 1
      }
    }
    mins.toSeq
  }

  /** Band hashes over a signature column: array of nPerms/bandRows md5s,
    * band b = md5(concat of sig entries [b·bandRows+1 .. (b+1)·bandRows])
    * — the same construction as the declarative
    * md5(array_join(collect_list-in-j-order)) form. */
  def bandHashes(sig: Column, nPerms: Int, bandRows: Int): Column = {
    require(nPerms % bandRows == 0, "bands must tile the signature")
    transform(sequence(lit(0), lit(nPerms / bandRows - 1)),
      b => md5(array_join(
        slice(sig, b * lit(bandRows) + lit(1), lit(bandRows)), "")
        .cast("binary")))
  }
}
