package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.DedupQueries

/** Dev tool: scale probe for the text near-dup family beyond the 500-doc
  * fixture. Synthesizes n deterministic 40-word documents over a bounded
  * vocabulary, plants a near-duplicate for every 20th doc (one appended
  * word — true 3-gram Jaccard ≈ 0.88, above the 0.8 threshold), and
  * measures the prefix-filtered n-gram Jaccard pipeline:
  *
  *  - candidate pairs emitted by the prefix filter (the scale-deciding
  *    number: candidates, not corpus size, bound the verify join);
  *  - verified pairs (must be ≥ the n/20 planted ones);
  *  - wall time for the end-to-end pipeline.
  *
  * Run at two sizes to see the growth curve, e.g.:
  *   tools/run.sh graft.tools.DedupScaleProbe 50000
  *   tools/run.sh graft.tools.DedupScaleProbe 200000
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    val vocab = if (args.length > 1) args(1).toInt else 2000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Deterministic corpus: doc i = 40 words drawn hash-uniformly from a
    // `vocab`-word vocabulary. Every 20th doc gets a near-dup twin (same
    // text + one appended word): 38 shared shingles of 38+41 distinct,
    // J = 38/41 ≈ 0.927 — a planted pair the pipeline must find.
    val base = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(39)),
        j => format_string("w%04d", pmod(xxhash64(col("id"), j), lit(vocab)))))
        .as("text"))
    val twins = base.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + n).as("doc_id"),
        concat(col("text"), lit(" w_dup")).as("text"))
    val docs = base.unionAll(twins).cache()
    val total = docs.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (nCand, tCand) = time(DedupQueries.ngramCandidates(docs).count())
    val (pairs, _) = time(DedupQueries.ngramJaccardPairs(docs).cache())
    val (nPairs, tVerify) = time(pairs.count())
    val planted = n / 20 + (if (n % 20 != 0) 1 else 0)
    val plantedFound = pairs
      .filter(col("doc_b") === col("doc_a") + n && col("doc_a") % 20 === 0)
      .count()

    println(s"""{"probe":"dedup_ngram","n_docs":$total,"vocab":$vocab,""" +
      s""""candidates":$nCand,"cand_per_doc":${nCand.toDouble / total},""" +
      s""""verified_pairs":$nPairs,"planted":$planted,""" +
      s""""planted_found":$plantedFound,""" +
      s""""t_candidates_sec":$tCand,"t_end_to_end_sec":${tCand + tVerify}}""")
    spark.stop()
  }
}
