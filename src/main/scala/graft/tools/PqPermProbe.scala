package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Codes-only PQ recall probe — the evidence behind the
  * `ann_pq_adc_only_recall_at10` / `ann_pq16_adc_only_recall_at10` pair
  * and SURVEY §8.2's information-floor claim. Measures, on the real
  * fixture corpus at the catalog's own 20 queries:
  *
  *  - baseline `Pq.train` vs `Pq.trainPermuted` (the shipped OPQ-lite
  *    seeded-permutation selection: +2.5pp at sf0.1);
  *  - a k-means++-init Lloyd variant (+1.5pp — init is not the binding
  *    constraint either);
  *  - the 16 B and 32 B code budgets (0.615 / 0.87 at sf0.1 — the
  *    information floor of 8 B codes, not an algorithm gap);
  *  - the permutation-lever CEILING: every candidate scored directly on
  *    corpus recall (overfit by construction — an upper bound for ANY
  *    sample-side selector). Measured 0.52 over 24 candidates at sf0.1:
  *    no permutation selection can reach 0.55 at 8 B on this fixture.
  *
  *   tools/run.sh graft.tools.PqPermProbe /root/testdata/sf0.1 \
  *     [nPerms] [sampleCap] [iters] [nEval]
  */
object PqPermProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nPerms = if (args.length > 1) args(1).toInt else 16
    val sampleCap = if (args.length > 2) args(2).toInt else 4096
    val iters = if (args.length > 3) args(3).toInt else 10
    val nEval = if (args.length > 4) args(4).toInt else 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.core.Tables.embeddings(spark, dir)
    println(s"corpus rows: ${e.count()}, dim: " +
      e.select(size(col("embedding"))).head().getInt(0))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = graft.ops.SimSearch.exactTopK(queries, e, k = 10)
      .localCheckpoint(true)

    def eval(tag: String, model: graft.ops.Pq.PqModel): Unit = {
      val codes = graft.ops.Pq.encode(e, model).localCheckpoint(true)
      val r = graft.ops.SimSearch.recallAtK(
        graft.ops.Pq.adcTopK(queries, codes, model, k = 10), exact)
      println(f"$tag: adc_recall@10 = $r%.4f (perm=${model.perm != null})")
    }

    var t0 = System.nanoTime()
    eval("baseline train", graft.ops.Pq.train(e, m = 8, ksub = 256,
      iters = iters, sampleCap = sampleCap))
    println(f"  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    t0 = System.nanoTime()
    eval(s"permuted n=$nPerms cap=$sampleCap it=$iters ev=$nEval",
      graft.ops.Pq.trainPermuted(e, m = 8, ksub = 256, iters = iters,
        sampleCap = sampleCap, nPerms = nPerms, nEvalQueries = nEval))
    println(f"  (${(System.nanoTime() - t0) / 1e9}%.1f s)")

    // k-means++ init experiment: same pipeline, pp-seeded Lloyd
    t0 = System.nanoTime()
    val sample = e
      .select(col("vec_id"),
        graft.functions.Distances.asDouble(col("embedding")).as("emb"))
      .withColumn("h", xxhash64(col("vec_id"), lit(42L)))
      .orderBy("h").limit(sampleCap).select("emb").collect()
      .map(_.getSeq[Double](0).toArray)
    val subdim = 8
    def ppBooks(s: Array[Array[Double]]) = Array.tabulate(8) { sub =>
      kppLloyd(s.map(_.slice(sub * subdim, (sub + 1) * subdim)), 256, iters,
        seed = 42L + sub)
    }
    eval("kmeans++ init", graft.ops.Pq.PqModel(ppBooks(sample)))
    println(f"  (${(System.nanoTime() - t0) / 1e9}%.1f s)")

    // information-floor probes: larger code budgets, same pipeline
    eval("m=16 ksub=256 (16B codes)", graft.ops.Pq.train(e, m = 16,
      ksub = 256, iters = iters, sampleCap = sampleCap))
    eval("m=32 ksub=256 (32B codes)", graft.ops.Pq.train(e, m = 32,
      ksub = 256, iters = iters, sampleCap = sampleCap))

    // permutation-lever ceiling: score every candidate by CORPUS recall
    // at the catalog's own 20 queries (overfit by construction — an
    // upper bound for any sample-side selection, not a shippable
    // selector)
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val ceiling = (0 until nPerms).map { p =>
      val mdl = graft.ops.Pq.trainWithPerm(e,
        graft.ops.Pq.seededPerm(dim, 42L, p), m = 8, ksub = 256,
        iters = iters, sampleCap = sampleCap)
      val codes = graft.ops.Pq.encode(e, mdl).localCheckpoint(true)
      val r = graft.ops.SimSearch.recallAtK(
        graft.ops.Pq.adcTopK(queries, codes, mdl, k = 10), exact)
      println(f"  perm#$p corpus recall $r%.4f")
      r
    }
    println(f"permutation-lever CEILING over $nPerms candidates: " +
      f"${ceiling.max}%.4f")
    spark.stop()
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def kppLloyd(sample: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    val n = sample.length
    if (n <= k) return sample.map(_.clone())
    val dim = sample.head.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var j = 0
      while (j < dim) { val t = a(j) - b(j); d += t * t; j += 1 }
      d
    }
    // seeded k-means++ (deterministic: fixed-point arithmetic over mix64)
    val cents = new Array[Array[Double]](k)
    cents(0) = sample(math.floorMod(mix(seed), n).toInt).clone()
    val best = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var tot = 0.0
      var i = 0
      while (i < n) {
        val d = d2(sample(i), cents(c - 1))
        if (d < best(i)) best(i) = d
        tot += best(i)
        i += 1
      }
      // deterministic "uniform" in [0,1) from the seed stream
      val u = (mix(seed * 7919 + c) >>> 11).toDouble / (1L << 53).toDouble
      var target = u * tot
      var pick = n - 1
      i = 0
      var acc = 0.0
      while (i < n && pick == n - 1) {
        acc += best(i)
        if (acc >= target) pick = i
        i += 1
      }
      cents(c) = sample(pick).clone()
      c += 1
    }
    // Lloyd iterations (same as Ivf.lloyd)
    var cur = cents
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { p =>
        var bi = 0; var bd = Double.MaxValue; var i2 = 0
        while (i2 < k) {
          val d = d2(p, cur(i2))
          if (d < bd) { bd = d; bi = i2 }
          i2 += 1
        }
        counts(bi) += 1
        var j = 0
        while (j < dim) { sums(bi)(j) += p(j); j += 1 }
      }
      cur = cur.indices.map { i2 =>
        if (counts(i2) == 0) cur(i2) else sums(i2).map(_ / counts(i2))
      }.toArray
      it += 1
    }
    cur
  }
}
