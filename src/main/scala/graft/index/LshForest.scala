package graft.index

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.ops.SimSearch

/** The reference's core query engine — a forest of random-projection LSH
  * trees (the Annoy algorithm) — re-expressed Spark-first.
  *
  * Reference semantics (all verified against /root/reference):
  *  - hyperplane through the midpoint of two sampled points, perpendicular
  *    to their connecting line; side predicate `dot(coeff, p) + const >= 0`
  *    (src/database/index/lsh.rs:20-43, 192-248)
  *  - recursive splitting until a node holds < max_node_size ids
  *    (lsh.rs:250-267; defaults num_trees=15, max_node_size=5,
  *    lsh.rs:125-137)
  *  - query = descend each tree to a leaf, top up from sibling ("backup")
  *    branches when the leaf is short, union candidates across trees,
  *    exact-rerank, take k (lsh.rs:290-348, 544-565)
  *
  * Spark-first architecture (NOT the reference's per-node KV walk):
  *  - the tree *structure* is built on the driver from a bounded seeded
  *    sample (exact when the corpus fits the cap) — hyperplanes are a few KB
  *    and broadcast to executors;
  *  - the corpus is routed through the broadcast forest in ONE narrow map
  *    (no shuffle), producing a `(vec_id, tree_id, leaf_id)` bucket table
  *    written `partitionBy("tree_id")` + sorted by leaf_id within partitions
  *    so probes prune at partition + row-group level;
  *  - a query probes |trees| · (1 + backups) leaves: the probe list is tiny,
  *    broadcast, and the bucket join never shuffles the corpus;
  *  - rerank reuses the bounded top-k aggregate (map-side partial).
  *
  * Documented deviation (SURVEY.md §7.5): split points are sampled from the
  * subset being split (Annoy-correct), not from all vectors as the reference
  * does (lsh.rs:197-201) — better-balanced trees, same contract.
  */
object LshForest {

  /** One live Broadcast per (SparkContext, model) INSTANCE: a 65k-sample
    * forest is ~200 MB of node objects, and re-broadcasting it on every
    * route/probe call costs seconds of serialization per call and piles up
    * broadcast blocks faster than the ContextCleaner reclaims them — the
    * engine-lifecycle probe degraded ~10x over a session from exactly this.
    * Weak keys let a dropped model (and, via the cleaner, its blocks) be
    * collected; a stale entry from a stopped context is re-broadcast. */
  private val bcCache = new java.util.WeakHashMap[
    ForestModel,
    (org.apache.spark.SparkContext,
      org.apache.spark.broadcast.Broadcast[ForestModel])]()

  private def broadcastModel(spark: SparkSession, model: ForestModel)
      : org.apache.spark.broadcast.Broadcast[ForestModel] =
    bcCache.synchronized {
      val sc = spark.sparkContext
      bcCache.get(model) match {
        case (`sc`, b) => b
        case _ =>
          val b = sc.broadcast(model)
          bcCache.put(model, (sc, b))
          b
      }
    }

  sealed trait Node extends Serializable
  final case class Inner(coeff: Array[Double], const: Double, left: Node, right: Node)
      extends Node
  /** sampleSize = how many build-sample points landed here; at scale the
    * full-data leaf population is ≈ sampleSize · (n / sampleTotal). */
  final case class Leaf(leafId: Int, sampleSize: Int) extends Node

  final case class Options(
      numTrees: Int = 15,
      maxNodeSize: Int = 5,
      seed: Long = 42L,
      sampleCap: Int = 65536)

  final case class ForestModel(
      trees: Array[Node],
      opts: Options,
      sampleTotal: Int) extends Serializable {
    def numTrees: Int = trees.length
  }

  /** Signed distance-to-hyperplane numerator: dot(coeff, p) + const. */
  private def margin(coeff: Array[Double], const: Double, p: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(coeff.length, p.length)
    while (i < n) { s += coeff(i) * p(i); i += 1 }
    s + const
  }

  /** `Hyperplane::point_is_above` (reference: lsh.rs:39-43). */
  private def isAbove(coeff: Array[Double], const: Double, p: Array[Double]): Boolean =
    margin(coeff, const, p) >= 0.0

  /** Build one tree recursively on the sample (reference: `build_a_tree`,
    * lsh.rs:250-267). A random split that fails (both sampled points equal,
    * or every point on one side) retries, then falls back to a
    * deterministic axis-median split on the widest dimension — guaranteed
    * progress unless the node's points are bit-identical, in which case the
    * node becomes a leaf (duplicates cannot recurse forever). */
  private def buildTree(
      sample: Array[Array[Double]], ids: Array[Int], rng: Random,
      maxNodeSize: Int, nextLeaf: () => Int): Node = {
    if (ids.length < maxNodeSize) return Leaf(nextLeaf(), ids.length)
    val dim = sample(ids(0)).length

    def trySplit(coeff: Array[Double], const: Double): Option[Node] = {
      val (above, below) = ids.partition(i => isAbove(coeff, const, sample(i)))
      if (above.isEmpty || below.isEmpty) None
      else Some(Inner(
        coeff, const,
        buildTree(sample, below, rng, maxNodeSize, nextLeaf),
        buildTree(sample, above, rng, maxNodeSize, nextLeaf)))
    }

    var attempt = 0
    while (attempt < 5) {
      // `build_hyperplane` (lsh.rs:192-248): two distinct sampled points,
      // hyperplane ⟂ their connecting line through the midpoint.
      val ai = ids(rng.nextInt(ids.length))
      val bi = ids(rng.nextInt(ids.length))
      if (ai != bi) {
        val a = sample(ai)
        val b = sample(bi)
        val coeff = new Array[Double](dim)
        var const = 0.0
        var j = 0
        while (j < dim) {
          coeff(j) = b(j) - a(j)
          const -= coeff(j) * ((a(j) + b(j)) / 2.0)
          j += 1
        }
        trySplit(coeff, const) match {
          case Some(n) => return n
          case None => ()
        }
      }
      attempt += 1
    }
    // Deterministic fallback: median split on the widest dimension.
    var bestDim = 0
    var bestSpread = -1.0
    var j = 0
    while (j < dim) {
      var lo = Double.MaxValue; var hi = Double.MinValue
      ids.foreach { i =>
        val x = sample(i)(j)
        if (x < lo) lo = x
        if (x > hi) hi = x
      }
      if (hi - lo > bestSpread) { bestSpread = hi - lo; bestDim = j }
      j += 1
    }
    if (bestSpread <= 0.0) return Leaf(nextLeaf(), ids.length) // all identical
    val vals = ids.map(i => sample(i)(bestDim)).sorted
    val median = vals(vals.length / 2)
    val coeff = new Array[Double](dim)
    coeff(bestDim) = 1.0
    // strictly-below median goes left; guaranteed non-empty both sides
    // unless all values equal the median (then shift the threshold).
    trySplit(coeff, -median)
      .orElse(trySplit(coeff, -vals(vals.length - 1)))
      .getOrElse(Leaf(nextLeaf(), ids.length))
  }

  /** Row cap bounded by BYTES, not rows: `cap` rows is ~33 MB of driver
    * memory at the 64-d fixture but ~400 MB at the engine's 768-d
    * image/audio dims. Above 64-d the row cap scales down by 64/dim
    * (floor 4096 rows so tree quality survives very high dims). */
  private[graft] def byteBoundedCap(cap: Int, dim: Int): Int =
    if (dim <= 64) cap else math.max(4096, (cap.toLong * 64 / dim).toInt)

  /** Bounded deterministic sample: the `sampleCap` rows with the smallest
    * xxhash64(vec_id, seed). Exact (= the whole corpus) whenever
    * n <= sampleCap. */
  private def sampleVectors(
      vectors: DataFrame, opts: Options, vecId: String): Array[Array[Double]] = {
    val dim = vectors.select(size(col("embedding"))).head(1)
      .headOption.map(_.getInt(0)).getOrElse(64)
    vectors
      .select(col(vecId), Distances.asDouble(col("embedding")).as("emb"))
      .withColumn("h", xxhash64(col(vecId), lit(opts.seed)))
      .orderBy("h").limit(byteBoundedCap(opts.sampleCap, dim))
      .select("emb")
      .collect()
      .map(_.getSeq[Double](0).toArray)
  }

  /** `build_index` (reference: lsh.rs:411-429): numTrees trees differing
    * only by RNG seed, built driver-side on the bounded sample. */
  def build(vectors: DataFrame, opts: Options = Options(), vecId: String = "vec_id")
      : ForestModel = {
    val sample = sampleVectors(vectors, opts, vecId)
    val ids = sample.indices.toArray
    val trees = (0 until opts.numTrees).map { t =>
      val rng = new Random(opts.seed * 1000003L + t)
      var leafCounter = -1
      val nextLeaf = () => { leafCounter += 1; leafCounter }
      buildTree(sample, ids, rng, opts.maxNodeSize, nextLeaf)
    }.toArray
    ForestModel(trees, opts, sample.length)
  }

  /** All leaf ids present in a tree — the REACHABLE bucket set (stale
    * bucket rows left behind by [[splitLeaf]] carry ids absent here). */
  def leafIds(n: Node): Seq[Int] = n match {
    case Leaf(id, _) => Seq(id)
    case Inner(_, _, l, r) => leafIds(l) ++ leafIds(r)
  }

  private def maxLeafId(n: Node): Int = n match {
    case Leaf(id, _) => id
    case Inner(_, _, l, r) => math.max(maxLeafId(l), maxLeafId(r))
  }

  private def replaceLeaf(n: Node, leafId: Int, sub: Node): Node = n match {
    case Leaf(id, _) if id == leafId => sub
    case l: Leaf => l
    case Inner(c, k, l, r) =>
      Inner(c, k, replaceLeaf(l, leafId, sub), replaceLeaf(r, leafId, sub))
  }

  private def scaleSizes(n: Node, s: Double): Node = n match {
    case Leaf(id, sz) => Leaf(id, math.max(1, math.round(sz * s).toInt))
    case Inner(c, k, l, r) => Inner(c, k, scaleSizes(l, s), scaleSizes(r, s))
  }

  /** I8 leaf-local re-split (reference: lsh.rs:350-382 splits ONE
    * overflowing leaf in place — not the whole forest): build a subtree
    * over the leaf's member points and graft it where the leaf was. Fresh
    * leaf ids are allocated past the tree's current max, so every other
    * bucket row stays valid and the old leaf id simply becomes unreachable.
    * `sizeScale` converts full-data member counts back to build-sample
    * units (leaf sampleSize drives probe budgets).
    *
    * Returns the updated model plus each point's new leaf id (parallel to
    * `points`), or None when the members cannot be split (all points
    * identical — the leaf stays as is). */
  def splitLeaf(
      model: ForestModel, treeId: Int, leafId: Int,
      points: Array[Array[Double]], sizeScale: Double = 1.0)
      : Option[(ForestModel, Array[Int])] = {
    val tree = model.trees(treeId)
    var next = maxLeafId(tree)
    val nextLeaf = () => { next += 1; next }
    val rng = new Random(
      model.opts.seed * 1000003L + treeId.toLong * 7919L + leafId)
    buildTree(points, points.indices.toArray, rng,
      model.opts.maxNodeSize, nextLeaf) match {
      case _: Leaf => None // unsplittable: identical points
      case sub0 =>
        val sub = scaleSizes(sub0, sizeScale)
        val assign = points.map(p => leafFor(sub, p).leafId)
        Some((
          model.copy(trees = model.trees.updated(treeId, replaceLeaf(tree, leafId, sub))),
          assign))
    }
  }

  /** Descend to the leaf for a point (reference: `insert` descent,
    * lsh.rs:350-365). */
  private[graft] def leafFor(root: Node, p: Array[Double]): Leaf = {
    var n = root
    while (true) {
      n match {
        case l: Leaf => return l
        case Inner(c, k, left, right) =>
          n = if (isAbove(c, k, p)) right else left
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** `tree_result` probe list (reference: lsh.rs:290-348): the query's main
    * leaf first, then backup ("sibling") branches until the expected
    * candidate count reaches `need` (in build-sample units).
    *
    * Selection order deviates from the reference's deepest-first backtrack:
    * backup branches are explored best-first by hyperplane margin (a
    * branch is prioritized by the smallest |margin| crossed to reach it) —
    * the probe order of the published Annoy algorithm. Same top-up
    * contract, strictly better leaves for the same budget. */
  private def probeLeaves(root: Node, p: Array[Double], need: Int): Seq[Int] =
    probeLeavesSized(root, p, need)._1

  /** [[probeLeaves]] plus the accumulated build-sample occupancy of the
    * probed leaves — a driver-side candidate-count estimate (exact when the
    * sample is the whole corpus, an underestimate otherwise). */
  private def probeLeavesSized(
      root: Node, p: Array[Double], need: Int): (Seq[Int], Int) = {
    final case class Entry(priority: Double, node: Node)
    val pq = collection.mutable.PriorityQueue.empty[Entry](Ordering.by(_.priority))
    pq.enqueue(Entry(Double.MaxValue, root))
    val out = collection.mutable.ArrayBuffer.empty[Int]
    var got = 0
    while (got < need && pq.nonEmpty) {
      val e = pq.dequeue()
      e.node match {
        case l: Leaf =>
          out += l.leafId
          got += math.max(l.sampleSize, 1)
        case Inner(c, k, left, right) =>
          val m = margin(c, k, p)
          val (qSide, backup) = if (m >= 0) (right, left) else (left, right)
          // Annoy's priorities: the query side keeps min(parent, +|m|), the
          // backup side min(parent, -|m|). With a max-heap the whole
          // query-side descent (priority >= 0) pops before any backup, and
          // backups then pop nearest-first — the branch whose crossed
          // hyperplane margin is SMALLEST has the least-negative priority.
          // (Round 2 enqueued backups with min(parent, +|m|), which explored
          // the farthest backup first and cost recall per candidate.)
          pq.enqueue(Entry(math.min(e.priority, math.abs(m)), qSide))
          pq.enqueue(Entry(math.min(e.priority, -math.abs(m)), backup))
      }
    }
    (out.toSeq, got)
  }

  /** Route the corpus through the broadcast forest: ONE narrow projection
    * producing the bucket table (vec_id, tree_id, leaf_id). No shuffle —
    * the scan streams, the forest rides along as a broadcast. */
  def bucketTable(vectors: DataFrame, model: ForestModel, vecId: String = "vec_id")
      : DataFrame = {
    val spark = vectors.sparkSession
    val bc = broadcastModel(spark, model)
    val routeUdf = udf { (emb: Seq[Float]) =>
      val m = bc.value
      val p = new Array[Double](emb.length)
      var i = 0
      while (i < emb.length) { p(i) = emb(i).toDouble; i += 1 }
      m.trees.indices.map(t => (t, leafFor(m.trees(t), p).leafId))
    }
    vectors
      .select(col(vecId), explode(routeUdf(col("embedding"))).as("tl"))
      .select(col(vecId), col("tl._1").as("tree_id"), col("tl._2").as("leaf_id"))
  }

  /** Persist the bucket table partitioned by tree_id, leaf-sorted within
    * partitions so leaf probes prune parquet row groups.
    *
    * The shuffle key is a sub-leaf slice id, not tree_id: hashing on
    * tree_id alone caps write parallelism at numTrees (15 lumpy tasks for
    * a corpus-sized sort+encode — the build bottleneck at 10⁸+ rows).
    * Each tree's leaf range splits into `slices` contiguous chunks, every
    * task sorts and writes its own chunk, and because a chunk is a
    * contiguous leaf_id range the resulting files keep tight min/max
    * leaf_id stats — probe-time file and row-group pruning is unchanged. */
  def writeIndex(
      vectors: DataFrame, model: ForestModel, path: String,
      vecId: String = "vec_id"): Unit = {
    val spark = vectors.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val slices = math.max(1, (2 * par + model.numTrees - 1) / model.numTrees)
    val leafSpan = model.trees.map(t => maxLeafId(t) + 1)
    val chunk = leafSpan.map(span => math.max(1, (span + slices - 1) / slices))
    val chunkCol = element_at(lit(chunk), col("tree_id") + 1)
    bucketTable(vectors, model, vecId)
      .withColumn("slice_id",
        col("tree_id") * slices + (col("leaf_id") / chunkCol).cast("int"))
      .repartition(model.numTrees * slices, col("slice_id"))
      .sortWithinPartitions("tree_id", "leaf_id")
      .drop("slice_id")
      .write.mode("overwrite").partitionBy("tree_id").parquet(path)
  }

  def loadIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-query probe list over all trees, with backup-branch top-up sized
    * for `searchK` candidates per tree (in sample units). Output:
    * (query_id, q_emb, tree_id, leaf_id) — |queries| · numTrees · (1+backups)
    * rows; tiny, broadcastable. */
  def routeQueries(
      queries: DataFrame, model: ForestModel, searchK: Int,
      queryId: String = "query_id"): DataFrame = {
    val spark = queries.sparkSession
    val bc = broadcastModel(spark, model)
    val probeUdf = udf { (emb: Seq[Float]) =>
      val m = bc.value
      val p = new Array[Double](emb.length)
      var i = 0
      while (i < emb.length) { p(i) = emb(i).toDouble; i += 1 }
      m.trees.indices.flatMap(t =>
        probeLeaves(m.trees(t), p, searchK).map(l => (t, l)))
    }
    queries.select(
      col(queryId),
      Distances.asDouble(col("embedding")).as("q_emb"),
      explode(probeUdf(col("embedding"))).as("tl"))
      .select(col(queryId), col("q_emb"),
        col("tl._1").as("tree_id"), col("tl._2").as("leaf_id"))
  }

  /** Candidate generation: probed buckets joined against the bucket table,
    * deduped across trees (reference: DashSet union, lsh.rs:550-556).
    * The probe side is collected to literals for partition/row-group pruning
    * and broadcast for the join — the bucket table itself never shuffles. */
  def candidates(
      queries: DataFrame, buckets: DataFrame, model: ForestModel, searchK: Int,
      queryId: String = "query_id", vecId: String = "vec_id"): DataFrame = {
    // Materialize the probe list once: the pruning collect below and the
    // bucket join both consume it, and re-running the routing UDF doubles
    // the per-query tree-walk cost at large batches.
    val probes = routeQueries(queries, model, searchK, queryId).localCheckpoint()
    // Scan-pruning predicate. EXACT leaf selection is the broadcast join
    // below — this predicate only exists so the bucket scan skips files and
    // row groups, so it must stay cheap PER ROW too (Spark re-applies pushed
    // filters post-scan): a per-leaf IN list beyond a few hundred literals
    // costs more evaluating than it saves (8s vs 0.4s at a 6M-row bucket
    // table). Small probe sets keep exact literals (best stats pruning for
    // the single-query latency path); larger ones use per-tree leaf_id
    // ranges — sargable, O(numTrees) per row, and still row-group-tight
    // against the leaf-sorted file layout.
    val probed = probes.select("tree_id", "leaf_id").distinct().collect()
      .groupBy(_.getInt(0)).map { case (t, rows) => t -> rows.map(_.getInt(1)).toSeq }
    val totalLeaves = probed.valuesIterator.map(_.size).sum
    val pruned =
      if (totalLeaves <= 256)
        probed.map { case (t, leaves) =>
          (col("tree_id") === t) && col("leaf_id").isin(leaves: _*)
        }.reduceOption(_ || _).getOrElse(lit(false))
      else
        probed.map { case (t, leaves) =>
          (col("tree_id") === t) && col("leaf_id").between(leaves.min, leaves.max)
        }.reduceOption(_ || _).getOrElse(lit(false))
    buckets.filter(pruned)
      .join(broadcast(probes), Seq("tree_id", "leaf_id"))
      .select(col(queryId), col("q_emb"), col(vecId))
      .dropDuplicates(queryId, vecId)
  }

  private def toDoubleArray(v: Any): Array[Double] = v match {
    case s: scala.collection.Seq[_] =>
      val out = new Array[Double](s.length)
      var i = 0
      s.foreach { x =>
        out(i) = x match {
          case f: Float => f.toDouble
          case d: Double => d
          case n: Number => n.doubleValue()
        }
        i += 1
      }
      out
    case a: Array[Float] => a.map(_.toDouble)
    case a: Array[Double] => a
  }

  /** Small-batch latency path for [[topK]]: the forest model already lives
    * on the driver, so a handful of queries can be routed locally —
    * probe lists, scan-pruning predicate, and the broadcast probe relation
    * all come from driver arrays, collapsing the distributed path's probe
    * job + checkpoint + distinct-collect + count into zero Spark jobs.
    * Only the pruned bucket join and the rerank execute on the cluster
    * (plus one bounded `take` when the candidate set is small enough to
    * push into the vectors scan as a literal filter). At bench scale this
    * is the difference between ~6 scheduler round-trips per query batch
    * and 2; at 100 TB the routing cost is |Q|·numTrees tree walks —
    * microseconds against any corpus size. */
  private def topKSmall(
      qRows: Array[org.apache.spark.sql.Row],
      buckets: DataFrame, vectors: DataFrame, model: ForestModel, k: Int,
      metric: Distances.Metric, searchK: Int,
      queryId: String, vecId: String, roundTo: Int,
      qIdType: org.apache.spark.sql.types.DataType,
      sampleExact: Boolean): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val spark = buckets.sparkSession
    val qEmbs = qRows.map(r => (r.get(0), toDoubleArray(r.get(1))))

    // Driver-side routing: per-(query, tree) probe lists. `candEst` sums
    // the probed leaves' BUILD-SAMPLE occupancy: an exact upper bound on
    // the candidate pair count when the sample was the whole corpus AND
    // nothing was ingested since the build; an underestimate on capped
    // samples and after incremental adds (which append bucket rows into
    // existing leaves without touching the model). It therefore only ever
    // NOMINATES the cheapest tier below — a bounded take() verifies it
    // before anything trusts it.
    val leafCounts = model.trees.map(t => leafIds(t).size)
    var exhaustive = qEmbs.nonEmpty
    var candEst = 0L
    val probeRows = collection.mutable.ArrayBuffer.empty[Row]
    val probedPerTree = collection.mutable.Map.empty[Int, collection.mutable.Set[Int]]
    for ((qid, p) <- qEmbs; t <- model.trees.indices) {
      val (leaves, got) = probeLeavesSized(model.trees(t), p, searchK)
      if (leaves.size < leafCounts(t)) exhaustive = false
      candEst += got
      val seen = probedPerTree.getOrElseUpdate(t, collection.mutable.Set.empty)
      leaves.foreach { l => probeRows += Row(qid, t, l); seen += l }
    }

    // Same two-tier scan-pruning predicate as the distributed path: exact
    // leaf literals while the probe set is small, sargable per-tree ranges
    // past that (pushed-filter evaluation cost, see candidates()).
    val probed = probedPerTree.view.mapValues(_.toSeq).toMap
    val totalLeaves = probed.valuesIterator.map(_.size).sum
    val pruned =
      if (exhaustive) lit(true)
      else if (totalLeaves <= 256)
        probed.map { case (t, leaves) =>
          (col("tree_id") === t) && col("leaf_id").isin(leaves: _*)
        }.reduceOption(_ || _).getOrElse(lit(false))
      else
        probed.map { case (t, leaves) =>
          (col("tree_id") === t) && col("leaf_id").between(leaves.min, leaves.max)
        }.reduceOption(_ || _).getOrElse(lit(false))

    val probeSchema = StructType(Seq(
      StructField(queryId, qIdType),
      StructField("tree_id", IntegerType),
      StructField("leaf_id", IntegerType)))
    val probeRel = spark.createDataFrame(probeRows.toSeq.asJava, probeSchema)
    val cand0 = buckets.filter(pruned)
      .join(broadcast(probeRel), Seq("tree_id", "leaf_id"))
      .select(col(queryId), col(vecId))
      .dropDuplicates(queryId, vecId)

    val v0 = vectors.select(
      col(vecId), Distances.asDouble(col("embedding")).as("v_emb"))
    // Join-strategy decision. The estimate NOMINATES the collect tier;
    // a bounded take() verifies it (early-terminating — cheap when right,
    // and it is only wrong after incremental ingest grew the leaves past
    // the build snapshot). Every other case materializes the pair set
    // once (localCheckpoint) and lets its TRUE count decide, exactly like
    // the distributed path — an estimate that undercounts can therefore
    // nominate a cheaper tier but never an unsafe one. Tiers:
    //  - <= 1024 pairs: collect them (bounded), push the ids into the
    //    vectors scan as a literal filter (row-group pruning of the fetch);
    //  - <= 2M true pairs: broadcast (same bar as the distributed path);
    //  - beyond: plain hash join — both sides hash on vecId, nothing
    //    collects anywhere.
    val verified: Option[Array[Row]] =
      if (sampleExact && candEst <= 1024) {
        val t = cand0.take(1025)
        if (t.length <= 1024) Some(t) else None
      } else None
    val (candSide, v) = verified match {
      case Some(t) =>
        val vIdType = buckets.schema(vecId).dataType
        val candSchema = StructType(Seq(
          StructField(queryId, qIdType), StructField(vecId, vIdType)))
        val candRel = spark.createDataFrame(t.toSeq.asJava, candSchema)
        val ids = t.map(_.get(1)).distinct.toSeq
        (broadcast(candRel), v0.filter(col(vecId).isin(ids: _*)))
      case None if sampleExact && candEst <= 2000000 =>
        // FUSED serving path (r16, guide §2.4/§3.1): when the build sample
        // covered the corpus, candEst is an exact UPPER bound on the pair
        // count, so the broadcast tier is provably safe without the
        // materialize + count round-trip — the bucket join executes ONCE,
        // inside the broadcast build of the rerank join, collapsing two
        // scheduler barriers (checkpoint job + count job) per serving call.
        (broadcast(cand0), v0)
      case None =>
        val c = cand0.localCheckpoint()
        val n = c.count()
        if (n <= 2000000) (broadcast(c), v0) else (c, v0)
    }
    val qSchema = StructType(Seq(
      StructField(queryId, qIdType),
      StructField("q_emb", ArrayType(DoubleType))))
    val qRel = spark.createDataFrame(
      qEmbs.map { case (id, e) => Row(id, e.toSeq) }.toSeq.asJava, qSchema)
    val scored = v.join(candSide, vecId)
      .join(broadcast(qRel), queryId)
      .withColumn("dist",
        SimSearch.quantize(metric, metric(col("q_emb"), col("v_emb")), roundTo))
    SimSearch.takeTopK(scored, k, queryId, vecId)
  }

  /** Query batches at or below this size route driver-side ([[topKSmall]]);
    * larger batches keep the fully distributed probe pipeline. */
  private[graft] val SmallBatchCap = 128

  /** `search` (reference: lsh.rs:544-565): candidates from every tree,
    * exact-metric rerank, take k. searchK defaults to the leaf budget
    * max(k, maxNodeSize) per tree.
    *
    * The candidate pipeline executes exactly ONCE via an eager
    * localCheckpoint — the probe + bucket join runs a single time and its
    * (query, vec) pairs stay distributed in executor block storage, so
    * driver memory is flat in the query-batch size (the round-2 version
    * collect()ed the pairs: linear driver memory, OOM at ~10⁶ queries).
    * For small batches the candidate ids additionally push into the vectors
    * scan as a literal IN filter so parquet row-group stats prune the fetch;
    * past that the (broadcast-candidate) join alone prunes — row-group stats
    * can't help a 100k-literal predicate, and the optimizer would choke on
    * it. The reference's in-leaf "rank and take n best" (lsh.rs:309-330) is
    * deliberately not reproduced — keeping whole leaves gives a candidate
    * superset, so recall can only be >= the reference's at equal settings. */
  def topK(
      queries: DataFrame, buckets: DataFrame, vectors: DataFrame,
      model: ForestModel, k: Int,
      metric: Distances.Metric = Distances.L2Squared,
      searchKOpt: Option[Int] = None,
      queryId: String = "query_id", vecId: String = "vec_id",
      roundTo: Int = 4): DataFrame = {
    // Default candidate budget: k·numTrees sample points per tree — Annoy's
    // documented serving default (search_k = n·n_trees), floored by the old
    // 4·k knee. The 4·k default was measured on CLUSTERED corpora (where
    // neighbors concentrate in few leaves and the probes saturate early —
    // endurance probes hold recall 1.0 with it at 1M vectors); on a UNIFORM
    // corpus the same budget decays with corpus size (LshTune at the 2,000-
    // vector sf0.1 fixture: 0.765 at searchK=40 vs 0.975 at k·numTrees=150,
    // the QUALITY_r9 finding). k·numTrees keeps the budget corpus-
    // independent — the probe walk is still O(k·numTrees·depth) per query —
    // while covering the geometry-adversarial case. Callers trade recall
    // for latency by passing searchKOpt explicitly.
    val searchK = searchKOpt.getOrElse(
      math.max(k * model.numTrees, math.max(4 * k, model.opts.maxNodeSize)))
    // Latency path: a small query batch (the reference CLI's k-NN lookups,
    // the engine's per-call batches) never needs the distributed probe
    // pipeline — one bounded take() decides, and the take's partial scan is
    // noise for the large-batch case it falls through to. Whether the build
    // sample covered the whole corpus decides how topKSmall sizes its
    // joins: exact sample → driver-side estimates; capped sample → one
    // materialize + count (see topKSmall).
    val qProbe = queries
      .select(col(queryId), col("embedding")).take(SmallBatchCap + 1)
    val qDim = qProbe.headOption.map(_.get(1) match {
      case s: scala.collection.Seq[_] => s.length
      case a: Array[_] => a.length
    }).getOrElse(64)
    val sampleExact =
      model.sampleTotal < byteBoundedCap(model.opts.sampleCap, qDim)
    if (qProbe.length <= SmallBatchCap)
      return topKSmall(
        qProbe, buckets, vectors, model, k, metric, searchK,
        queryId, vecId, roundTo, queries.schema(queryId).dataType,
        sampleExact)
    val cand = candidates(queries, buckets, model, searchK, queryId, vecId)
      .select(col(queryId), col(vecId))
      .localCheckpoint() // eager: materialize once, cut lineage, stay distributed
    val nPairs = cand.count() // free: served from the checkpointed blocks
    val v0 = vectors.select(
      col(vecId), Distances.asDouble(col("embedding")).as("v_emb"))
    // Literal-IN fetch pruning pays off only when the id list is small:
    // single-query lookups (the latency path — ~searchK·numTrees ids against
    // a huge corpus scan). Past ~1k literals the optimizer spends more
    // building the predicate than row-group stats save, and at the
    // exhaustive-budget extreme the list IS the corpus — pure overhead.
    val v =
      if (nPairs <= 1024) {
        val candIds =
          cand.select(col(vecId)).distinct().collect().map(_.get(0)).toSeq
        v0.filter(col(vecId).isin(candIds: _*))
      } else v0
    val q = queries.select(
      col(queryId), Distances.asDouble(col("embedding")).as("q_emb"))
    // Broadcast the pair set while it plausibly fits an executor; at very
    // large query batches fall back to a shuffle join (the right plan there
    // — both sides hash on vec_id, nothing collects anywhere).
    val (candSide, qSide) =
      if (nPairs <= 2000000) (broadcast(cand), broadcast(q)) else (cand, q)
    val scored = v.join(candSide, vecId)
      .join(qSide, queryId)
      .withColumn("dist",
        SimSearch.quantize(metric, metric(col("q_emb"), col("v_emb")), roundTo))
    SimSearch.takeTopK(scored, k, queryId, vecId)
  }

  /** Candidate budget for a FILTERED search: candidates route through the
    * index BEFORE the predicate applies, so only ~selectivity of them
    * survive — the pre-filter budget must grow by 1/selectivity to keep
    * the post-filter shortlist at its unfiltered size. Exhaustive stays
    * exhaustive; a sub-0.01% filter saturates to exhaustive too (at that
    * selectivity scanning the few survivors exactly IS the cheap plan). */
  def scaledBudget(base: Int, kept: Long, total: Long): Int = {
    if (base >= Int.MaxValue) return Int.MaxValue
    val sel =
      if (total <= 0L || kept <= 0L) 1.0
      else kept.toDouble / total
    // Below 1e-4 selectivity the scaled budget would exceed base*1e4 and
    // the expected post-filter survivors drop below k anyway — saturate to
    // exhaustive, as the contract above promises. Scanning the few
    // survivors exactly IS the cheap plan there.
    if (sel < 1e-4) return Int.MaxValue
    math.min(math.ceil(base / sel).toLong, Int.MaxValue.toLong).toInt
  }

  /** Filtered ANN over an index built on the UNFILTERED corpus: narrows
    * `vectors` with `pred` (the predicate reaches the parquet scan of the
    * rerank join) and scales the candidate budget by the measured
    * 1/selectivity via [[scaledBudget]], so callers no longer hand-pick
    * budgets per filter. Selectivity costs one count() on the filtered
    * frame (column-pruned to the predicate's columns); engines with a
    * cached corpus count pass it as `totalOpt` to avoid the second job. */
  def topKFiltered(
      queries: DataFrame, buckets: DataFrame, vectors: DataFrame,
      pred: Column, model: ForestModel, k: Int,
      metric: Distances.Metric = Distances.L2Squared,
      searchKOpt: Option[Int] = None,
      totalOpt: Option[Long] = None,
      queryId: String = "query_id", vecId: String = "vec_id",
      roundTo: Int = 4): DataFrame = {
    val filtered = vectors.filter(pred)
    val total = totalOpt.getOrElse(vectors.count())
    val kept = filtered.count()
    val base = searchKOpt.getOrElse(math.max(4 * k, model.opts.maxNodeSize))
    topK(queries, buckets, filtered, model, k, metric,
      Some(scaledBudget(base, kept, total)), queryId, vecId, roundTo)
  }
}
