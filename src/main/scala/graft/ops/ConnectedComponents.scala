package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge set — the step that turns a
  * pairwise near-duplicate relation into duplicate CLUSTERS (one canonical
  * doc per component), which is how a production dedup pass actually drops
  * documents: pairs alone can't pick survivors consistently when dups chain
  * (a~b, b~c but not a~c).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the minimum label among itself
  * and its neighbors; converges in O(component diameter) rounds to
  * label = min node id of the component. Each round is one shuffle
  * (neighbor join + min aggregation); the frame is `localCheckpoint`ed per
  * round so lineage doesn't stack across iterations. Near-dup graphs have
  * tiny diameters (dup clusters are quasi-cliques), so 2–4 rounds is
  * typical; for adversarially long path graphs the alternating
  * large-star/small-star formulation (Kiveris et al., "Connected Components
  * in MapReduce and Beyond") halves diameter per round — same join/agg
  * primitives, swap in if a corpus ever produces deep chains.
  *
  * Deterministic by construction (min over ids — no RNG, no float).
  */
object ConnectedComponents {

  /** Components of the graph `edges(srcCol, dstCol)`. Returns
    * (node BIGINT, component BIGINT) for every node appearing in any edge;
    * component = min node id reachable. */
  def components(
      edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 20): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // Undirected adjacency, plus self-loops so isolated-after-filter nodes
    // and each node's own label survive every round's aggregation.
    val und = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .unionAll(e.select(col("src"), col("src").as("dst")))
      .unionAll(e.select(col("dst").as("src"), col("dst").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = und.select(col("src").as("node"))
      .distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // node's next label = min over {labels of neighbors} ∪ {own} — the
      // self-loop rows make the own-label term part of the same aggregate.
      val next = und
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min("label").as("label"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.as("l"), "node")
        .filter(col("n.label") =!= col("l.label"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Components via alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * deep-chain-proof variant [[components]]' scaladoc promises: where
    * min-label propagation needs O(component diameter) rounds (a planted
    * 64-node path needs 64), the star operations contract every component
    * to a star in O(log n) alternations regardless of diameter, because
    * each round rewires nodes to the minimum of their NEIGHBORHOOD's
    * minima, not just their neighbors.
    *
    * Per alternation (each one groupBy + one join-back, same primitives as
    * a min-label round):
    *   - large-star(u): every neighbor v > u is re-pointed at
    *     m = min(Γ(u) ∪ u);
    *   - small-star(u), over edges directed big→small: every (smaller)
    *     neighbor AND u itself re-point at m = min(Γ⁻(u) ∪ u).
    * Both emit edges oriented (big, small), so the edge frame stays
    * canonical; convergence = the small-star output equals its input
    * (checked with except — both sides distinct), at which point every
    * edge is (node, component-min-id) directly.
    *
    * Same output contract as [[components]] (nodes appearing in edges
    * only; component = min reachable id; deterministic — gated equal in
    * ConnectedComponentsSpec on random graphs and the planted path). */
  def componentsLargeSmallStar(
      edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 40): DataFrame = {
    var e = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint()
    var eCount = e.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star over both directions: m(u) = min(Γ(u) ∪ u); larger
      // neighbors re-point at it. Every undirected edge is emitted exactly
      // once (from its smaller endpoint), so the frame never balloons.
      val dir = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      val mins = dir.groupBy(col("a").as("u"))
        .agg(min("b").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = dir.filter(col("b") > col("a"))
        .join(mins, dir("a") === mins("u"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint()
      // small-star over the (big → small) orientation: everything in the
      // closed smaller-neighborhood re-points at its min, INCLUDING u —
      // that is the edge (u, m) union leg, and it is what contracts chains.
      val mins2 = large.groupBy(col("a").as("u")).agg(min("b").as("m"))
      val small = large
        .join(mins2, large("a") === mins2("u"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .unionAll(mins2.select(col("u").as("a"), col("m").as("b")))
        .distinct()
        .localCheckpoint()
      // Convergence on distinct sets: equal cardinality + empty one-sided
      // except imply set equality — one count (of the frame the next round
      // reuses anyway) and at most one except job per alternation, where
      // the two-sided form paid two full set-difference jobs every round.
      val smallCount = small.count()
      converged = smallCount == eCount &&
        small.except(e).limit(1).count() == 0
      eCount = smallCount
      e = small
      iter += 1
    }
    require(converged, s"large/small-star did not converge in $maxIter rounds")
    e.select(col("a").as("node"), col("b").as("component"))
      .unionAll(e.select(col("b").as("node"), col("b").as("component")))
      .groupBy("node").agg(min("component").as("component"))
  }

  /** INCREMENTAL component maintenance — the daily-crawl loop's missing
    * step: yesterday's labels plus today's delta edges, WITHOUT touching
    * the full pair graph. Contract the delta onto the existing labeling
    * (each endpoint → its current component id; unseen nodes → self),
    * run [[componentsLargeSmallStar]] on that contracted graph — sized by
    * the delta and the components it touches, never the corpus — and map
    * the old labels through the result.
    *
    * Correctness: an old component's label is the min node id it
    * contains, so the contracted graph's node set is {component minima}
    * ∪ {new nodes}, and the star contraction's min over THAT set equals
    * the min over the union graph's merged node sets — exactly what a
    * full recompute would assign (the catalog entry's oracle IS the full
    * recompute; IncrementalSpec-style parity in ConnectedComponentsSpec).
    * Untouched components never enter the contracted graph and keep
    * their labels through the left join.
    *
    * Cost: O(|delta| + touched components) per increment — two label
    * lookups on the delta, a star contraction of the contracted graph,
    * one broadcast-sized relabel join back (the contracted result has at
    * most one row per touched component + new node).
    *
    * The contracted graph is DELTA-sized by construction, so the default
    * path resolves it with a driver-side union-find (min-rooted — the
    * same normalization the star contraction converges to) once its edge
    * count is verified ≤ `driverTierMax` (2²⁰ pairs ≈ 16 MB — the
    * bounded-collect policy of the small-batch LSH tier): a daily
    * increment's touched-component graph is thousands of edges, and the
    * star alternation's ~4 scheduler rounds per halving dominated the
    * catalog entry's wall (5.3 s → ~1 s). Anything larger falls back to
    * the distributed star contraction — same labels, spec-gated equal.
    *
    * `labels` is (node, component) with component = min reachable id
    * (the [[components]] output contract); `deltaEdges` self-loops are
    * dropped (pair graphs are strict a < b). Returns the full updated
    * labeling: every old node plus every node of the delta. */
  def updateIncremental(
      labels: DataFrame, deltaEdges: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      driverTierMax: Long = 1L << 20): DataFrame = {
    val lbl = labels.select(col("node").cast("long").as("node"),
      col("component").cast("long").as("label"))
    // Materialize the delta ONCE: the edge frame is typically the output
    // of an expensive upstream (the minhash delta-pair pipeline), and the
    // steps below take several independent actions over it (touched-node
    // broadcast, contracted count, driver collect / star rounds) — without
    // the checkpoint each action replays the whole upstream.
    val e = deltaEdges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()
    // Label lookup without shuffling the corpus-sized labels frame: semi-
    // join labels down to the delta's endpoints (broadcast build side =
    // 2·|delta| keys, one map-side scan of labels), then resolve both
    // endpoints against that delta-sized slice.
    val touched = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
    val lblTouched = lbl.join(broadcast(touched), Seq("node"), "left_semi")
      .localCheckpoint()
    val contracted = e
      .join(lblTouched.select(col("node").as("src"), col("label").as("la")),
        Seq("src"), "left")
      .join(lblTouched.select(col("node").as("dst"), col("label").as("lb")),
        Seq("dst"), "left")
      .select(coalesce(col("la"), col("src")).as("a"),
        coalesce(col("lb"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")) // intra-component delta edges: no-ops
      .localCheckpoint()
    val merged = {
      val cnt = contracted
        .limit(math.min(driverTierMax + 1, Int.MaxValue.toLong).toInt).count()
      if (cnt == 0) {
        import labels.sparkSession.implicits._
        Seq.empty[(Long, Long)].toDF("node", "component")
      } else if (cnt <= driverTierMax) {
        import labels.sparkSession.implicits._
        val edges = contracted.collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        unionFindMin(edges).toSeq.toDF("node", "component")
      } else componentsLargeSmallStar(contracted, "a", "b")
    }
    // Old nodes ride their label through the (touched-components-sized)
    // relabel map; nodes of the delta not in the old labeling are new.
    val relabel = merged.select(col("node").as("label"),
      col("component").as("newc"))
    val updatedOld = lbl
      .join(broadcast(relabel), Seq("label"), "left")
      .select(col("node"), coalesce(col("newc"), col("label")).as("component"))
    // New nodes derive DELTA-side: touched endpoints with no label (both
    // frames delta-sized — an anti-join against the corpus-sized labels
    // frame here would shuffle the whole labeling for an answer the
    // semi-join already determined). Every new node appears in merged:
    // it is a contracted endpoint, and its self-label can never equal its
    // partner's (old labels are old node ids; distinct new ids differ).
    val newNodes = touched
      .join(lblTouched.select("node"), Seq("node"), "left_anti")
      .join(merged, Seq("node"))
      .select(col("node"), col("component"))
    updatedOld.unionAll(newNodes)
  }

  /** Min-rooted union-find over an edge array (driver tier of
    * [[updateIncremental]]): always parents the larger root under the
    * smaller, so every root IS its component's minimum id — the same
    * fixpoint the distributed algorithms converge to. Deterministic for
    * any edge order. */
  private def unionFindMin(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val n = parent(c); parent(c) = r; c = n
      }
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      } else { parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b) }
    }
    val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    nodes.iterator.map(n => n -> find(n)).toMap
  }
}
