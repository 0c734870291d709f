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
}
