package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph helpers for dedup pipelines: near-dup PAIRS become duplicate
  * CLUSTERS via connected components, and the canonical keeper of a
  * cluster is its minimum id — the step a production dedup needs between
  * "pair detection" and "row dropping" (dropping `b_id` of every pair
  * over-deletes when clusters overlap: a-b and b-c with keep-min would
  * drop b and c; the component view keeps exactly one doc per cluster).
  *
  * Scale posture: min-label propagation, one equi-join + one aggregation
  * per round, converging in O(cluster diameter) rounds — near-dup
  * clusters are shallow (a dup cluster's diameter is bounded by its edit
  * chain, typically ≤ 3-4), so rounds stay small; each round's state is
  * `localCheckpoint`ed to cut lineage and the loop stops at the first
  * round with zero label changes. Degenerate giant components (the
  * "boilerplate page" cluster) cost rounds ∝ their diameter, not their
  * size — the per-round join is still hash-partitioned and linear.
  */
object GraphOps {

  /** Connected components of the undirected graph given by (aCol, bCol)
    * edge rows. Returns (id, cluster_id) for every node that appears in
    * an edge, where cluster_id = min node id of the component.
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20
  ): DataFrame = {
    val und = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint() // edge derivation (e.g. a full LSH dedup) runs once, not per round
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val nbrMin = und.join(labels, col("dst") === col("id"))
        .groupBy("src")
        .agg(min("cluster_id").as("nbr_min"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"), least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint()
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.cluster_id") =!= col("o.cluster_id"))
        .count()
      labels = next
      converged = changed == 0
      it += 1
    }
    labels
  }

  /** One row per duplicate cluster: (cluster_id, members array sorted,
    * n_members). cluster_id doubles as the canonical keeper id. */
  def dupClusters(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(edges, aCol, bCol)
      .groupBy("cluster_id")
      .agg(sort_array(collect_list(col("id"))).as("members"), count(lit(1)).as("n_members"))
}
