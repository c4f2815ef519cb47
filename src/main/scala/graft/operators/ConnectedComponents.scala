package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation
  * with pointer jumping (label compression), the standard alternating
  * scheme of large-star/small-star (Kiveris et al., "Connected
  * components in MapReduce and beyond", SoCC 2014): each round first
  * pulls the min label across edges, then compresses `label(x) ←
  * label(label(x))`, so convergence is O(log diameter) rounds rather
  * than O(diameter) — a million-long chain converges in ~20 rounds.
  *
  * Each round is two joins + a groupBy-min over checkpointed inputs
  * (lineage stays flat); the only driver-side data is one convergence
  * count per round.
  *
  * @param nodes one column `id`
  * @param edges columns `src`, `dst` (undirected; both orders implied)
  * @return (id, component) where component = min id in the component
  */
object ConnectedComponents {

  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = nodes.sparkSession
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // pull the min label across edges
      val viaEdges = sym
        .join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val pulled = labels.union(viaEdges)
        .groupBy("id").agg(min("component").as("component"))
      // pointer jump: label(x) ← min(label(x), label(label(x)))
      val jumpedRaw = pulled.as("x")
        .join(pulled.as("p"), col("x.component") === col("p.id"))
        .select(col("x.id").as("id"),
          least(col("x.component"), col("p.component")).as("component"))
        .localCheckpoint()
      // rebase on the materialized RDD: fresh attribute ids, so the next
      // round's union/join of this frame with its own derivatives can't
      // trip Catalyst's duplicate-attribute constraint rewriting
      val jumped = spark.createDataFrame(jumpedRaw.rdd, jumpedRaw.schema)
      val changes = jumped.as("n").join(labels.as("o"), "id")
        .filter(col("n.component") =!= col("o.component")).count()
      labels = jumped
      converged = changes == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    labels
  }
}
