package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph operators for corpus curation.
  *
  * Near-dup detection emits PAIRS (MinHash bands, SimHash hamming balls,
  * winnow overlap, embedding LSH — q29/q31/q41/q44/q47), but "keep one
  * document per duplicate group" is only well-defined on CLUSTERS:
  * duplicates chain (a~b and b~c with a!~c), and pairwise kill rules
  * ("drop the larger id of each pair") over-delete on chains. Connected
  * components is the standard closure step in large-scale dedup
  * pipelines, and it has to run distributed — at 100 TB the pair list
  * alone can exceed a single machine.
  */
object GraphOps {

  /** Connected components over an undirected edge list, by min-label
    * propagation with pointer jumping (the hash-to-min family — Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14).
    *
    * Every round each node takes the minimum of three candidates:
    * its current label, its neighbors' labels (equi-join on the
    * symmetrized edge list), and its label's label (a labels self-join —
    * the pointer-jumping step, which halves chain depth every round so a
    * diameter-D component converges in O(log D) rounds instead of D).
    * Labels are always node ids from the same component, monotonically
    * non-increasing and bounded by the component minimum, so the
    * fixpoint labels every node with its component's minimum id.
    *
    * Scale shape per round: two equi-joins plus one groupBy(node) min —
    * every shuffle is keyed on a node id, so skew only arises from true
    * high-degree nodes (and AQE skew-split applies). The symmetrized
    * edge list is shuffled ONCE up front (persisted pre-partitioned on
    * the probe key) and reused by every round's neighbor join;
    * `localCheckpoint` truncates lineage each round so the plan stays
    * constant-size instead of growing by one join per iteration. The
    * convergence check is one count over label rows (nodes, not edges).
    *
    * Returns (node: long, comp: long) for every node incident to an
    * edge; comp is the smallest node id in the node's component. Throws
    * if not converged within `maxIter` rounds (pointer jumping makes
    * 30 rounds enough for any graph with < 2^30-deep chains; hitting the
    * cap means something is broken, and a silent partial clustering
    * would corrupt a downstream dedup).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 30): DataFrame = {
    val fwd = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    val sym = fwd.union(fwd.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint()
    var round = 0
    var converged = labels.isEmpty
    while (!converged && round < maxIter) {
      val byV = labels.select(col("node").as("v"), col("comp").as("vc"))
      val nbrMin = sym.join(byV, "v").groupBy("u").agg(min("vc").as("nc"))
      val jumped = labels.select(col("node").as("jnode"), col("comp").as("jc"))
      val next = labels
        .join(nbrMin.select(col("u").as("node"), col("nc")), Seq("node"), "left")
        .join(jumped, col("comp") === col("jnode"))
        .select(col("node"),
          least(col("comp"), coalesce(col("nc"), col("comp")), col("jc")).as("comp"))
        .localCheckpoint()
      converged = next
        .join(labels.select(col("node"), col("comp").as("prev")), "node")
        .filter(col("comp") =!= col("prev"))
        .isEmpty
      labels = next
      round += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
