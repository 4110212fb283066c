package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an undirected edge list — the transitive
 * closure the dedup operators need for exact clusters: one-hop min-id
 * assignment (the dedup default) merges a-b and b-c into {a,b} and {b,c},
 * while duplicate chains (a~b~c but a!~c directly) belong in ONE cluster.
 *
 * Algorithm: min-label propagation with pointer jumping — each round a
 * node takes the min label over itself and its neighbors, then labels are
 * compressed one level (comp := comp's comp), which doubles the distance
 * information travels: convergence in O(log(component diameter)) rounds,
 * not O(diameter).
 *
 * Scale shape per round: two joins hash-partitioned on node id + one
 * min-aggregation. Each round's label table is `localCheckpoint`ed —
 * iterative DataFrames otherwise grow the logical plan exponentially
 * (the lineage, not the data, is what blows up driver memory) — and the
 * SUPERSEDED round's blocks are released as soon as the next round
 * materializes ([[IterativeMemory]]), so storage holds one label
 * generation, not O(rounds).
 */
object ConnectedComponents {

  /**
   * @param edges two-column DataFrame (src, dst), undirected, any Long ids
   * @return (id, component) — component = min node id reachable
   */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          maxIterations: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // 1-hop: min label over self and neighbors
      val neighborLabels = sym
        .join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("comp")).as("nb_comp"))
      val hop = labels.join(neighborLabels, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nb_comp"), col("comp"))).as("comp"))
      // pointer jump: comp := comp's comp (labels always contain comp ids)
      val next = hop.as("x")
        .join(hop.select(col("id").as("comp"), col("comp").as("cc")), Seq("comp"))
        .select(col("id"), least(col("comp"), col("cc")).as("comp"))
        .localCheckpoint(true)
      // converged when no node's label shrank this round
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.comp") < col("o.comp")).limit(1).count() > 0
      // next is materialized and the convergence probe has read the old
      // generation — its blocks are dead weight from here
      IterativeMemory.release(labels)
      labels = next
      converged = !changed
      iter += 1
    }
    // the returned labels are a self-contained checkpoint; the edge
    // table's blocks are no longer reachable from any live plan
    IterativeMemory.release(sym)
    labels
  }

  /**
   * Transitive cluster representatives from verified similarity pairs:
   * the dedup-family output shape (id, keep_id, is_dup) where keep_id is
   * the min id of the CONNECTED COMPONENT (not just the one-hop
   * neighborhood). `allIds` supplies singleton docs (no pairs).
   */
  def clusterReps(allIds: DataFrame, idCol: String,
                  pairs: DataFrame, aCol: String = "id_a",
                  bCol: String = "id_b"): DataFrame = {
    val comps = run(pairs, aCol, bCol)
    allIds.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("comp"), col("id")).as("keep_id"))
      .withColumn("is_dup", col("id") =!= col("keep_id"))
      .orderBy(col("id"))
  }
}
