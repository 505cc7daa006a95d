package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge DataFrame (ref: SURVEY.md
  * D9 — the reference walks the edge list with a recursive DFS on the
  * driver, pgdedupe/exact_matches.py:9-50; that caps at driver memory, so
  * here it's an iterative min-label-propagation fixpoint, checkpointed per
  * round to keep lineage flat (SURVEY.md §4).
  *
  * Converges in O(max component diameter) rounds; dedupe components are
  * person-sized so this is a handful of rounds even at 100 TB. Each round
  * is one shuffle join + one aggregation.
  */
object ConnectedComponents {

  /** edges: two long columns (src, dst), undirected. Returns
    * `(id, component)` where component = min reachable id.
    */
  def run(
      edges: DataFrame,
      srcCol: String = "l_id",
      dstCol: String = "r_id",
      maxIter: Int = 50): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Vertex set (SO1, ref exact_matches.py:29: concat of both id columns).
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // Min neighbor label per vertex, with the convergence flag computed
      // inside the same label-update job: the eager localCheckpoint is the
      // iteration's ONE distributed action; the change probe afterwards is
      // a limit-1 scan of the already-materialized partitions (no join, no
      // shuffle, no lineage recompute).
      val neighborMin = sym
        .join(labels.select("id", "component").withColumnRenamed("id", "src"),
          "src")
        .groupBy(col("dst").as("id"))
        .agg(min("component").as("nbr_component"))
      val next = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_component"),
            col("component"))).as("component"),
          (coalesce(col("nbr_component"), col("component")) <
            col("component")).as("chg"))
        .localCheckpoint(true)
      val changed = next.where(col("chg")).limit(1).count()
      labels.unpersist(false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist(false)
    // Round count is the O(diameter) cost driver and varies with AQE
    // partitioning — log it so bench variance can be attributed.
    org.slf4j.LoggerFactory.getLogger(getClass).info(
      s"connected components converged in $iter rounds " +
        s"(maxIter=$maxIter, converged=$converged)")
    labels.select("id", "component")
  }
}
