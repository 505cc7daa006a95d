package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val spark = edges.sparkSession
    ensureCheckpointDir(spark)

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
      // Min neighbor label per vertex.
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("component").as("nbr_component"))
      val next = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_component"),
            col("component"))).as("component"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .where(col("component") < col("old")).limit(1).count()
      labels.unpersist(false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist(false)
    labels
  }

  private def ensureCheckpointDir(spark: SparkSession): Unit = {
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-checkpoints").toString
      spark.sparkContext.setCheckpointDir(dir)
    }
  }
}
