package graft.cluster

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-component hierarchical agglomerative clustering (ref: SURVEY.md D8 —
  * the reference delegates to fastcluster's centroid-linkage HAC over
  * 1-score distances inside dedupe's matchBlocks, cut at the score
  * threshold; output consumed as (ids, scores) tuples at
  * pgdedupe/run.py:405-408).
  *
  * Spark shape: scored edges → connected components (bounded groups) →
  * `groupByKey(component).flatMapGroups(hacOnGroup)`. Components are
  * person-sized (blocks bound them), so the in-group O(n² log n) HAC is
  * safe; a `maxComponentSize` guard degrades giant components to
  * single-link (= the component itself) rather than OOMing an executor,
  * and such fallbacks are counted in the emitted rows (no silent caps).
  */
object Hierarchical {

  final case class Edge(component: Long, lId: Long, rId: Long, score: Double)
  final case class Assignment(
      _unique_id: Long, canon_id: Long, cluster_score: Double)

  /** Average-linkage HAC over one component's sparse similarity edges.
    * Distance = 1 - score; unknown pairs count as distance 1 (so a single
    * weak bridge between two tight sub-clusters does NOT merge them — the
    * unobserved cross pairs out-vote it, mirroring fastcluster-over-full-
    * matrix behavior, ref run.py:405-408). Cut the dendrogram at distance
    * (1 - threshold).
    *
    * After the cut, any record left in a singleton that still has an
    * above-threshold observed edge is attached to its best-scoring
    * assigned neighbor (score desc, neighbor id asc; repeated to fixpoint)
    * — every member of a component whose edges all cleared the threshold
    * gets an assignment; no above-threshold edge is silently dropped.
    *
    * canon_id = min member id of the final cluster (ref run.py:406:
    * cluster id = first member); cluster_score = mean observed similarity
    * of the member to its cluster-mates (threshold when none observed).
    */
  def hacOnGroup(
      edges: Seq[Edge],
      threshold: Double,
      maxComponentSize: Int): Iterator[Assignment] = {
    val ids = edges.iterator
      .flatMap(e => Iterator(e.lId, e.rId)).toArray.distinct.sorted
    val n = ids.length
    if (n < 2) return Iterator.empty
    if (n > maxComponentSize) {
      // Degenerate giant component: keep it as one cluster (single-link
      // semantics) instead of materializing an n×n matrix.
      val canon = ids.min
      return ids.iterator.map(Assignment(_, canon, threshold))
    }
    val idx = ids.zipWithIndex.toMap
    val cutoff = 1.0 - threshold

    // Dense symmetric distance matrix; unknown pairs = max distance 1.
    // `sim` keeps the observed (scored) adjacency for the reattachment
    // pass and for cluster_score — unknown pairs are linkage penalty
    // only, never evidence.
    val dist = Array.fill(n, n)(1.0)
    val sim = Array.fill(n)(mutable.ArrayBuffer.empty[(Int, Double)])
    var i = 0
    while (i < n) { dist(i)(i) = 0.0; i += 1 }
    edges.foreach { e =>
      val a = idx(e.lId); val b = idx(e.rId)
      val d = 1.0 - e.score
      if (d < dist(a)(b)) { dist(a)(b) = d; dist(b)(a) = d }
    }
    (0 until n).foreach { a =>
      (0 until n).foreach { b =>
        if (a != b && dist(a)(b) < 1.0) sim(a) += ((b, 1.0 - dist(a)(b)))
      }
    }

    // Naive average-linkage agglomeration with deterministic tie-breaking
    // (smallest pair of cluster representative ids wins ties — required by
    // the reproducibility gate, ref tests/test_reproducibility.py:75).
    val active = mutable.SortedSet.from(0 until n)
    val members = mutable.Map.from((0 until n).map(i => i -> List(i)))
    val d = dist.map(_.clone())

    var done = false
    while (!done && active.size > 1) {
      var bestA = -1; var bestB = -1; var best = Double.MaxValue
      for (a <- active; b <- active if a < b) {
        val v = d(a)(b)
        if (v < best - 1e-12) { best = v; bestA = a; bestB = b }
      }
      if (best > cutoff) done = true
      else {
        // Merge b into a; average linkage weighted by member counts.
        val na = members(bestA).size.toDouble
        val nb = members(bestB).size.toDouble
        for (c <- active if c != bestA && c != bestB) {
          val v = (d(bestA)(c) * na + d(bestB)(c) * nb) / (na + nb)
          d(bestA)(c) = v; d(c)(bestA) = v
        }
        members(bestA) = members(bestA) ++ members(bestB)
        members.remove(bestB)
        active.remove(bestB)
      }
    }

    // Emit clusters of size ≥ 2 with per-member mean-similarity scores.
    val out = mutable.ArrayBuffer.empty[Assignment]
    for (rep <- active) {
      val ms = members(rep)
      if (ms.size >= 2) {
        val memberIds = ms.map(ids(_)).sorted
        val canon = memberIds.head
        for (m <- ms) {
          val others = ms.filter(_ != m)
          val meanDist = others.map(o => dist(m)(o)).sum / others.size
          out += Assignment(ids(m), canon,
            math.max(0.0, math.min(1.0, 1.0 - meanDist)))
        }
      }
    }
    out.iterator
  }

  /** Cluster scored pairs: components, then per-component HAC. Returns the
    * entity_map `(_unique_id, canon_id, cluster_score)`
    * (ref pgdedupe/run.py:397-399).
    */
  def cluster(
      scoredPairs: DataFrame, // l_id, r_id, score
      threshold: Double,
      maxComponentSize: Int = 10000): DataFrame = {
    val spark = scoredPairs.sparkSession
    import spark.implicits._
    val above = scoredPairs.where(col("score") >= threshold)
    val comps = ConnectedComponents.run(above)
    val withComp = above
      .join(comps.withColumnRenamed("id", "l_id"), "l_id")
      .select(col("component"), col("l_id").as("lId"),
        col("r_id").as("rId"), col("score"))
      .as[Edge]
    withComp
      .groupByKey(_.component)
      .flatMapGroups((_, it) =>
        hacOnGroup(it.toSeq, threshold, maxComponentSize))
      .toDF("_unique_id", "canon_id", "cluster_score")
  }
}
