package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KnnSpec extends SparkSpec {

  private def vectors = {
    import spark.implicits._
    // Three tight groups along axes + one diagonal outlier.
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.05f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.05f, 0.99f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (6L, Array(0.0f, 0.05f, 0.99f, 0.0f)),
      (7L, Array(0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
  }

  test("brute-force top-1 finds the obvious nearest neighbor") {
    val out = Knn.bruteForceTopK(vectors, vectors, k = 1)
    val nn = out.collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(nn(1L) == 2L && nn(2L) == 1L)
    assert(nn(3L) == 4L && nn(4L) == 3L)
    assert(nn(5L) == 6L && nn(6L) == 5L)
  }

  test("brute-force ranks are dense and cosine is monotone") {
    val rows = Knn.bruteForceTopK(vectors, vectors, k = 3)
      .where(col("query_id") === 1L)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    val cosines = rows.map(_.getAs[Double]("cosine")).toSeq
    assert(cosines == cosines.sorted.reverse)
  }

  test("LSH top-k recalls most brute-force neighbors") {
    val brute = Knn.bruteForceTopK(vectors, vectors, k = 1).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val lsh = Knn.lshTopK(vectors, vectors, k = 1,
      numPlanes = 4, numTables = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val recalled = brute.count(lsh.contains)
    assert(recalled >= brute.size / 2,
      s"LSH recalled only $recalled of ${brute.size}")
  }

  test("IVF top-k matches brute force with full probing") {
    val brute = Knn.bruteForceTopK(vectors, vectors, k = 1).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val ivf = Knn.ivfTopK(vectors, vectors, k = 1,
      nlist = 2, nprobe = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(ivf == brute, s"ivf=$ivf brute=$brute")
  }
}
