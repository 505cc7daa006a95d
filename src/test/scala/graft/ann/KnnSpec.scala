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

  /** Real embeddings at sf0.01 (500 × d vectors) — the recall gates run
    * at the same scale/parameters as q45/q46, so a plane-hashing or
    * banding regression fails here, not just in production plans.
    */
  private def sfEmbeddings = {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    (emb, emb.where(col("vec_id") < 20))
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH recall@3 >= 0.9 vs brute force on sf0.01 embeddings") {
    val (emb, queries) = sfEmbeddings
    val brute = pairs(Knn.bruteForceTopK(emb, queries, k = 3))
    val lsh = pairs(Knn.lshTopK(emb, queries, k = 3))
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.9,
      f"LSH recall@3 = $recall%.3f < 0.9 (${brute.size} gold pairs)")
  }

  test("IVF at full probe is exact vs brute force on sf0.01 embeddings") {
    val (emb, queries) = sfEmbeddings
    def ranked(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select(col("query_id").cast("long"),
          col("neighbor_id").cast("long"), col("rank").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = ranked(Knn.bruteForceTopK(emb, queries, k = 3))
    val ivf = ranked(Knn.ivfTopK(emb, queries, k = 3, nlist = 8, nprobe = 8))
    assert(ivf == brute,
      s"IVF full-probe diverges: missing=${(brute -- ivf).take(5)} " +
        s"extra=${(ivf -- brute).take(5)}")
  }

  test("IVF top-k matches brute force with full probing (toy)") {
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
