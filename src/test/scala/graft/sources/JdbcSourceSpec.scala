package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** S1 alternate source: partitioned JDBC scan (ref pgdedupe/run.py:138-144
  * reads the entries table from Postgres). Driven against an EMBEDDED
  * in-memory Derby database — the only JDBC engine shipped with the Spark
  * jars — so the test exercises the real JDBC code path end to end:
  * parallel range predicates, filter pushdown, round-tripped values.
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val derbyOpts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val seeded: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE entries (id INT PRIMARY KEY, name VARCHAR(32))")
      val ps = conn.prepareStatement("INSERT INTO entries VALUES (?, ?)")
      (1 to 1000).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"n$i"); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  test("partitioned JDBC read splits the scan and round-trips all rows") {
    seeded
    val df = Tables.loadJdbc(spark, url, "entries", "id",
      lowerBound = 1, upperBound = 1001, numPartitions = 4,
      options = derbyOpts)
    // numPartitions parallel range queries, not one serial cursor.
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    val sum = df.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
    assert(sum == 1000L * 1001 / 2)
  }

  test("JDBC filters push down into the generated SQL") {
    seeded
    val df = Tables.loadJdbc(spark, url, "entries", "id",
      lowerBound = 1, upperBound = 1001, numPartitions = 4,
      options = derbyOpts)
      .where(col("id") <= 10).select("id")
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual"),
      s"filter not pushed to the JDBC scan:\n$plan")
  }
}
