package graft.functions

import graft.SparkSpec
import graft.ann.Knn
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Gates the native cosine_sim Catalyst expression (CosineSimilarity) and
  * its SparkSessionExtensions registration:
  *  - three-way BIT equality against the two older tiers (the HOF Column
  *    form and the primitive-loop UDF) — oracle hashes depend on it;
  *  - whole-stage codegen: the verify projection must not break out to
  *    a ScalaUDF call;
  *  - SQL resolvability through the injected function registry;
  *  - loud analysis failure on wrong input types.
  */
class FunctionsSpec extends SparkSpec {

  private def randomVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f),
        Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toDF("id", "a", "b")
  }

  test("cosine_sim is bit-identical to the HOF form and the UDF") {
    val df = randomVecs(500, 64, seed = 11L)
      .withColumn("e_expr", GraftFunctions.cosineSim(col("a"), col("b")))
      .withColumn("e_hof", Knn.cosine(col("a"), col("b")))
      .withColumn("e_udf", Knn.cosineUdf(col("a"), col("b")))
    val rows = df.select("e_expr", "e_hof", "e_udf").collect()
    assert(rows.length === 500)
    rows.foreach { case Row(e: Double, h: Double, u: Double) =>
      assert(java.lang.Double.doubleToRawLongBits(e) ===
        java.lang.Double.doubleToRawLongBits(h), s"expr $e vs hof $h")
      assert(java.lang.Double.doubleToRawLongBits(e) ===
        java.lang.Double.doubleToRawLongBits(u), s"expr $e vs udf $u")
    }
  }

  test("cosine_sim stays inside whole-stage codegen (no ScalaUDF)") {
    // Over a real parquet scan (a literal-backed frame constant-folds to
    // a LocalTableScan and shows nothing). The Project carrying
    // cosine_sim must be inside a codegen span — `*(n) Project` in the
    // executed plan — and no ScalaUDF may appear anywhere.
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val df = emb.select(GraftFunctions
      .cosineSim(col("embedding"), col("embedding")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    val codegenProject = plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("*(") && l.contains("cosine_sim"))
    assert(codegenProject,
      s"cosine_sim projection not in a WholeStageCodegen span:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"native expression must not plan as a UDF call:\n$plan")
    // And the generated code path actually runs: self-cosine ≡ 1.
    val vals = df.limit(20).collect().map(_.getDouble(0))
    assert(vals.nonEmpty && vals.forall(v => math.abs(v - 1.0d) < 1e-9))
  }

  test("cosine_sim resolves from SQL via the injected registry") {
    val one = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
        |                  array(cast(1.0 as float), cast(0.0 as float)))
        |       AS c""".stripMargin).head().getDouble(0)
    assert(math.abs(one - 1.0d) < 1e-12)
    val orth = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
        |                  array(cast(0.0 as float), cast(1.0 as float)))
        |       AS c""".stripMargin).head().getDouble(0)
    assert(math.abs(orth) < 1e-12)
  }

  test("cosine_sim null inputs yield null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(GraftFunctions.cosineSim(col("a"), col("b")).as("c"))
    assert(df.head().isNullAt(0))
  }

  test("cosine_sim null ELEMENTS yield null in both eval paths, not a " +
      "silent 0.0 read") {
    import org.apache.spark.sql.types.{ArrayType, FloatType, StructField,
      StructType}
    // Codegen path: a containsNull=true frame (exactly what a parquet
    // scan produces) with one null slot — the row must come back NULL,
    // and a null-free row through the SAME nullable schema must be
    // unaffected.
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq(1.0f, null, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
        Row(Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))),
      schema).select(GraftFunctions.cosineSim(col("a"), col("b")).as("c"))
    val got = df.collect()
    assert(got(0).isNullAt(0), "null element must yield NULL")
    assert(math.abs(got(1).getDouble(0) - 1.0) < 1e-9)
    // Interpreted path (nullSafeEval) directly.
    import org.apache.spark.sql.catalyst.expressions.Literal
    val at = ArrayType(FloatType, containsNull = true)
    assert(CosineSimilarity(
      Literal.create(Seq(1.0f, null, 3.0f), at),
      Literal.create(Seq(1.0f, 2.0f, 3.0f), at)).eval(null) == null)
    assert(math.abs(CosineSimilarity(
      Literal.create(Seq(3.0f, 4.0f), at),
      Literal.create(Seq(3.0f, 4.0f), at)).eval(null)
      .asInstanceOf[Double] - 1.0) < 1e-9)
  }

  test("cosine_sim rejects non-float-array inputs at analysis") {
    val err = intercept[AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1, 2), array(3, 4))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim") ||
      err.getMessage.contains("array<float>"),
      s"unexpected analysis error: ${err.getMessage}")
  }
}
