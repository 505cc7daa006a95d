package graft.sources

import org.apache.spark.sql.DataFrame

import graft.{SparkSpec, Tables}

/** Generator-driven round-trip gate for the source/sink family: seeded
  * hostile frames through every text sink/load pair must come back
  * CELL-IDENTICAL. This suite is what found the two CSV fidelity
  * defects fixed in [[Tables]] — the default reader folding quoted
  * `""` (empty string) into null, and the default WRITER trimming
  * leading/trailing whitespace — and it pins the documented newline
  * contract (embedded newlines corrupt the splittable reader; the
  * multiLine opt-in round-trips them at the cost of file-level
  * parallelism).
  *
  * Comparison is by per-cell string rendering, not `==`: boxed-double
  * equality folds `-0.0 == 0.0`, which would hide a sign flip the
  * text formats are perfectly capable of committing.
  */
class RandomizedSourceSinkDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val hostileStrings: Seq[String] = Seq(
    null, "", " ", "  padded  ", "\t tab lead", "comma, inside",
    "he said \"hi\" twice \"\"", "'single'", "\\N", "\\", "ünï🚀字符",
    "trailing space ", "semi;colon", "x" * 300, "0", "null", "NaN")

  private val hostileDoubles: Seq[java.lang.Double] = Seq(
    null, 0.0, -0.0, 1.5, -42.5, 1e300, -1.7976931348623157e308,
    java.lang.Double.MIN_VALUE, 123456.789)

  private def hostileFrame(seed: Long, n: Int,
      withNewlines: Boolean): DataFrame = {
    val r = new scala.util.Random(seed)
    val strs = hostileStrings ++
      (if (withNewlines) Seq("line1\nline2", "\n", "crlf\r\nend") else Nil)
    val rows = (0 until n).map { i =>
      val s = if (r.nextInt(3) == 0) strs(r.nextInt(strs.length))
        else r.alphanumeric.take(1 + r.nextInt(12)).mkString
      val d = hostileDoubles(r.nextInt(hostileDoubles.length))
      val l: java.lang.Long =
        if (r.nextInt(8) == 0) null
        else java.lang.Long.valueOf(r.nextLong())
      (i.toLong, s, d, l)
    }
    rows.toDF("id", "s", "d", "n")
  }

  /** Cell-exact comparison via string rendering (see class doc). */
  private def assertSame(tag: String, seed: Long, src: DataFrame,
      back: DataFrame): Unit = {
    def render(df: DataFrame): Seq[Seq[String]] =
      df.orderBy("id").collect().toSeq
        .map(_.toSeq.map(c => Option(c).map(_.toString).getOrElse("<NULL>")))
    val a = render(src)
    val b = render(back)
    assert(a.size == b.size, s"$tag seed=$seed: ${a.size} vs ${b.size} rows")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"$tag seed=$seed row $i: wrote $x read $y")
    }
  }

  private def path(tag: String, seed: Long): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_ssd_" +
      s"${ProcessHandle.current().pid()}/${tag}_$seed"

  test("CSV sink/load round-trips hostile frames cell-identically — " +
      "null vs empty string, padded whitespace, quotes, unicode, " +
      "double extremes (3 seeds)") {
    Seq(5L, 77L, 1312L).foreach { seed =>
      val src = hostileFrame(seed, 200, withNewlines = false)
      val p = path("csv", seed)
      Tables.sinkCsv(src, p)
      assertSame("csv", seed, src, Tables.loadCsv(spark, p, src.schema))
    }
  }

  test("CSV multiLine opt-in round-trips embedded newlines (incl. CRLF " +
      "and lone-newline fields); the default splittable reader is " +
      "DOCUMENTED to corrupt them — gate that it really does") {
    val seed = 99L
    val src = hostileFrame(seed, 200, withNewlines = true)
    val p = path("csv_nl", seed)
    Tables.sinkCsv(src, p)
    assertSame("csv_multiline", seed, src,
      Tables.loadCsv(spark, p, src.schema, multiLine = true))
    // The contract's other half: if the splittable reader ever started
    // round-tripping newlines, the multiLine flag (and its scaladoc's
    // scale warning) would be dead weight — notice.
    val defaultRows = Tables.loadCsv(spark, p, src.schema).count()
    assert(defaultRows != src.count(),
      "default splittable reader unexpectedly round-tripped embedded " +
        "newlines — revisit loadCsv's multiLine contract")
  }

  test("EXTERNAL CSV under the sentinel nullValue: quoted-empty cells " +
      "in NUMERIC columns still read as clean nulls (row intact), " +
      "string columns keep the quoted empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ext_csv")
    java.nio.file.Files.writeString(dir.resolve("x.csv"),
      "a,b,c\n5,\"\",7\n1,2,3\n8,,9\n")
    val intSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "a INT, b INT, c INT")
    val asInts = Tables.loadCsv(spark, dir.toString, intSchema)
      .orderBy("a").collect().map(_.toSeq).toSeq
    assert(asInts == Seq(Seq(1, 2, 3), Seq(5, null, 7), Seq(8, null, 9)),
      s"quoted-empty numeric mishandled: $asInts")
    val strSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "a INT, b STRING, c INT")
    val asStr = Tables.loadCsv(spark, dir.toString, strSchema)
      .orderBy("a").collect().map(_.toSeq).toSeq
    assert(asStr == Seq(Seq(1, "2", 3), Seq(5, "", 7), Seq(8, null, 9)),
      s"string null/empty distinction lost on external file: $asStr")
  }

  test("ORC and JSON-lines sink/load round-trip the same hostile " +
      "frames INCLUDING embedded newlines, with no options at all " +
      "(3 seeds)") {
    Seq(5L, 77L, 1312L).foreach { seed =>
      val src = hostileFrame(seed, 200, withNewlines = true)
      val po = path("orc", seed)
      Tables.sinkOrc(src, po)
      assertSame("orc", seed, src, Tables.loadOrc(spark, po, src.schema))
      val pj = path("json", seed)
      Tables.sinkJson(src, pj)
      assertSame("json", seed, src, Tables.loadJson(spark, pj, src.schema))
    }
  }
}
