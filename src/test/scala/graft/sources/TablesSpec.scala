package graft.sources

import org.apache.spark.sql.types.TimestampType

import graft.{SparkSpec, Tables}

/** Fixture-encoding contract of [[Tables.load]]: the harness has shipped
  * `events.ts` as TIMESTAMP(NANOS), as micros with isAdjustedToUTC=false
  * (TIMESTAMP_NTZ), and as UTC micros across regenerations — consumers
  * must see plain session-zone TimestampType in every era, or any
  * `Row.getTimestamp` accessor breaks on the next regeneration.
  */
class TablesSpec extends SparkSpec {

  test("load normalizes events.ts to TimestampType whatever the " +
      "fixture's parquet timestamp encoding") {
    val events = Tables.load(spark, sf0001, "events")
    assert(events.schema("ts").dataType == TimestampType,
      s"ts read as ${events.schema("ts").dataType}")
    // The external row type must be java.sql.Timestamp (a TIMESTAMP_NTZ
    // leak would hand back java.time.LocalDateTime and throw here).
    val t = events.select("ts").orderBy("ts").head().getTimestamp(0)
    assert(t != null && t.getTime > 0)
  }
}
