package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** Schema-drift canary coverage: the driver has shipped `events.ts` as
  * TIMESTAMP(NANOS) (rounds 1-4) and timestamp[us] (round 5+). [[Graft.events]]
  * must normalize BOTH — plus a raw int64-ns vintage — to the identical i64
  * ns-since-epoch Long contract, so every downstream query is byte-identical
  * across data vintages.
  *
  * Fixtures in `src/test/resources/schemadrift/` hold the same 1000 logical
  * rows (derived from the driver's sf0.001 events) in the three physical
  * vintages; `events_ts_nanos.parquet` is a true TIMESTAMP(NANOS) file
  * (Spark cannot write one — generated once via pyarrow).
  */
class SchemaDriftSpec extends SparkSpec {

  private def fixtureDir(vintage: String): String = {
    val dir = Files.createTempDirectory(s"schemadrift_$vintage")
    val in  = getClass.getResourceAsStream(s"/schemadrift/events_ts_$vintage.parquet")
    assert(in != null, s"missing fixture events_ts_$vintage.parquet")
    Files.copy(in, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private val vintages = Seq("long", "nanos", "micros")

  test("all three ts vintages normalize to LongType ns") {
    for (v <- vintages) {
      val schema = Graft.events(spark, fixtureDir(v)).schema
      assert(schema("ts").dataType == LongType, s"vintage $v")
    }
  }

  test("f1_route_source returns identical rows on every vintage") {
    val results = vintages.map { v =>
      val df = graft.queries.StreamQueries.queries("f1_route_source")(spark, fixtureDir(v))
      v -> df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    }.toMap
    assert(results("long").nonEmpty)
    assert(results("nanos") == results("long"), "nanos vintage diverged from long")
    assert(results("micros") == results("long"), "micros vintage diverged from long")
  }

  test("raw ts values agree across vintages at ns precision") {
    val ts = vintages.map { v =>
      v -> Graft.events(spark, fixtureDir(v))
        .select("event_id", "ts").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }.toMap
    assert(ts("long") == ts("nanos"))
    assert(ts("long") == ts("micros"))
  }

  test("NTZ normalization is session-timezone independent") {
    // a harness-created session not pinned to UTC must read the SAME ns
    // values: NTZ wall clocks are extracted with local arithmetic, never
    // re-interpreted through spark.sql.session.timeZone
    val dir    = fixtureDir("micros")
    val utcTs  = Graft.events(spark, dir).select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val offUtc = spark.newSession()
    offUtc.conf.set("spark.sql.session.timeZone", "America/New_York")
    val nyTs = Graft.events(offUtc, dir).select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(nyTs == utcTs, "ts shifted by session timezone on the NTZ vintage")
  }

  test("canary reports every table and the normalized ts type") {
    val lines = Graft.schemaCanary(spark, fixtureDir("micros"))
    assert(lines.exists(l => l.startsWith("[schema] events:") && l.contains("normalized ts:bigint")))
    // absent tables are reported, not fatal — the driver owns the testdata set
    assert(lines.count(_.contains("UNREADABLE")) == 9)
  }
}
