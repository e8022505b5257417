package graft.queries

import graft.SparkSpec

/** Rolling 7-day distinct users via mergeable HLL sketches: exact window
  * counts against a hand-computed fixture, and the estimator bound holds
  * (at fixture cardinalities the DataSketches HLL is in exact sparse
  * mode, so within_bound is not just probable but guaranteed).
  */
class RollingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private val DayNs = 86400000000000L

  test("events_rolling_distinct_7d: hand-computed windows, bound holds") {
    // day 0: users 1,2 | day 3: users 2,3 | day 8: user 9
    // window(0) = {1,2} = 2; window(3) = {1,2,3} = 3 (day 0 within 7d);
    // window(8) = {2,3,9} = 3 (day 3 in, day 0 out)
    val rows = Seq(
      (1L, 0L * DayNs + 5L, 1L, "click", 1.0, "{}"),
      (2L, 0L * DayNs + 6L, 2L, "click", 1.0, "{}"),
      (3L, 3L * DayNs + 7L, 2L, "click", 1.0, "{}"),
      (4L, 3L * DayNs + 8L, 3L, "click", 1.0, "{}"),
      (5L, 8L * DayNs + 9L, 9L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("roll").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.SparkEntry.queries("events_rolling_distinct_7d")(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(0L -> ((2L, true)), 3L -> ((3L, true)), 8L -> ((3L, true))))
  }
}
