package graft.queries

import graft.SparkSpec

/** Event-type transition matrix: hand-computed fixture covering the
  * session-gap cutoff, cross-user isolation, and the ts tie-break.
  */
class EventsTransitionSpec extends SparkSpec {
  import spark.implicits._

  private val MinNs = 60000000000L // one minute in ns

  test("events_transition_counts: gaps over 30 min break the chain; users isolated") {
    // user 1: view →(1 min) click →(31 min, dropped) view →(2 min) purchase
    // user 2: view →(5 min) view   (no cross-user edge to user 1's events)
    val rows = Seq(
      (1L, 0L * MinNs, 1L, "view", 1.0, "{}"),
      (2L, 1L * MinNs, 1L, "click", 1.0, "{}"),
      (3L, 32L * MinNs, 1L, "view", 1.0, "{}"),
      (4L, 34L * MinNs, 1L, "purchase", 1.0, "{}"),
      (5L, 0L * MinNs, 2L, "view", 1.0, "{}"),
      (6L, 5L * MinNs, 2L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("trans").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.SparkEntry.queries("events_transition_counts")(spark, tmp)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(("view", "click")) == ((1L, 60.0)))
    assert(out(("view", "purchase")) == ((1L, 120.0)))
    assert(out(("view", "view")) == ((1L, 300.0))) // user 2 only
    assert(!out.contains(("click", "view")), "the 31-min gap must break the chain")
    assert(out.size == 3)
  }
}
