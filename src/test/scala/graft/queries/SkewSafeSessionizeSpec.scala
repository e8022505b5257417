package graft.queries

import graft.SparkSpec

/** `events_sessionize_skewsafe` must equal the window-based
  * `events_sessionize` on every input — it is a physical re-arrangement
  * (range-chunked local windows + a boundary stitch), not a semantic
  * variant — while never building a window partition that holds a whole
  * user's stream.
  */
class SkewSafeSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val MinNs = 60000000000L // one minute in ns
  private val GapNs = 30L * MinNs  // the 30-min session gap

  private def run(name: String, dir: String): Map[Long, (Long, Long)] =
    graft.SparkEntry.queries(name)(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("hot user spanning many chunks: counts match the window variant and hand math") {
    // user 0 is the hot key: 4000 events, one per minute, with a >30-min
    // gap after every 500th event → 8 sessions of 500. The per-minute
    // spacing keeps every within-session chunk boundary UNDER the gap
    // threshold, so the stitch's boundary_merge correction is exercised at
    // every chunk edge the range partitioner cuts. Users 1/2 are cold
    // controls, one with a tie-breaking duplicate timestamp.
    val hot = (0 until 4000).map { i =>
      val session = i / 500
      val ts = (session * 3600L + (i % 500)) * MinNs // 60-min inter-session silence
      (i.toLong, ts, 0L, "view", 1.0, "{}")
    }
    val cold = Seq(
      (9001L, 0L, 1L, "view", 1.0, "{}"),
      (9002L, GapNs, 1L, "view", 1.0, "{}"),          // exactly the gap: same session
      (9003L, GapNs + MinNs + GapNs, 1L, "view", 1.0, "{}"), // gap+1min later: new session
      (9004L, 5L * MinNs, 2L, "view", 1.0, "{}"),
      (9005L, 5L * MinNs, 2L, "view", 1.0, "{}")      // duplicate ts: zero gap
    )
    val tmp = java.nio.file.Files.createTempDirectory("skewsess").toString
    (hot ++ cold).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val safe = run("events_sessionize_skewsafe", tmp)
    assert(safe(0L) == ((8L, 4000L)), s"hot user: ${safe(0L)}")
    assert(safe(1L) == ((2L, 3L)))
    assert(safe(2L) == ((1L, 2L)))
    assert(safe == run("events_sessionize", tmp))
  }

  test("matches the window variant on driver testdata") {
    val dir = "/root/testdata/sf0.001"
    assert(run("events_sessionize_skewsafe", dir) == run("events_sessionize", dir))
  }

  test("plan: stream is range-partitioned; no window partition spans a bare user") {
    // plan-string matching (repo precedent: IvfIndexSpec) — AQE query-stage
    // wrappers hide sub-plans from structural collect, but toString renders
    // the whole tree
    val plan = graft.SparkEntry.queries("events_sessionize_skewsafe")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning("),
      "expected a RangePartitioning exchange feeding the local windows")
    // the full-stream window must be keyed by (pid, user_id): a window spec
    // partitioned by bare user_id and ORDERED BY ts is exactly the hot-key
    // straggler shape this variant exists to avoid. (The stitch window —
    // partitionBy(user_id).orderBy(pid) over the tiny per-chunk frame —
    // renders as `windowspecdefinition(user_id, pid ASC…)` and is allowed.)
    val bareUserTsWindow = """windowspecdefinition\(user_id#\d+L?, ts""".r
    assert(bareUserTsWindow.findFirstIn(plan).isEmpty,
      "found a window partitioned by bare user_id over the raw stream")
    assert("""windowspecdefinition\(pid#\d+, user_id""".r.findFirstIn(plan).nonEmpty,
      "expected the local window keyed by (pid, user_id)")
  }
}
