package graft.operators

import graft.SparkSpec

/** `asofJoinChunked` must equal `asofJoin` on every input — it is a
  * physical re-arrangement for the hot-key regime. The fixture forces the
  * cases the stitch exists for: a hot key spanning many chunks, carry-ins
  * cascading across chunks that saw NO right row for the key, and left
  * rows before any right row (null fill).
  */
class AsofChunkedSpec extends SparkSpec {
  import spark.implicits._

  test("hot key across many chunks: chunked fill equals single-window fill") {
    // hot user 0: 3000 purchases one second apart, but only THREE clicks —
    // at t=0s, t=1000s, t=2500s — so with ~dozens of range chunks most
    // chunks contain no click at all and the carry-in must cascade across
    // them. user 1: purchase BEFORE its only click (null fill), then one
    // after. user 2: click and purchase at the SAME ts (tie → visible).
    val purchases = (0 until 3000).map(i => (i.toLong, 0L, i.toLong * 1000000L)) ++
      Seq((9001L, 1L, 5L), (9002L, 1L, 50L), (9003L, 2L, 7L))
    val clicks = Seq(
      (0L, 0L, 111.0), (0L, 1000000000L, 222.0), (0L, 2500000000L, 333.0),
      (1L, 20L, 444.0),
      (2L, 7L, 555.0))
    val p = purchases.toDF("event_id", "user_id", "ts_us")
    val c = clicks.toDF("user_id", "ts_us", "click_value")

    def collect(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
      df.select("event_id", "click_value").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val base = collect(AsofJoin.asofJoin(p, c, Seq("user_id"), "ts_us", Seq("click_value")))
    val chunked = collect(AsofJoin.asofJoinChunked(
      p, c, Seq("user_id"), "ts_us", Seq("click_value"), 64))
    assert(chunked.size == 3003)
    assert(chunked == base)
    // spot-check the hand math, not just cross-implementation agreement
    assert(chunked(0L).contains(111.0))     // t=0 tie: click visible at its own ts
    assert(chunked(999L).contains(111.0))   // last purchase before the 2nd click
    assert(chunked(1000L).contains(222.0))
    assert(chunked(2999L).contains(333.0))  // cascaded across many click-free chunks
    assert(chunked(9001L).isEmpty)          // purchase before the user's first click
    assert(chunked(9002L).contains(444.0))
    assert(chunked(9003L).contains(555.0))  // same-ts tie on a cold key
  }

  test("matches the window variant on driver testdata") {
    val dir = "/root/testdata/sf0.001"
    def run(name: String) =
      graft.SparkEntry.queries(name)(spark, dir)
        .select("event_id", "click_value").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .sortBy(_._1).toSeq
    assert(run("asof_latest_click_skewsafe") == run("asof_latest_click"))
  }

  test("null keys carry across chunks like the single-window form") {
    // Window.partitionBy groups null keys into ONE partition, so the
    // single-window asof carries values within the null-key stream; the
    // chunked stitch must do the same across chunk boundaries (its
    // join-back is null-safe — a plain equi-join would never match the
    // null-key carry rows and silently null the cross-chunk fills)
    val purchases = (0 until 400).map(i =>
      (i.toLong, Option.empty[Long], i.toLong * 1000L)) ++
      Seq((900L, Some(1L), 500000L))
    val clicks = Seq((Option.empty[Long], 10L, 42.0), (Some(1L), 10L, 7.0))
    val p = purchases.toDF("event_id", "user_id", "ts_us")
    val c = clicks.toDF("user_id", "ts_us", "click_value")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "click_value").collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val base = collect(
      AsofJoin.asofJoin(p, c, Seq("user_id"), "ts_us", Seq("click_value")))
    val chunked = collect(AsofJoin.asofJoinChunked(
      p, c, Seq("user_id"), "ts_us", Seq("click_value"), 32))
    assert(chunked == base)
    assert(chunked(399L).contains(42.0)) // null-key carry crossed chunks
    assert(chunked(900L).contains(7.0))
  }

  test("null-VALUED right rows stay invisible, per column, across chunks") {
    // last(value, ignoreNulls) skips null-valued right rows in the
    // single-window form; the chunked carry-out must too — and each value
    // column carries independently (one column's later null-valued row
    // must not mask another's)
    val purchases = (0 until 300).map(i => (i.toLong, 0L, 1000L + i))
    val clicks = Seq(
      (0L, 1L, Some(1.0), Some(10.0)),
      (0L, 2L, Option.empty[Double], Some(20.0)),
      (0L, 3L, Some(3.0), Option.empty[Double]))
    val p = purchases.toDF("event_id", "user_id", "ts_us")
    val c = clicks.toDF("user_id", "ts_us", "a", "b")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "a", "b").collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val base = collect(
      AsofJoin.asofJoin(p, c, Seq("user_id"), "ts_us", Seq("a", "b")))
    val chunked = collect(AsofJoin.asofJoinChunked(
      p, c, Seq("user_id"), "ts_us", Seq("a", "b"), 16))
    assert(chunked == base)
    // hand math: latest non-null a = 3.0 (t=3), latest non-null b = 20.0 (t=2)
    assert(chunked.contains((299L, Some(3.0), Some(20.0))))
  }
}
