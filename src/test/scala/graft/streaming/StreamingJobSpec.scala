package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.plans.NexusPlan
import graft.sources.Fixtures.{Ev44Msg, F144Msg}

/** Cross-batch streaming semantics: the hard parts from SURVEY §7.4 —
  * consecutive dedup across micro-batch boundaries, the buffered pre-start
  * message surviving until its trigger, the ev44 cumulative index shift, and
  * strict finish — exercised through MemoryStream micro-batches.
  */
class StreamingJobSpec extends SparkSpec {
  import spark.implicits._

  private val template =
    """{ "children": [
      |  { "name": "entry", "type": "group", "children": [
      |    { "name": "speed", "type": "group", "children": [
      |      { "module": "f144",
      |        "config": { "source": "speed", "topic": "tp",
      |                    "enable_epics_con_info": false,
      |                    "enable_alarm_info": false } } ] },
      |    { "name": "events", "type": "group", "children": [
      |      { "module": "ev44", "config": { "source": "det", "topic": "tp" } } ] }
      |  ] } ] }""".stripMargin

  private def f144(offset: Long, tsMs: Long, v: Double) =
    F144Msg("tp", "speed", offset, tsMs, tsMs * 1000000L, v)
  private def ev44(offset: Long, tsMs: Long, tof: Seq[Int]) =
    Ev44Msg("tp", "det", offset, tsMs, tsMs * 1000000L,
      Seq(tsMs * 1000000L), Seq(0), tof, tof.map(_ + 1))

  private def newJob(out: String) =
    new StreamingJob(spark, NexusPlan.parse(template), out, 10000, 15000)

  test("finish materializes declared tables for streams with no messages") {
    val out = Files.createTempDirectory("graft-stream").toString
    val job = newJob(out)
    // only f144 sees data; the ev44 stream never receives a message
    job.processBatch("f144", Seq(f144(0, 10100, 1.0)).toDF())
    job.finish()
    // ev44 declares events/index/cue — all must exist, zero rows, typed
    for (t <- Seq("events", "index", "cue")) {
      val df = spark.read.parquet(s"$out/data/entry/events/$t")
      assert(df.count() == 0, s"$t should be an empty seed")
    }
    assert(spark.read.parquet(s"$out/data/entry/events/events")
      .schema.fieldNames.toSet == Set("row", "event_time_offset", "event_id"))
    // the written f144 data table is untouched by seeding
    assert(spark.read.parquet(s"$out/data/entry/speed/data").count() == 1)
  }

  test("attach checkpoints under the job output (restart-continuous batch ids)") {
    val out = Files.createTempDirectory("graft-attachckpt").toString
    val job = newJob(out)
    val stream = MemoryStream[F144Msg](spark)
    val q = StreamingJob.attach(job, "f144", stream.toDF(), triggerMs = 50)
    try {
      stream.addData(f144(0, 10100, 1.0))
      q.processAllAvailable()
    } finally q.stop()
    // replay idempotency persists a batch-id high-water mark in state.bin;
    // it is only sound if the query's batch ids survive restarts, i.e. the
    // checkpoint is stable — an ephemeral checkpoint would renumber from 0
    // and the mark would skip FRESH batches as replays
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/.checkpoints/f144")))
    assert(spark.read.parquet(s"$out/data/entry/speed/data").count() == 1)
  }

  test("finish() closes the job: parked/late batches drop instead of appending") {
    val out = Files.createTempDirectory("graft-closed").toString
    val job = newJob(out)
    job.processBatch("f144", Seq(f144(0, 10100, 1.0)).toDF())
    job.finish()
    assert(job.isClosed)
    // a batch arriving after close (e.g. a pause-parked trigger resuming)
    // must not append past closing.json
    job.processBatch("f144", Seq(f144(1, 10200, 2.0)).toDF())
    assert(spark.read.parquet(s"$out/data/entry/speed/data").count() == 1)
    assert(job.counter("entry/speed", "data") == 1L)
  }

  test("finish() writes close-time finals from the sink (f144 meta, ev44 events)") {
    val out = Files.createTempDirectory("graft-finals").toString
    val job = newJob(out)
    job.processBatch("f144", Seq(
      f144(0, 10100, 10.0), f144(1, 10200, 15.0)).toDF())
    job.processBatch("ev44", Seq(
      ev44(0, 10100, Seq(1, 2, 3)), ev44(1, 10200, Seq(4, 5))).toDF())
    job.finish()
    val meta = spark.read.parquet(s"$out/data/entry/speed/meta").collect().head
    assert(meta.getAs[Double]("minimum_value") == 10.0)
    assert(meta.getAs[Double]("maximum_value") == 15.0)
    assert(meta.getAs[Double]("average_value") == 12.5)
    assert(meta.getAs[Long]("num_values") == 2L)
    val evMeta = spark.read.parquet(s"$out/data/entry/events/meta").collect().head
    assert(evMeta.getAs[Long]("events") == 5L)
  }

  test("finish() checkpoints its own state: a restart cannot re-flush the buffer") {
    val out = Files.createTempDirectory("graft-finstate").toString
    val job = newJob(out)
    // only a pre-start message arrives → buffered, flushed at finish
    job.processBatch("f144", Seq(f144(0, 9500, 7.0)).toDF())
    job.finish()
    assert(spark.read.parquet(s"$out/data/entry/speed/data").count() == 1)
    // a restarted job must load the POST-flush cursors (buffered=None,
    // rowsWritten advanced) — re-running finish() must not duplicate row 0
    val job2 = new StreamingJob(spark, NexusPlan.parse(template), out, 10000, 15000)
    job2.finish()
    val d = spark.read.parquet(s"$out/data/entry/speed/data")
    assert(d.count() == 1)
    assert(job2.counter("entry/speed", "data") == 1L)
  }

  test("da00 multi-variable messages ride F4 whole: repeat dropped entirely, kept ones pivot fully") {
    // a da00 message explodes into one row per VARIABLE before the
    // kernel; message-grain dedup must drop/keep those rows together —
    // row-grain dedup would strip every variable after the first from
    // EVERY message (same offset, same ts)
    val template =
      """{ "children": [
        |  { "name": "entry", "type": "group", "children": [
        |    { "name": "img", "type": "group", "children": [
        |      { "module": "da00",
        |        "config": { "source": "arr", "topic": "tp",
        |                    "variables": [
        |                      {"name": "a", "data_type": "float64"},
        |                      {"name": "b", "data_type": "float64"} ] } } ] }
        |  ] } ] }""".stripMargin
    val out = Files.createTempDirectory("graft-da00mg").toString
    val job = new StreamingJob(spark, NexusPlan.parse(template), out, 0, 1L << 40)
    def msg(off: Long, tsMs: Long) = Seq(
      ("tp", "arr", off, tsMs * 1000000L, "a", "x", Seq(1.0 + off, 2.0)),
      ("tp", "arr", off, tsMs * 1000000L, "b", "x", Seq(9.0 + off)))
    job.processBatch("da00",
      (msg(0, 1000) ++ msg(1, 1000) ++ msg(2, 2000))
        .toDF("topic", "source_name", "offset", "ts", "name", "axis_name", "data"))
    job.finish()
    val d = spark.read.parquet(s"$out/data/entry/img/data").orderBy("row").collect()
    // msg1 (repeated ts) dropped WHOLE; msg0 and msg2 keep BOTH variables
    assert(d.length == 2)
    def arr(r: org.apache.spark.sql.Row, c: String): Seq[Double] =
      r.getSeq[Double](r.fieldIndex(c)).toSeq
    assert(arr(d(0), "a") == Seq(1.0, 2.0) && arr(d(0), "b") == Seq(9.0))
    assert(arr(d(1), "a") == Seq(3.0, 2.0) && arr(d(1), "b") == Seq(11.0))
    assert(job.counter("entry/img", "data") == 2L)
  }

  test("da00 pre-start message is buffered WHOLE: both variables survive to the pivot") {
    val template =
      """{ "children": [
        |  { "name": "entry", "type": "group", "children": [
        |    { "name": "img", "type": "group", "children": [
        |      { "module": "da00",
        |        "config": { "source": "arr", "topic": "tp",
        |                    "variables": [
        |                      {"name": "a", "data_type": "float64"},
        |                      {"name": "b", "data_type": "float64"} ] } } ] }
        |  ] } ] }""".stripMargin
    val out = Files.createTempDirectory("graft-da00buf").toString
    val job = new StreamingJob(spark, NexusPlan.parse(template), out, 10000, 15000)
    def msg(off: Long, tsMs: Long, tag: Double) = Seq(
      ("tp", "arr", off, tsMs * 1000000L, "a", "x", Seq(tag, 2.0)),
      ("tp", "arr", off, tsMs * 1000000L, "b", "x", Seq(tag + 100)))
    // batch 1: two pre-start messages — the later one becomes the buffer
    job.processBatch("da00",
      (msg(0, 9000, 1.0) ++ msg(1, 9500, 2.0))
        .toDF("topic", "source_name", "offset", "ts", "name", "axis_name", "data"))
    // batch 2: first in-window message → buffered message emitted with it
    job.processBatch("da00",
      msg(2, 10100, 3.0)
        .toDF("topic", "source_name", "offset", "ts", "name", "axis_name", "data"))
    job.finish()
    val d = spark.read.parquet(s"$out/data/entry/img/data").orderBy("row").collect()
    def arr(r: org.apache.spark.sql.Row, c: String): Seq[Double] =
      r.getSeq[Double](r.fieldIndex(c)).toSeq
    // buffered msg(1) first (offset order), then the in-window msg(2) —
    // BOTH with both variables (the old row-grain buffer kept one
    // variable row and null-filled the other)
    assert(d.length == 2)
    assert(arr(d(0), "a") == Seq(2.0, 2.0) && arr(d(0), "b") == Seq(102.0))
    assert(arr(d(1), "a") == Seq(3.0, 2.0) && arr(d(1), "b") == Seq(103.0))
  }

  test("f144: dedup across batches, buffered pre-start, strict finish") {
    val out = Files.createTempDirectory("graft-stream").toString
    val job = newJob(out)
    // batch 1: two pre-start (later one buffered), one in-window
    job.processBatch("f144", Seq(
      f144(0, 9000, 1.0), f144(1, 9500, 2.0), f144(2, 10100, 10.0)
    ).toDF())
    // batch 2: head repeats batch-1 tail ts → dropped; new value written
    job.processBatch("f144", Seq(
      f144(3, 10100, 99.0), f144(4, 10200, 15.0)
    ).toDF())
    // batch 3: beyond stop finishes the stream; stragglers dropped
    job.processBatch("f144", Seq(
      f144(5, 16000, 77.0), f144(6, 12000, 88.0)
    ).toDF())
    // batch 4: stream finished — ignored entirely
    job.processBatch("f144", Seq(f144(7, 12500, 66.0)).toDF())
    job.finish()

    val d = spark.read.parquet(s"$out/data/entry/speed/data").orderBy("row")
    assert(d.select("value").collect().map(_.getDouble(0)).toSeq ==
      Seq(2.0, 10.0, 15.0))
    assert(d.select("row").collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("paused job blocks batch processing until resume (pause/resume parity)") {
    val out = Files.createTempDirectory("graft-stream").toString
    val job = newJob(out)
    job.pause()
    val df = Seq(f144(0, 10100, 10.0)).toDF()
    val t  = new Thread(() => job.processBatch("f144", df))
    t.start()
    // the worker parks in the pause wait-loop; nothing is written
    val deadline = System.currentTimeMillis() + 10000
    while (t.getState != Thread.State.TIMED_WAITING &&
      System.currentTimeMillis() < deadline) Thread.sleep(10)
    assert(t.getState == Thread.State.TIMED_WAITING)
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/data/entry/speed/data")))
    job.resume()
    t.join(30000)
    assert(!t.isAlive)
    val d = spark.read.parquet(s"$out/data/entry/speed/data").collect()
    assert(d.map(_.getAs[Double]("value")).toSeq == Seq(10.0))
  }

  test("A4: approx file size grows with appends and lands in x5f2 status") {
    val out = Files.createTempDirectory("graft-stream").toString
    val job = newJob(out)
    val before = job.approxFileSizeBytes
    assert(before > 0) // manifest.json exists after create
    job.processBatch("f144", Seq(f144(0, 10100, 10.0), f144(1, 10200, 15.0)).toDF())
    assert(job.approxFileSizeBytes > before)
  }

  test("buffered value flushes at job end when no in-window data arrives") {
    val out = Files.createTempDirectory("graft-stream").toString
    val job = newJob(out)
    job.processBatch("f144", Seq(f144(0, 9000, 3.0)).toDF())
    job.processBatch("f144", Seq(f144(1, 9200, 4.0)).toDF())
    job.finish()
    val d = spark.read.parquet(s"$out/data/entry/speed/data")
    assert(d.select("value").collect().map(_.getDouble(0)).toSeq == Seq(4.0))
  }

  test("ev44 cue chain is stable across micro-batches (greedy, not grid)") {
    val cueTemplate =
      """{ "children": [
        |  { "name": "events", "type": "group", "children": [
        |    { "module": "ev44",
        |      "config": { "source": "det", "topic": "tp", "cue_interval": 5 } } ] }
        |] }""".stripMargin
    val out = Files.createTempDirectory("graft-stream").toString
    val job = new StreamingJob(spark, NexusPlan.parse(cueTemplate), out, 10000, 15000)
    // two batches of two 4-event messages: greedy cues at event indexes
    // 7 then 15 (a per-batch grid would emit 7 and 11)
    job.processBatch("ev44", Seq(
      ev44(0, 10100, (1 to 4).toSeq), ev44(1, 10200, (1 to 4).toSeq)).toDF())
    job.processBatch("ev44", Seq(
      ev44(2, 10300, (1 to 4).toSeq), ev44(3, 10400, (1 to 4).toSeq)).toDF())
    job.finish()
    val cue = spark.read.parquet(s"$out/data/events/cue").orderBy("row").collect()
    assert(cue.map(_.getAs[Long]("cue_index")).toSeq == Seq(7L, 15L))
  }

  test("cue-chain anchor survives a restart (lastCue in the checkpoint)") {
    val cueTemplate =
      """{ "children": [
        |  { "name": "events", "type": "group", "children": [
        |    { "module": "ev44",
        |      "config": { "source": "det", "topic": "tp", "cue_interval": 5 } } ] }
        |] }""".stripMargin
    val out  = Files.createTempDirectory("graft-stream").toString
    val job1 = new StreamingJob(spark, NexusPlan.parse(cueTemplate), out, 10000, 15000)
    job1.processBatch("ev44", Seq(
      ev44(0, 10100, (1 to 4).toSeq), ev44(1, 10200, (1 to 4).toSeq)).toDF())
    // crash + restart over the same output dir: the anchor (7) must load
    val job2 = new StreamingJob(spark, NexusPlan.parse(cueTemplate), out, 10000, 15000)
    job2.processBatch("ev44", Seq(
      ev44(2, 10300, (1 to 4).toSeq), ev44(3, 10400, (1 to 4).toSeq)).toDF())
    job2.finish()
    val cue = spark.read.parquet(s"$out/data/events/cue").orderBy("row").collect()
    assert(cue.map(_.getAs[Long]("cue_index")).toSeq == Seq(7L, 15L))
  }

  test("ev44: event_index continues across micro-batches") {
    val out = Files.createTempDirectory("graft-stream").toString
    val job = newJob(out)
    job.processBatch("ev44", Seq(
      ev44(0, 10200, Seq(10, 20, 30, 40)), ev44(1, 10210, Seq(50, 60, 70, 80))
    ).toDF())
    job.processBatch("ev44", Seq(
      ev44(2, 10220, Seq(90, 100)), ev44(3, 10230, Seq(110))
    ).toDF())
    job.finish()
    val idx = spark.read.parquet(s"$out/data/entry/events/index").orderBy("row")
    assert(idx.select("event_index").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 4L, 8L, 10L))
    val ev = spark.read.parquet(s"$out/data/entry/events/events").orderBy("row")
    assert(ev.count() == 11)
  }

  test("restart resumes cursors: row numbering, dedup boundary, ev44 index") {
    val out  = Files.createTempDirectory("graft-stream").toString
    val job1 = newJob(out)
    job1.processBatch("f144", Seq(f144(0, 10100, 10.0)).toDF())
    job1.processBatch("ev44", Seq(ev44(0, 10200, Seq(10, 20, 30))).toDF())
    // simulate a crash: new job instance over the same output dir
    val job2 = newJob(out)
    job2.processBatch("f144", Seq(
      f144(1, 10100, 99.0), // repeats pre-restart tail ts → deduped
      f144(2, 10300, 20.0)
    ).toDF())
    job2.processBatch("ev44", Seq(ev44(1, 10210, Seq(40, 50))).toDF())
    job2.finish()
    val d = spark.read.parquet(s"$out/data/entry/speed/data").orderBy("row")
    assert(d.select("value").collect().map(_.getDouble(0)).toSeq == Seq(10.0, 20.0))
    assert(d.select("row").collect().map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val idx = spark.read.parquet(s"$out/data/entry/events/index").orderBy("row")
    assert(idx.select("event_index").collect().map(_.getLong(0)).toSeq == Seq(0L, 3L))
  }

  test("replayed batch ids are skipped (effectively-once)") {
    val out = Files.createTempDirectory("graft-stream").toString
    val job = newJob(out)
    job.processBatch("f144", Seq(f144(0, 10100, 10.0)).toDF(), batchId = 0)
    // replay of batch 0 (e.g. after a foreachBatch retry) must be a no-op
    job.processBatch("f144", Seq(f144(0, 10100, 10.0)).toDF(), batchId = 0)
    job.processBatch("f144", Seq(f144(1, 10200, 20.0)).toDF(), batchId = 1)
    job.finish()
    val d = spark.read.parquet(s"$out/data/entry/speed/data").orderBy("row")
    assert(d.select("value").collect().map(_.getDouble(0)).toSeq == Seq(10.0, 20.0))
  }

  test("dedup form auto-flips to slim on the previous trigger's byte estimate") {
    // the decision function: auto flips strictly past the threshold;
    // explicit forms override regardless of the estimate
    assert(!StreamingJob.slimDedup("auto", -1L, 100))  // no history → funnel
    assert(!StreamingJob.slimDedup("auto", 100L, 100)) // at threshold → funnel
    assert(StreamingJob.slimDedup("auto", 101L, 100))  // past it → slim
    assert(StreamingJob.slimDedup("slim", -1L, 100))
    assert(!StreamingJob.slimDedup("window", Long.MaxValue, 100))

    // end-to-end with the threshold floored: trigger 1 has no history
    // (funnel), trigger 2 sees trigger 1's element total and flips —
    // with kept-row semantics identical (the repeat message still drops
    // WHOLE under the slim form)
    val template =
      """{ "children": [
        |  { "name": "entry", "type": "group", "children": [
        |    { "name": "img", "type": "group", "children": [
        |      { "module": "da00",
        |        "config": { "source": "arr", "topic": "tp",
        |                    "variables": [
        |                      {"name": "a", "data_type": "float64"},
        |                      {"name": "b", "data_type": "float64"} ] } } ] }
        |  ] } ] }""".stripMargin
    val out = Files.createTempDirectory("graft-dedupauto").toString
    val job = new StreamingJob(spark, NexusPlan.parse(template), out, 0, 1L << 40)
    def msg(off: Long, tsMs: Long, tag: Double) = Seq(
      ("tp", "arr", off, tsMs * 1000000L, "a", "x", Seq(tag, 2.0)),
      ("tp", "arr", off, tsMs * 1000000L, "b", "x", Seq(tag + 100)))
    spark.conf.set("spark.graft.stream.dedup.slimBytes", "0")
    try {
      job.processBatch("da00", msg(0, 1000, 1.0)
        .toDF("topic", "source_name", "offset", "ts", "name", "axis_name", "data"))
      assert(job.counter("entry/img", "dedup_slim") == 0L, "first trigger: funnel")
      job.processBatch("da00", (msg(1, 2000, 2.0) ++ msg(2, 2000, 9.9))
        .toDF("topic", "source_name", "offset", "ts", "name", "axis_name", "data"))
      assert(job.counter("entry/img", "dedup_slim") == 1L, "second trigger: slim")
      job.finish()
    } finally spark.conf.unset("spark.graft.stream.dedup.slimBytes")
    val d = spark.read.parquet(s"$out/data/entry/img/data").orderBy("row").collect()
    def arr(r: org.apache.spark.sql.Row, c: String): Seq[Double] =
      r.getSeq[Double](r.fieldIndex(c)).toSeq
    // msg2 (repeated ts) dropped whole under slim; msg0/msg1 keep both vars
    assert(d.length == 2)
    assert(arr(d(0), "a") == Seq(1.0, 2.0) && arr(d(0), "b") == Seq(101.0))
    assert(arr(d(1), "a") == Seq(2.0, 2.0) && arr(d(1), "b") == Seq(102.0))
  }

  test("fused payload: a tiny steady-state trigger runs ONE Spark job total") {
    // production f144 shape (slow EPICS source, a few messages per 10 s
    // trigger): after the first trigger arms the gate, the payload rides
    // the fused aggregate and the data AND cue appends are driver-side —
    // the whole trigger is exactly one Spark job (the fused aggregate
    // itself; the cue's Filter+Project over the local frame folds via
    // ConvertToLocalRelation)
    val cueTemplate =
      """{ "children": [
        |  { "name": "entry", "type": "group", "children": [
        |    { "name": "speed", "type": "group", "children": [
        |      { "module": "f144",
        |        "config": { "source": "speed", "topic": "tp",
        |                    "cue_interval": 2,
        |                    "enable_epics_con_info": false,
        |                    "enable_alarm_info": false } } ] } ] } ] }""".stripMargin
    val out = Files.createTempDirectory("graft-fused").toString
    val job = new StreamingJob(spark, NexusPlan.parse(cueTemplate), out, 0, 1L << 40)
    def msgs(from: Long, n: Int) = (from until from + n).map(o =>
      f144(o, 1000 + o, o.toDouble)).toDF()
    job.processBatch("f144", msgs(0, 2)) // arms the gate (no history yet)
    var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      job.processBatch("f144", msgs(2, 3))
      // listener delivery is async: wait until the count is stable
      var prev = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        if (jobs == prev) stable += 1 else { prev = jobs; stable = 0 }
      }
      assert(jobs == 1, s"steady-state tiny trigger should be 1 job, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(l)
    // the band decision is observable: trigger 2's data+cue appends were
    // served from the fused LocalRelation payload (x5f2 appends_fused)
    assert(job.counter("entry/speed", "appends_fused") == 2L,
      "fused trigger must count its data and cue appends as fused")
    // the arming trigger (no fused payload yet, but tiny) was served by
    // the bounded driver collect — also visible
    assert(job.counter("entry/speed", "appends_collect") >= 1L,
      "the arming trigger's appends ran via the bounded collect")
    job.finish()
    val d = spark.read.parquet(s"$out/data/entry/speed/data").orderBy("row")
    assert(d.select("value").collect().map(_.getDouble(0)).toSeq ==
      (0 until 5).map(_.toDouble))
    assert(job.counter("entry/speed", "data") == 5L)
    // the cue grid fired inside the job-free trigger too (gw 2 and 4)
    val cues = spark.read.parquet(s"$out/data/entry/speed/cue").orderBy("row")
    assert(cues.select("cue_index").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 3L))

    // parity: the same stream with the fusion off is byte-identical
    val out2 = Files.createTempDirectory("graft-fusedoff").toString
    spark.conf.set("spark.graft.stream.fusedPayload", "off")
    try {
      val job2 = new StreamingJob(spark, NexusPlan.parse(cueTemplate), out2, 0, 1L << 40)
      job2.processBatch("f144", msgs(0, 2))
      job2.processBatch("f144", msgs(2, 3))
      job2.finish()
    } finally spark.conf.unset("spark.graft.stream.fusedPayload")
    val a = spark.read.parquet(s"$out/data/entry/speed/data").orderBy("row").collect()
    val b = spark.read.parquet(s"$out2/data/entry/speed/data").orderBy("row").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("fused payload survives a burst after an idle trigger (overflow → distributed path)") {
    val out = Files.createTempDirectory("graft-fusedburst").toString
    val job = new StreamingJob(spark, NexusPlan.parse(template), out, 0, 1L << 40)
    def msgs(from: Long, n: Int) = (from until from + n).map(o =>
      f144(o, 1000 + o, o.toDouble)).toDF()
    spark.conf.set("spark.graft.stream.localAppend.maxRows", "4")
    try {
      job.processBatch("f144", msgs(0, 2))   // tiny → arms the gate
      job.processBatch("f144", msgs(2, 100)) // burst: 100 > 4×4 → overflow
      assert(job.counter("entry/speed", "appends_spark") >= 1L,
        "the 100-row burst (> 4x4 overflow) must count as a distributed append")
      val collectBefore = job.counter("entry/speed", "appends_collect")
      job.processBatch("f144", msgs(102, 2)) // gate off (last was 100) → frame path
      assert(job.counter("entry/speed", "appends_collect") > collectBefore,
        "the gate-off tiny trigger is served by the bounded collect")
    } finally spark.conf.unset("spark.graft.stream.localAppend.maxRows")
    job.finish()
    val d = spark.read.parquet(s"$out/data/entry/speed/data").orderBy("row")
    assert(d.count() == 104)
    assert(d.select("row").collect().map(_.getLong(0)).toSeq == (0L until 104L))
  }

  test("x5f2 counters ride the push-metrics reporter with live values") {
    import graft.commands.MetricsReporter._
    val out = Files.createTempDirectory("graft-stream").toString
    val job = newJob(out)
    job.processBatch("f144", Seq(f144(0, 10100, 10.0)).toDF())
    job.processBatch("ev44", Seq(ev44(0, 10100, Seq(1, 2, 3))).toDF())

    val lines  = collection.mutable.ArrayBuffer.empty[String]
    val carbon = new Reporter(new CarbonSink(lines += _), periodMs = 10000)
    registerJob(job, new Registrar(
      appPrefix("kafka-to-nexus", "host.example.org"), Seq(carbon)))
    assert(carbon.tick(0L))
    val byName = lines.map(_.split(' ')).map(p => p(0) -> p(1).toLong).toMap
    // per-stream counters under app.host.<tree path>.counter, pulled live
    assert(byName("kafka-to-nexus.host_example_org.entry.speed.events_written") == 0L)
    assert(byName("kafka-to-nexus.host_example_org.entry.events.events_written") == 3L)
    assert(byName.keys.exists(_.endsWith(".write_errors")))
    // the append-path band decision rides the same surface (fused /
    // bounded-collect / distributed — at production the 1-job-vs-5-jobs
    // difference per trigger)
    Seq("appends_fused", "appends_collect", "appends_spark").foreach { c =>
      assert(byName.contains(s"kafka-to-nexus.host_example_org.entry.speed.$c"),
        s"$c missing from the push-metrics surface")
    }
    assert(byName("kafka-to-nexus.host_example_org.entry.speed.appends_collect") >= 1L)

    // values are pulled at report time: a later batch moves the counter
    job.processBatch("ev44", Seq(ev44(1, 10200, Seq(4, 5))).toDF())
    lines.clear()
    assert(carbon.tick(10000L))
    val after = lines.map(_.split(' ')).map(p => p(0) -> p(1).toLong).toMap
    assert(after("kafka-to-nexus.host_example_org.entry.events.events_written") == 5L)
  }

  test("a replacement job's counters take over once the old names are removed") {
    import graft.commands.MetricsReporter._
    val jobA = newJob(Files.createTempDirectory("graft-stream").toString)
    val jobB = newJob(Files.createTempDirectory("graft-stream").toString)
    jobA.processBatch("ev44", Seq(ev44(0, 10100, Seq(1, 2, 3))).toDF())
    jobB.processBatch("ev44", Seq(ev44(0, 10100, Seq(4, 5))).toDF())

    val lines  = collection.mutable.ArrayBuffer.empty[String]
    val carbon = new Reporter(new CarbonSink(lines += _), periodMs = 10000,
      clock = () => 0L)
    val registrar = new Registrar("app", Seq(carbon))
    val namesA = registerJob(jobA, registrar)
    // same stream paths: without deregistration the suppliers would stay
    // bound to job A forever (addMetric rejects the duplicate names)
    namesA.foreach(registrar.removeMetric)
    registerJob(jobB, registrar)
    assert(carbon.tick(0L))
    val byName = lines.map(_.split(' ')).map(p => p(0) -> p(1).toLong).toMap
    assert(byName("app.entry.events.events_written") == 2L) // job B's count
  }

  test("streaming finish can emit the native .h5 artifact") {
    val out = Files.createTempDirectory("graft-stream").toString
    val job = newJob(out)
    job.processBatch("f144", Seq(
      f144(0, 10100, 10.0), f144(1, 10110, 15.0)).toDF())
    job.finish(emitHdf5 = Some(s"$out/run.h5"))
    val root = graft.sinks.MiniHdf5Reader.read(s"$out/run.h5")
    val speed = root.groups("entry").groups("speed")
    assert(speed.groups("value").datasets("").asInstanceOf[Array[Double]].toSeq ==
      Seq(10.0, 15.0))
  }

  test("large appends split into range-partitioned files, order reconstructible") {
    val out  = Files.createTempDirectory("graft-sink").toString
    val sink = new graft.sinks.NexusSink(out)
    sink.create(graft.plans.NexusPlan.parse("""{ "children": [] }"""))
    val df = spark.range(0, 10000).toDF("row")
      .withColumn("v", org.apache.spark.sql.functions.col("row") * 2)
    sink.append("p", "data", df, rows = 10000, rowsPerFile = 2500)
    val files = new java.io.File(s"$out/data/p/data")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 3, s"expected multiple part files, got $files")
    val back = spark.read.parquet(s"$out/data/p/data").orderBy("row")
      .select("v").collect().map(_.getLong(0))
    assert(back.toSeq == (0L until 10000L).map(_ * 2))
  }

  test("end-to-end through a real MemoryStream query") {
    val out    = Files.createTempDirectory("graft-stream").toString
    val job    = newJob(out)
    val stream = MemoryStream[F144Msg](spark)
    val query = job match {
      case j =>
        stream.toDF().writeStream
          .outputMode("append")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            j.processBatch("f144", batch)
          }
          .start()
    }
    stream.addData(f144(0, 10100, 10.0), f144(1, 10110, 15.0))
    query.processAllAvailable()
    stream.addData(f144(2, 10120, 20.0))
    query.processAllAvailable()
    query.stop()
    job.finish()
    val d = spark.read.parquet(s"$out/data/entry/speed/data").orderBy("row")
    assert(d.select("value").collect().map(_.getDouble(0)).toSeq ==
      Seq(10.0, 15.0, 20.0))
  }

  test("restart through Spark's OWN streaming checkpoint equals the uninterrupted run") {
    // The real restart choreography the reference's integration suite
    // exercises (integration-tests/test_filewriter.py): kill the query
    // (no finish), construct a NEW job over the same output, re-attach —
    // Spark resumes from outDir/.checkpoints, batch ids stay continuous,
    // the replayed last batch hits the replay-skip mark, and the sink
    // matches a run that was never interrupted. A file-stream source
    // (unlike MemoryStream) genuinely recovers from the checkpoint.
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("topic", StringType), StructField("source_name", StringType),
      StructField("offset", LongType), StructField("kafka_ts_ms", LongType),
      StructField("ts", LongType), StructField("value", DoubleType)))
    def line(off: Long, tsMs: Long, v: Double) =
      s"""{"topic":"tp","source_name":"speed","offset":$off,""" +
        s""""kafka_ts_ms":$tsMs,"ts":${tsMs * 1000000L},"value":$v}"""
    def drive(out: String, src: String, interrupted: Boolean): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
      def wave(n: Int, lines: String*): Unit =
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(src, s"wave$n.json"), lines.mkString("\n"))
      def attach(job: StreamingJob) = StreamingJob.attach(job, "f144",
        spark.readStream.schema(schema).json(src), triggerMs = 100)
      wave(1, line(0, 10100, 1.0), line(1, 10200, 2.0))
      val job1 = newJob(out)
      val q1 = attach(job1)
      try q1.processAllAvailable() finally q1.stop()
      if (interrupted) {
        // crash: job1 abandoned (no finish); fresh instance, same outDir
        wave(2, line(2, 10200, 9.9), line(3, 12000, 3.0)) // head repeats ts
        val job2 = newJob(out)
        val q2 = attach(job2)
        try q2.processAllAvailable() finally q2.stop()
        job2.finish()
      } else {
        wave(2, line(2, 10200, 9.9), line(3, 12000, 3.0))
        val q1b = attach(job1)
        try q1b.processAllAvailable() finally q1b.stop()
        job1.finish()
      }
    }
    val outA = Files.createTempDirectory("graft-ckptrestart-a").toString
    val outB = Files.createTempDirectory("graft-ckptrestart-b").toString
    drive(outA, Files.createTempDirectory("graft-src-a").toString, interrupted = true)
    drive(outB, Files.createTempDirectory("graft-src-b").toString, interrupted = false)
    val a = spark.read.parquet(s"$outA/data/entry/speed/data").orderBy("row").collect()
    val b = spark.read.parquet(s"$outB/data/entry/speed/data").orderBy("row").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "restarted sink must equal the uninterrupted sink")
    // the cross-restart dedup boundary held: offset 2 repeated the
    // pre-restart tail ts and was dropped; rows are 1.0, 2.0, 3.0
    assert(a.map(_.getAs[Double]("value")).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("concurrent jobs restore the session confs they flip per batch") {
    // processBatch temporarily disables AQE / narrows shuffle width for
    // its window; with TWO jobs on one session the set/restore pairs must
    // serialize on a global lock — per-job monitors would let job B read
    // job A's "false" as its prior and restore it, leaving AQE off for
    // the session. Stress the interleave and assert the conf comes back.
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val jobs = Seq(
      newJob(Files.createTempDirectory("sjob-conf-a").toString),
      newJob(Files.createTempDirectory("sjob-conf-b").toString))
    val threads = jobs.zipWithIndex.map { case (j, i) =>
      new Thread(() => (0 until 5).foreach { b =>
        j.processBatch("f144",
          Seq(f144(b * 2 + i, 10010 + b, b.toDouble)).toDF())
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(spark.conf.get("spark.sql.adaptive.enabled") == priorAqe)
    jobs.foreach(_.finish())
  }
}
