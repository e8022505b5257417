package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.plans.NexusPlan

/** Crash/restart property matrix — the reference's integration suite
  * exercises writer kill/rejoin with real choreography
  * (`integration-tests/test_filewriter.py:197-262`); this is the same
  * contract checked exhaustively against the parquet mirror: kill the job
  * at EVERY commit boundary (after each batch's cursor save), inside the
  * at-least-once windows (appends committed, cursors not yet saved), and
  * at every phase boundary of finish(), then restart over the same output
  * directory, redeliver EVERY batch (foreachBatch replays exactly like
  * this after a crash), finish, and compare against the uninterrupted run.
  *
  * Contract per window (SURVEY §2.9 exactly-once row):
  *   - clean boundaries (state.bin saved): the sink is EXACTLY equal —
  *     same tables, same rows, same multiplicities, same counters, same
  *     closing metadata;
  *   - dirty windows (append committed, save lost): replay re-appends
  *     byte-identical rows at the SAME row ids — the sink may hold literal
  *     duplicates but never diverges: distinct-rows equal, baseline rows a
  *     subset, counters and close-time finals still exact (finals dedup by
  *     row id before aggregating).
  *
  * Three schemas ride the matrix: f144 over two sources (one flushes its
  * pre-start buffer mid-run, one holds it to finish — the finish-flush
  * replay hazard), ev44 (cumulative event-index cursor), da00 (multi-row
  * messages: buffer/dedup must stay message-atomic across a restart).
  */
class RestartMatrixSpec extends SparkSpec {
  import spark.implicits._

  private val template =
    """{ "children": [
      |  { "name": "entry", "type": "group", "children": [
      |    { "name": "speed", "type": "group", "children": [
      |      { "module": "f144",
      |        "config": { "source": "speed", "topic": "tp",
      |                    "enable_epics_con_info": false,
      |                    "enable_alarm_info": false } } ] },
      |    { "name": "temp", "type": "group", "children": [
      |      { "module": "f144",
      |        "config": { "source": "temp", "topic": "tp",
      |                    "enable_epics_con_info": false,
      |                    "enable_alarm_info": false } } ] },
      |    { "name": "events", "type": "group", "children": [
      |      { "module": "ev44", "config": { "source": "det", "topic": "tp" } } ] },
      |    { "name": "img", "type": "group", "children": [
      |      { "module": "da00",
      |        "config": { "source": "arr", "topic": "tp",
      |                    "variables": [
      |                      {"name": "a", "data_type": "float64"},
      |                      {"name": "b", "data_type": "float64"} ] } } ] }
      |  ] } ] }""".stripMargin

  private def newJob(out: String) =
    new StreamingJob(spark, NexusPlan.parse(template), out, 10000, 15000)

  private def f144(src: String, offset: Long, tsMs: Long, v: Double) =
    graft.sources.Fixtures.F144Msg("tp", src, offset, tsMs, tsMs * 1000000L, v)
  private def ev44(offset: Long, tsMs: Long, tof: Seq[Int]) =
    graft.sources.Fixtures.Ev44Msg("tp", "det", offset, tsMs, tsMs * 1000000L,
      Seq(tsMs * 1000000L), Seq(0), tof, tof.map(_ + 1))
  private def da00(offset: Long, tsMs: Long, tag: Double) = Seq(
    ("tp", "arr", offset, tsMs * 1000000L, "a", "x", Seq(tag, 2.0)),
    ("tp", "arr", offset, tsMs * 1000000L, "b", "x", Seq(tag + 100)))
  private def da00Df(msgs: Seq[(String, String, Long, Long, String, String, Seq[Double])]) =
    msgs.toDF("topic", "source_name", "offset", "ts", "name", "axis_name", "data")

  private final class B(val schema: String, val id: Long, val df: DataFrame)
  private def B(schema: String, id: Long, df: DataFrame) = new B(schema, id, df)

  /** The redelivered stream: per-schema monotone batch ids, exercising
    * pre-start buffering (speed, temp, arr), in-batch + cross-batch
    * consecutive dedup (speed 10100 repeats), the ev44 event cursor, and
    * the strict-finish cutoff on a crossing batch.
    */
  private lazy val batches: Seq[B] = Seq(
    B("f144", 0, Seq(                       // all pre-start; temp's buffer
      f144("speed", 0, 9000, 0.1),          // survives to finish()
      f144("speed", 1, 9500, 0.2),
      f144("temp", 0, 9100, 50.0),
      f144("temp", 1, 9300, 51.0)).toDF()),
    B("ev44", 0, Seq(ev44(0, 10200, Seq(10, 20, 30))).toDF()),
    B("da00", 0, da00Df(da00(0, 9800, 1.0))), // pre-start buffer, 2 vars
    B("f144", 1, Seq(
      f144("speed", 2, 10100, 1.0),         // flushes speed's buffer
      f144("speed", 3, 10100, 1.5)).toDF()), // in-batch repeat → deduped
    B("da00", 1, da00Df(da00(1, 10400, 2.0))), // flushes arr's buffer
    B("ev44", 1, Seq(
      ev44(1, 10500, Seq(40, 50)),
      ev44(2, 10500, Seq(60))).toDF()),     // repeats kept (acceptRepeats)
    B("f144", 2, Seq(
      f144("speed", 4, 10100, 9.9),         // cross-batch repeat → deduped
      f144("speed", 5, 12000, 2.0)).toDF()),
    B("ev44", 2, Seq(ev44(3, 16000, Seq(70))).toDF()), // beyond stop
    B("f144", 3, Seq(
      f144("speed", 6, 14000, 3.0),
      f144("speed", 7, 16000, 99.0)).toDF()), // crossing batch → cutoff
    B("da00", 2, da00Df(da00(2, 16000, 3.0))) // beyond stop → finished
  )

  // ---- sink snapshot & comparison --------------------------------------

  private def tableDirs(out: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val root = Paths.get(out, "data")
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => root.relativize(p.getParent).toString)
      .toSet.toSeq.sorted
    finally s.close()
  }

  private def snapshot(out: String): Map[String, Seq[String]] =
    tableDirs(out).map { t =>
      t -> spark.read.parquet(s"$out/data/$t")
        .collect().map(_.toString).toSeq.sorted
    }.toMap

  private def closing(out: String): String =
    Files.readString(Paths.get(out, "closing.json"))

  private def tmp(): String =
    Files.createTempDirectory("graft-restart").toString

  private lazy val baseline: (Map[String, Seq[String]],
      Map[String, Map[String, Long]], String) = {
    val out = tmp()
    val job = newJob(out)
    batches.foreach(b => job.processBatch(b.schema, b.df, b.id))
    job.finish()
    val snap = snapshot(out)
    // timeline sanity: the semantics under test actually fired
    def vals(t: String) = spark.read.parquet(s"$out/data/$t").orderBy("row")
    assert(vals(s"entry/speed/data").select("value").collect()
      .map(_.getDouble(0)).toSeq == Seq(0.2, 1.0, 2.0, 3.0),
      "speed: buffered 0.2 + three deduped in-window values")
    assert(vals(s"entry/temp/data").select("value").collect()
      .map(_.getDouble(0)).toSeq == Seq(51.0),
      "temp: buffer held to finish() then flushed")
    assert(spark.read.parquet(s"$out/data/entry/events/events").count() == 6,
      "ev44: 6 in-window events, beyond-stop batch dropped")
    assert(spark.read.parquet(s"$out/data/entry/img/data").count() == 2,
      "da00: buffered message + in-window message, both variables pivoted")
    (snap, job.metrics, closing(out))
  }

  private def assertExact(out: String, job: StreamingJob, where: String): Unit = {
    val (snapB, metricsB, closingB) = baseline
    val snap = snapshot(out)
    assert(snap.keySet == snapB.keySet, s"$where: table set differs")
    snap.foreach { case (t, rows) =>
      assert(rows == snapB(t), s"$where: $t rows differ")
    }
    assert(job.metrics == metricsB, s"$where: counters differ")
    assert(closing(out) == closingB, s"$where: closing metadata differs")
  }

  /** Dirty-window contract: replay may duplicate, never diverge. */
  private def assertConvergent(out: String, job: StreamingJob, where: String): Unit = {
    val (snapB, metricsB, closingB) = baseline
    val snap = snapshot(out)
    assert(snap.keySet == snapB.keySet, s"$where: table set differs")
    snap.foreach { case (t, rows) =>
      assert(rows.distinct.sorted == snapB(t).distinct.sorted,
        s"$where: $t distinct rows differ")
      val mult = rows.groupBy(identity).map { case (r, g) => r -> g.size }
      snapB(t).groupBy(identity).foreach { case (r, g) =>
        assert(mult.getOrElse(r, 0) >= g.size,
          s"$where: $t lost a baseline row: $r")
      }
    }
    assert(job.metrics == metricsB, s"$where: counters differ")
    assert(closing(out) == closingB, s"$where: closing metadata differs")
  }

  private final class Crash(point: String) extends RuntimeException(point)

  private def armed(job: StreamingJob, point: String): Unit =
    job.crashHook = p => if (p == point) throw new Crash(p)

  // ---- the matrix -------------------------------------------------------

  test("kill at every batch boundary: full redelivery reproduces the sink exactly") {
    for (k <- 0 to batches.size) {
      val out = tmp()
      val j1 = newJob(out)
      batches.take(k).foreach(b => j1.processBatch(b.schema, b.df, b.id))
      // crash: j1 abandoned without finish; j2 restarts over the same dir
      val j2 = newJob(out)
      batches.foreach(b => j2.processBatch(b.schema, b.df, b.id))
      j2.finish()
      assertExact(out, j2, s"boundary k=$k")
    }
  }

  test("kill inside the append-committed/cursor-unsaved window: replay duplicates identically, never diverges") {
    // the state-transition batches: pre-start buffer accept (0), buffer
    // flush + in-batch dedup (3), ev44 cursor advance (5), the crossing
    // cutoff batch (8), da00 strict finish (9)
    for (k <- Seq(0, 3, 5, 8, 9)) {
      val out = tmp()
      val j1 = newJob(out)
      batches.take(k).foreach(b => j1.processBatch(b.schema, b.df, b.id))
      armed(j1, "batch:appended")
      intercept[Crash] {
        j1.processBatch(batches(k).schema, batches(k).df, batches(k).id)
      }
      val j2 = newJob(out)
      batches.foreach(b => j2.processBatch(b.schema, b.df, b.id))
      j2.finish()
      assertConvergent(out, j2, s"mid-batch k=$k")
    }
  }

  test("kill between two streams of one schema mid-batch: torn batch converges") {
    // batch 0 carries BOTH f144 sources; crash after speed's appends but
    // before temp's — replay re-processes both: speed's rows duplicate
    // byte-identically, temp's arrive fresh, nothing diverges
    val out = tmp()
    val j1 = newJob(out)
    armed(j1, "batch:stream:entry/speed")
    intercept[Crash] {
      j1.processBatch(batches(0).schema, batches(0).df, batches(0).id)
    }
    val j2 = newJob(out)
    batches.foreach(b => j2.processBatch(b.schema, b.df, b.id))
    j2.finish()
    assertConvergent(out, j2, "mid-batch torn streams")
  }

  test("kill at each finish() phase boundary: a replayed finish converges") {
    // flushed-unsaved is the one remaining at-least-once window in finish
    // (temp's buffer was appended, the cursor save was lost); the other
    // three are post-checkpoint and must be exact
    val points = Seq(
      "finish:flushed-unsaved" -> false,
      "finish:flushed"         -> true,
      "finish:seeded"          -> true,
      "finish:closed"          -> true)
    points.foreach { case (point, exact) =>
      val out = tmp()
      val j1 = newJob(out)
      batches.foreach(b => j1.processBatch(b.schema, b.df, b.id))
      armed(j1, point)
      intercept[Crash] { j1.finish() }
      val j2 = newJob(out)
      j2.finish()
      if (exact) assertExact(out, j2, point)
      else assertConvergent(out, j2, point)
    }
  }

  test("HDF5 export after a dirty-window replay matches the clean run's " +
    "export — duplicated mirror rows never reach the .h5") {
    // the parquet mirror legitimately holds replay duplicates after a
    // crash in the append-committed/cursor-unsaved window; finish()
    // dedups them for the meta aggregates, and the EXPORT must apply the
    // same row-id dedup or the .h5 arrays and num_values/events disagree
    def exported(out: String): graft.sinks.MiniHdf5Reader.Obj = {
      val h5 = s"$out/restart.h5"
      graft.sinks.Hdf5Export.export(spark, out, h5)
      graft.sinks.MiniHdf5Reader.read(h5)
    }
    def speedArrays(root: graft.sinks.MiniHdf5Reader.Obj) = {
      val g = root.groups("entry").groups("speed")
      (g.groups("value").datasets("").asInstanceOf[Array[Double]].toSeq,
        g.groups("time").datasets("").asInstanceOf[Array[Long]].toSeq,
        root.groups("entry").groups("events")
          .groups("events_event_time_offset").datasets("")
          .asInstanceOf[Array[Int]].length)
    }
    // clean reference export
    val cleanOut = tmp()
    val jc = newJob(cleanOut)
    batches.foreach(b => jc.processBatch(b.schema, b.df, b.id))
    jc.finish()
    val clean = speedArrays(exported(cleanOut))
    assert(clean._1 == Seq(0.2, 1.0, 2.0, 3.0), "clean export sanity")
    // dirty run: crash mid-append on the dedup batch, replay everything
    val out = tmp()
    val j1 = newJob(out)
    batches.take(3).foreach(b => j1.processBatch(b.schema, b.df, b.id))
    armed(j1, "batch:appended")
    intercept[Crash] {
      j1.processBatch(batches(3).schema, batches(3).df, batches(3).id)
    }
    val j2 = newJob(out)
    batches.foreach(b => j2.processBatch(b.schema, b.df, b.id))
    j2.finish()
    // the mirror really does carry duplicates (the scenario is live) ...
    val mirror = spark.read.parquet(s"$out/data/entry/speed/data")
    assert(mirror.count() > mirror.dropDuplicates("row").count(),
      "scenario must produce replay duplicates in the mirror")
    // ... but the exported datasets are identical to the clean run's
    assert(speedArrays(exported(out)) == clean,
      "exported .h5 must dedup replayed rows like the meta aggregates")
  }

  test("a second finish() after a completed run is a no-op on content") {
    val out = tmp()
    val j1 = newJob(out)
    batches.foreach(b => j1.processBatch(b.schema, b.df, b.id))
    j1.finish()
    val j2 = newJob(out)
    j2.finish()
    assertExact(out, j2, "double finish")
  }
}
