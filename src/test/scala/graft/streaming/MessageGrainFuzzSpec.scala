package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.plans.NexusPlan
import graft.sources.Fixtures._

/** Message-grain property fuzz over ALL EIGHT data modules — F4's round-12
  * lesson systematized: every kernel decision (consecutive dedup, pre-start
  * buffering, window filter, strict finish) operates on MESSAGES, and an
  * adapter that renders one message as several rows (da00) or a module
  * that explodes one message into several output rows (ev44/se00/tdct)
  * must never let a decision split a message.
  *
  * Method: seeded random timelines of logical messages (offset, ts) with
  * consecutive repeats, pre-start stragglers, in-window data, and a
  * beyond-stop tail, split at random batch boundaries, are rendered
  * through each module's input shape and driven through a StreamingJob.
  * The surviving-message sequence read back from the sink is compared
  * against an INDEPENDENT message-grain re-implementation of the
  * SourceFilter semantics (`/root/reference/src/Stream/SourceFilter.cpp:74-120`)
  * written in plain Scala over the logical timeline — the same
  * oracle-vs-engine structure as the batch correctness gate.
  */
class MessageGrainFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val StartMs = 10000L
  private val StopMs  = 15000L

  private final case class M(offset: Long, tsMs: Long) {
    def tsNs: Long = tsMs * 1000000L
  }

  /** Independent message-grain reference of F2/F3/F4/F6 + the buffer:
    * returns the emitted messages in sink order (buffered flush rides
    * ahead of the in-window rows of its trigger; a leftover buffer
    * flushes at finish).
    */
  private def expectedSurvivors(
      batches: Seq[Seq[M]],
      acceptRepeats: Boolean,
      emitBuffered: Boolean
  ): Seq[M] = {
    var finished = false
    var lastTs: Option[Long] = None
    var buf: Option[M] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[M]
    for (batch <- batches if !finished && batch.nonEmpty) {
      // within-batch consecutive dedup: prev tracks EVERY message
      val kept = scala.collection.mutable.ArrayBuffer.empty[M]
      var prev: Option[Long] = None
      for (m <- batch.sortBy(_.offset)) {
        val dup = !acceptRepeats && prev.contains(m.tsMs)
        prev = Some(m.tsMs)
        if (!dup) kept += m
      }
      val cutoff = kept.find(_.tsMs > StopMs).map(_.offset)
      val live = cutoff match {
        case Some(c) => kept.filter(_.offset < c).toSeq
        case None    => kept.toSeq
      }
      // cross-batch boundary dup: the batch head repeats last batch's tail
      val boundary = !acceptRepeats && live.nonEmpty &&
        lastTs.contains(live.head.tsMs) && live.head.offset == kept.head.offset
      if (live.nonEmpty) lastTs = Some(live.last.tsMs)
      val postBoundary = if (boundary) live.tail else live
      // buffered candidate: max-(ts, offset) pre-start live message; the
      // boundary-dropped head is excluded; a newer-or-equal ts replaces
      val preStart = live.filter(_.tsMs < StartMs)
      if (preStart.nonEmpty) {
        val c = preStart.maxBy(m => (m.tsMs, m.offset))
        val isBoundaryRow = boundary && c.offset == live.head.offset
        if (!isBoundaryRow && buf.forall(_.tsMs <= c.tsMs)) buf = Some(c)
      }
      if (cutoff.isDefined) finished = true
      val inWin = postBoundary.filter(m => m.tsMs >= StartMs && m.tsMs <= StopMs)
      // the emit gate mirrors the engine: pre-boundary in-window count
      val nWin = live.count(m => m.tsMs >= StartMs && m.tsMs <= StopMs)
      if (emitBuffered && buf.nonEmpty && (nWin > 0 || finished)) {
        out += buf.get; buf = None
      }
      out ++= inWin
    }
    if (emitBuffered && buf.nonEmpty) out += buf.get // finish() flush
    out.toSeq
  }

  /** Seeded timeline: ts random-walks from below the window past stop,
    * with consecutive repeats mixed in; split into 3 batches.
    */
  private def timeline(seed: Int): Seq[Seq[M]] = {
    val rnd  = new scala.util.Random(seed)
    val msgs = scala.collection.mutable.ArrayBuffer.empty[M]
    var ts   = 8200L + rnd.nextInt(800)
    for (off <- 0L until 14L) {
      msgs += M(off, ts)
      ts += (if (rnd.nextDouble() < 0.3) 0L else 200L + rnd.nextInt(1200))
    }
    val c1 = 2 + rnd.nextInt(5)
    val c2 = c1 + 2 + rnd.nextInt(5)
    Seq(msgs.take(c1).toSeq, msgs.slice(c1, c2).toSeq, msgs.drop(c2).toSeq)
  }

  private def template(module: String, extra: String = ""): String =
    s"""{ "children": [
       |  { "name": "g", "type": "group", "children": [
       |    { "module": "$module",
       |      "config": { "source": "src", "topic": "tp"$extra } } ] }
       |] }""".stripMargin

  /** Per-module rendering of a logical message + the sink read-back of the
    * surviving-message identity sequence.
    */
  private final case class Harness(
      module: String,
      extra: String,
      frame: Seq[M] => DataFrame,
      readBack: String => Seq[Long] // out dir → per-message tsNs in row order
  )

  private def ts(out: String, table: String, timeCol: String): Seq[Long] =
    spark.read.parquet(s"$out/data/g/$table").orderBy("row")
      .select(timeCol).collect().map(_.getLong(0)).toSeq

  private lazy val harnesses: Seq[Harness] = Seq(
    Harness("f144", "",
      ms => ms.map(m => F144Msg("tp", "src", m.offset, m.tsMs, m.tsNs,
        m.offset + 0.5)).toDF(),
      out => ts(out, "data", "time")),
    Harness("ep01", "",
      ms => ms.map(m => Ep01Msg("tp", "src", m.offset, m.tsMs, m.tsNs,
        (m.offset % 5).toShort)).toDF(),
      out => ts(out, "data", "connection_status_time")),
    Harness("al00", "",
      ms => ms.map(m => Al00Msg("tp", "src", m.offset, m.tsMs, m.tsNs,
        (m.offset % 3).toShort, s"m${m.offset}")).toDF(),
      out => ts(out, "data", "alarm_time")),
    Harness("ad00", "",
      ms => ms.map(m => Ad00Msg("tp", "src", m.offset, m.tsMs, m.tsNs,
        Seq(2L), Seq(m.offset + 0.1, m.offset + 0.2))).toDF(),
      out => ts(out, "data", "time")),
    Harness("da00",
      """, "variables": [ {"name": "a", "data_type": "float64"},
        |                 {"name": "b", "data_type": "float64"} ]""".stripMargin,
      ms => ms.flatMap(m => Seq(
        Da00Msg("tp", "src", m.offset, m.tsMs, m.tsNs, "a", "x",
          Seq(m.offset + 0.1, 2.0)),
        Da00Msg("tp", "src", m.offset, m.tsMs, m.tsNs, "b", "x",
          Seq(m.offset + 0.5)))).toDF(),
      out => {
        // message atomicity INSIDE the pivot too: both variables present
        val rows = spark.read.parquet(s"$out/data/g/data").orderBy("row").collect()
        rows.foreach { r =>
          assert(!r.isNullAt(r.fieldIndex("a")) && !r.isNullAt(r.fieldIndex("b")),
            s"da00 message lost a variable: $r")
        }
        rows.map(_.getAs[Long]("time")).toSeq
      }),
    Harness("ev44", "",
      ms => ms.map(m => Ev44Msg("tp", "src", m.offset, m.tsMs, m.tsNs,
        Seq(m.tsNs), Seq(0),
        Seq((m.offset * 100 + 1).toInt, (m.offset * 100 + 2).toInt),
        Seq((m.offset * 10 + 1).toInt, (m.offset * 10 + 2).toInt))).toDF(),
      out => {
        // index: one row per message; events: 2 per message, whole or absent
        val idx = spark.read.parquet(s"$out/data/g/index").orderBy("row").collect()
        val ev = spark.read.parquet(s"$out/data/g/events").orderBy("row")
          .select("event_time_offset").collect().map(_.getInt(0)).toSeq
        val msgs = idx.map(_.getAs[Long]("event_time_zero")).toSeq
        assert(idx.map(_.getAs[Long]("event_index")).toSeq ==
          msgs.indices.map(_ * 2L), "ev44 cumulative index shift broke")
        val expEv = ev.grouped(2).toSeq
        assert(expEv.forall(g => g.size == 2 && g(1) == g(0) + 1),
          s"ev44 message split its events: $ev")
        msgs
      }),
    Harness("se00", "",
      ms => ms.map(m => Se00Msg("tp", "src", m.offset, m.tsMs, m.tsNs, 1.0,
        Some(Seq(m.tsNs, m.tsNs + 1)),
        Seq(m.offset + 0.1, m.offset + 0.2))).toDF(),
      out => {
        val times = ts(out, "data", "time")
        val pairs = times.grouped(2).toSeq
        assert(pairs.forall(g => g.size == 2 && g(1) == g(0) + 1),
          s"se00 message split its elements: $times")
        pairs.map(_.head)
      }),
    Harness("tdct", "",
      ms => ms.map(m => TdctMsg("tp", "src", m.offset, m.tsMs, m.tsNs,
        Seq(m.tsNs + 1, m.tsNs + 2))).toDF(),
      out => {
        val times = ts(out, "data", "time")
        val pairs = times.grouped(2).toSeq
        assert(pairs.forall(g => g.size == 2 && g(1) == g(0) + 1),
          s"tdct message split its elements: $times")
        pairs.map(_.head - 1)
      })
  )

  test("every module's kernel decisions are message-atomic on fuzzed timelines") {
    for (seed <- Seq(11, 37, 101); h <- harnesses) {
      val batches = timeline(seed)
      val module  = graft.operators.WriterModules.registry(h.module)
      val exp = expectedSurvivors(batches,
        module.acceptRepeats, module.emitBuffered).map(_.tsNs)
      val out = Files.createTempDirectory(s"graft-fuzz-${h.module}").toString
      val job = new StreamingJob(spark, NexusPlan.parse(template(h.module, h.extra)),
        out, StartMs, StopMs)
      batches.zipWithIndex.foreach { case (b, i) =>
        if (b.nonEmpty) job.processBatch(h.module, h.frame(b), i.toLong)
      }
      job.finish()
      val got = h.readBack(out)
      assert(got == exp,
        s"${h.module} seed=$seed: surviving messages diverge\n" +
          s"  timeline: ${batches.map(_.map(m => s"${m.offset}@${m.tsMs}"))}\n" +
          s"  expected: $exp\n  got:      $got")
    }
  }
}
