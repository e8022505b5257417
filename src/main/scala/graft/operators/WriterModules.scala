package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._

import graft.functions.StableLong.{intDiv, stableLit}

/** The per-stream transform operators — Spark re-expressions of the
  * reference's writer modules (`src/WriterModule/⋆`, SURVEY §2.5). Each turns
  * a decoded, filtered message DataFrame into named output tables whose
  * columns mirror the module's NeXus datasets; row order is carried by an
  * explicit `row` column (parquet has no intrinsic order), computed from the
  * Kafka arrival offset — the reference's append order.
  */
object WriterModules {

  /** Typed view over a stream node's JSON config with alias support,
    * mirroring `JsonConfig::Field` (`src/JsonConfig/Field.h:109-215`).
    */
  final case class ModuleConfig(fields: Map[String, JValue]) {
    def str(keys: String*): Option[String] =
      keys.iterator.flatMap(k => fields.get(k)).collectFirst { case JString(s) => s }
    def long(keys: String*): Option[Long] =
      keys.iterator.flatMap(k => fields.get(k)).collectFirst {
        case JInt(i) => i.toLong
        case JLong(l) => l
        case JDouble(d) => d.toLong
      }
    def bool(keys: String*): Option[Boolean] =
      keys.iterator.flatMap(k => fields.get(k)).collectFirst { case JBool(b) => b }

    /** f144/se00 dtype with aliases (`f144_Writer.h:83`, map at
      * `f144_Writer.cpp:56-70`): lowercase, `type|dtype`.
      */
    def dtype(default: String): String = {
      val raw = str("type", "dtype").getOrElse(default).toLowerCase
      Map(
        "float" -> "float", "double" -> "double",
        "short" -> "smallint", "int" -> "int", "long" -> "bigint",
        "int8" -> "tinyint", "uint8" -> "smallint",
        "int16" -> "smallint", "uint16" -> "int",
        "int32" -> "int", "uint32" -> "bigint",
        "int64" -> "bigint", "uint64" -> "bigint",
        "float32" -> "float", "float64" -> "double",
        "string" -> "string", "c_string" -> "string"
      ).getOrElse(raw, "double")
    }
  }

  /** Cross-batch append cursor — the writer-module member fields the
    * reference carries between writeImpl calls, passed in per batch:
    * `rowStart` = message rows already written ("NrOfWrites"),
    * `eventsWritten` = ev44 cumulative events (`ev44_Writer.cpp:118-126`),
    * `lastCue` = the greedy cue-chain anchor (`LastCueIndex` /
    * `LastIndexAtWrite`, `ev44_Writer.cpp:127-134`, `f144_Writer.cpp:259-263`).
    */
  final case class Cursor(
      rowStart: Long = 0L,
      eventsWritten: Long = 0L,
      lastCue: Long = 0L,
      /** message count of THIS batch (−1 unknown) — an exchange-shaping
        * hint only (small batches skip the range-sampling job in
        * [[Rows.indexedCounted]]); never feeds row values.
        */
      sizeHint: Long = -1L,
      /** total payload elements of THIS batch (−1 unknown), from the
        * module's [[WriterModule.elementCountCol]] via the streaming
        * job's fused aggregate — lets the renumber bound its BYTES, not
        * just its row count (wide-array rows run ~16 KB; a rows-only
        * bound routed 160 MB triggers into one task).
        */
      elemHint: Long = -1L) {
    /** crude batch payload bytes: 8 B/element + envelope per message. */
    def byteHint: Long =
      if (sizeHint < 0) -1L
      else math.max(elemHint, 0L) * 8 + sizeHint * 48
  }

  trait WriterModule {
    def id: String
    /** Only ev44 accepts repeated timestamps (`ev44_Writer.h:22`). */
    def acceptRepeats: Boolean = false
    /** ev44 ignores buffered pre-start messages (`ev44_Writer.cpp:94-97`). */
    def emitBuffered: Boolean = true
    def nxClass: String = "NXlog"
    /** dataset-name → units attribute (time is always ns). */
    def units(cfg: ModuleConfig): Map[String, String] = Map("time" -> "ns")
    /** computed group-level attributes (NX_class etc.). */
    def groupAttrs(cfg: ModuleConfig): Map[String, String] =
      Map("NX_class" -> nxClass)
    /** message DF (post route/dedup/window) → named output tables. */
    def tables(df: DataFrame, cfg: ModuleConfig, cur: Cursor = Cursor()): Map[String, DataFrame]
    /** next cue-chain anchor after a cue at `maxCueIndex` (f144 family
      * stores the write COUNT, ev44 the event INDEX — `f144_Writer.cpp:260`
      * vs `ev44_Writer.cpp:133`).
      */
    def nextLastCue(maxCueIndex: Long): Long = maxCueIndex + 1
    /** Per-message exploded-element count (modules whose data rows explode
      * the payload array): lets the streaming job fold the batch's exact
      * element total into its one fused scalar aggregate, so the
      * append-side renumber and the ev44 event cursor need no extra job.
      */
    def elementCountCol: Option[org.apache.spark.sql.Column] = None
    /** Tables whose `row` sort keys are ALREADY globally unique and
      * monotone as emitted (dense data rows started at `cur.rowStart`;
      * cue rows reuse their message's global row) — the sink appends them
      * without a renumber pass. Exploding modules override: their sparse
      * `row·2³² + pos` keys need the write-side dense renumber.
      */
    def denseRowTables: Set[String] = Set("data", "cue")
    /** Exact driver-side cue-row count for this batch, when the module's
      * cue grid is pure cursor arithmetic (unit-increment chains over
      * one-data-row-per-message tables: f144/ad00). `rows` is the exact
      * data-row count of the batch (the streaming job's msgHint). `None`
      * means not predictable (ev44's candidate walk is data-dependent).
      * The streaming write path uses `Some(0)` to skip the cue append
      * outright — at production cue intervals (reference ev44 default is
      * 10⁸ events) most triggers fire no cue, and a provably-empty append
      * is a whole Spark write job for zero rows.
      */
    def plannedCueCount(cfg: ModuleConfig, cur: Cursor, rows: Long): Option[Long] = None
    /** True when ONE wire message reaches the module as SEVERAL input rows
      * (the da00 adapter explodes per VARIABLE). Message-grain semantics
      * (F4 dedup, the pre-start buffer) must then treat all rows sharing
      * an offset as one unit — the streaming job collects the WHOLE
      * message for the buffered candidate instead of the single row the
      * fused aggregate carries.
      */
    def multiRowMessages: Boolean = false
    /** scalar datasets written at job close (running aggregates). */
    def finals(df: DataFrame, cfg: ModuleConfig): Map[String, DataFrame] = Map.empty
    /** [[finals]] for the STREAMING close, where no message frame is in
      * scope — the aggregates derive from the sink's own written tables
      * instead (`read` loads one by name; every written row came through
      * the kernel, so the values agree with the batch path's, computed
      * over the STORED — i.e. dtype-cast — values). Default: none.
      */
    def sinkFinals(read: String => DataFrame, cfg: ModuleConfig): Map[String, DataFrame] =
      Map.empty
  }

  /** The one closed form behind every unit-increment cue grid (f144/ad00
    * [[WriterModule.plannedCueCount]] overrides): grid points lastCue +
    * k·n (k ≥ 1) with 1-based write count in (rowStart, rowStart + rows].
    * ONE definition on purpose — the streaming cue-skip is sound only
    * while this NEVER disagrees with the modules' cue filters
    * (`CueGridSpec` pins them equal), and a second copy could drift.
    */
  private def unitGridCueCount(lastCue: Long, rowStart: Long, rows: Long, n: Long): Long =
    math.max(0L, (rowStart + rows - lastCue) / n) -
      math.max(0L, (rowStart - lastCue) / n)

  /** Arrival-order GLOBAL row index within the stream, computed
    * distributed ([[Rows.indexed]] two-pass prefix sum — no
    * single-partition stage; the reference's single-writer discipline
    * (`src/Stream/MessageWriter.cpp:31-36`) constrains output order, not
    * the numbering computation). Starts at the cross-batch cursor so
    * non-exploding tables need no second numbering pass at append time.
    */
  private def withRow(df: DataFrame, cur: Cursor = Cursor()): DataFrame =
    Rows.indexed(df, "offset", start = cur.rowStart,
      sizeHint = cur.sizeHint, byteHint = cur.byteHint)

  /** Sparse sort key for exploded rows: message row in the high 32 bits,
    * element position low — unique and monotone within a batch (renumbered
    * dense at append; bounds: <2³¹ messages/batch, <2³² elems/message).
    */
  private def sparseKey: org.apache.spark.sql.Column =
    (col("row") * lit(4294967296L) + col("pos")).as("row")

  /** f144 scalar log: (time, value) + cue index + min/max/mean metadata
    * (`src/WriterModule/f144/f144_Writer.cpp:197-276`).
    */
  object F144 extends WriterModule {
    val id = "f144"
    override def units(cfg: ModuleConfig): Map[String, String] = {
      val u = cfg.str("value_units", "unit").getOrElse("")
      Map("time" -> "ns", "value" -> u, "minimum_value" -> u,
        "maximum_value" -> u, "average_value" -> u)
    }
    def tables(df: DataFrame, cfg: ModuleConfig, cur: Cursor): Map[String, DataFrame] = {
      val data = withRow(df, cur)
        .select(col("row"), col("ts").as("time"),
          col("value").cast(cfg.dtype("double")).as("value"))
      val cue = cfg.long("cue_interval") match {
        case Some(n) if n > 0 =>
          // greedy chain anchored at the cross-batch cursor: writes
          // increment by one, so cues land at lastCue + n, + 2n, …
          // exactly (`f144_Writer.cpp:259-263`); rows are global already
          val gw = col("row") + 1 // 1-based global write count
          Map("cue" -> data
            .filter(gw > stableLit(cur.lastCue) && (gw - stableLit(cur.lastCue)) % n === 0)
            .select(col("row"), (gw - 1).as("cue_index"),
              col("time").as("cue_timestamp_zero")))
        case _ => Map.empty[String, DataFrame] // default u32::max ⇒ off (f144_Writer.h:79-80)
      }
      Map("data" -> data) ++ cue
    }
    override def plannedCueCount(cfg: ModuleConfig, cur: Cursor, rows: Long): Option[Long] =
      cfg.long("cue_interval").filter(_ > 0)
        .map(unitGridCueCount(cur.lastCue, cur.rowStart, rows, _))
    override def finals(df: DataFrame, cfg: ModuleConfig): Map[String, DataFrame] =
      if (cfg.bool("meta_data").getOrElse(true)) {
        // aggregate the STORED values (post dtype cast, like tables() and
        // sinkFinals): with "type": "int" the raw decoded 3.7 is written
        // as 3 — meta must describe what the file holds
        val v = col("value").cast(cfg.dtype("double"))
        Map("meta" -> df.agg(
          min(v).as("minimum_value"), max(v).as("maximum_value"),
          avg(v).as("average_value"), count(lit(1)).as("num_values")))
      } else Map.empty
    override def sinkFinals(read: String => DataFrame, cfg: ModuleConfig): Map[String, DataFrame] =
      if (cfg.bool("meta_data").getOrElse(true))
        Map("meta" -> read("data").agg(
          min("value").as("minimum_value"), max("value").as("maximum_value"),
          avg("value").as("average_value"), count(lit(1)).as("num_values")))
      else Map.empty
  }

  /** ep01 connection state: (connection_status_time, connection_status)
    * (`src/WriterModule/ep01/ep01_Writer.cpp:38-46`).
    */
  object Ep01 extends WriterModule {
    val id = "ep01"
    def tables(df: DataFrame, cfg: ModuleConfig, cur: Cursor): Map[String, DataFrame] =
      Map("data" -> withRow(df, cur).select(col("row"),
        col("ts").as("connection_status_time"),
        col("status").cast("short").as("connection_status")))
  }

  /** al00 alarms: severity int16 + message with empty-string default
    * (`src/WriterModule/al00/al00_Writer.cpp:57-70`).
    */
  object Al00 extends WriterModule {
    val id = "al00"
    def tables(df: DataFrame, cfg: ModuleConfig, cur: Cursor): Map[String, DataFrame] =
      Map("data" -> withRow(df, cur).select(col("row"),
        col("ts").as("alarm_time"),
        col("severity").cast("short").as("alarm_severity"),
        when(length(col("message")) === 0, lit("NO ALARM MESSAGE"))
          .otherwise(col("message")).as("alarm_message")))
  }

  /** ev44 events: exploded (event_time_offset, event_id) plus per-message
    * (event_time_zero, event_index) with the stateful cumulative shift
    * `event_index = reference_time_index + EventsWritten`
    * (`src/WriterModule/ev44/ev44_Writer.cpp:92-138`, shift at 118-126).
    */
  object Ev44 extends WriterModule {
    val id = "ev44"
    /** Observability of the last batch's cue resolution (test hook): how
      * many candidate rows the driver collected (bounded ≈
      * batchEvents/interval) and how many superset MISSES the
      * proof-of-first-crossing hit (0 in the common case). All misses
      * are resolved together by ONE batched walk job — the count keeps
      * its meaning but no longer prices a Spark job per link.
      */
    private[graft] var lastCueCandidates: Int = 0
    private[graft] var lastCueFallbacks: Int  = 0
    /** Scale guard on the cue chain's driver-side candidate collect: the
      * candidate superset is ≈ batchEvents/interval rows, so a pathological
      * config (`cue_interval=1` on a huge stream — the reference default is
      * 10⁸ events, `src/WriterModule/ev44/ev44_Writer.h:48`) would collect
      * O(rows) onto the driver. The EFFECTIVE interval is raised just enough
      * to bound candidates at [[MaxCueCandidates]] (~24 MB of collected
      * anchors); cues stay exact under the effective interval, only their
      * density is clamped. [[lastCueInterval]] records the value used so the
      * clamp is observable, never silent.
      */
    private[graft] var MaxCueCandidates: Long  = 1L << 20 // var: test hook only
    private[graft] var lastCueInterval: Long   = 0L
    /** Fallback-walk shape hooks: partitions the range-partitioned walk
      * used, and its executed plan — so specs can assert the sort is
      * per-partition (no single-task coalesce(1) funnel at scale).
      * [[WalkRowsPerPartition]] sizes the walk: messages-per-task target;
      * var so specs can force a multi-partition walk on small data.
      */
    private[graft] var WalkRowsPerPartition: Long = 1L << 18
    private[graft] var lastWalkPartitions: Int    = 0
    private[graft] var lastWalkPlan: String       = ""
    override def acceptRepeats = true
    override def emitBuffered  = false
    override def nxClass       = "NXevent_data"
    /** ev44 anchors the chain at the cue EVENT INDEX (`LastCueIndex =
      * EventsWritten - 1`, `ev44_Writer.cpp:133`), not the write count.
      */
    override def nextLastCue(maxCueIndex: Long): Long = maxCueIndex
    /** events/index carry sparse exploded keys → dense renumber at append. */
    override def denseRowTables: Set[String] = Set("cue")
    override def elementCountCol = Some(size(col("time_of_flight")))
    def tables(df: DataFrame, cfg: ModuleConfig, cur: Cursor): Map[String, DataFrame] = {
      // one distributed pass assigns both the message row index and the
      // exclusive running event count (EventsWritten, ev44_Writer.cpp:118-126)
      val base = Rows.indexed(
        df.withColumn("__n_ev", size(col("time_of_flight")).cast("long")),
        "offset", weight = Some(("__n_ev", "events_written", 0L)),
        sizeHint = cur.sizeHint, byteHint = cur.byteHint)
      val cum = base
        .withColumn("events_after", col("events_written") + col("__n_ev"))
        .drop("__n_ev")
      // empty messages append no ref times (ev44_Writer.cpp:111); every
      // reference_time element lands, each index shifted by EventsWritten
      // (ev44_Writer.cpp:115-125)
      val nonEmpty = cum.filter(size(col("time_of_flight")) > 0)
      val index = nonEmpty
        .select(col("row"), col("events_written"),
          posexplode(arrays_zip(col("reference_time"), col("reference_time_index"))))
        .select(
          sparseKey,
          col("col.reference_time").as("event_time_zero"),
          (col("col.reference_time_index").cast("long") + col("events_written"))
            .as("event_index"))
      val events = base
        .select(col("row"), posexplode(arrays_zip(col("time_of_flight"), col("pixel_id"))))
        .select(sparseKey,
          col("col.time_of_flight").as("event_time_offset"),
          col("col.pixel_id").as("event_id"))
      // cue via the EXACT greedy chain of ev44_Writer.cpp:127-134: cue
      // when cumulative events exceed lastCue + interval, the new anchor
      // being that message's last event index. The anchor is
      // data-dependent and inherently sequential, but the driver no
      // longer collects every message: it collects only the CANDIDATE
      // messages whose cumulative count crosses a multiple of the
      // interval (≈ batchEvents/interval rows — the fire-rate bound —
      // instead of 24 B × every message). Greedy anchors drift off that
      // grid, so the walk PROVES each candidate before firing: a
      // candidate with ea_prev ≤ last+interval < ea is necessarily the
      // first crossing (its predecessor hadn't crossed and ea is
      // monotone); when the proof fails — the superset missed the true
      // first crossing — that single link is fetched with one filtered
      // limit(1) job, so exactness never depends on the heuristic.
      val L0 = cur.lastCue
      val proj = nonEmpty.select(
        col("row"),
        (col("events_after") + stableLit(cur.eventsWritten)).as("ea"),
        (col("events_written") + stableLit(cur.eventsWritten)).as("ea_prev"),
        (element_at(col("reference_time"), -1) +
          element_at(col("time_of_flight"), -1).cast("long")).as("cue_ts"))
      val (maxEa, nMsgs) =
        proj.agg(max("ea"), count(lit(1))).collect().head match {
          case r if r.isNullAt(0) => (Long.MinValue, 0L)
          case r                  => (r.getLong(0), r.getLong(1))
        }
      // effective interval ≥ requested, raised so the candidate collect
      // stays ≤ MaxCueCandidates rows (see the guard's doc on the object)
      val requested   = cfg.long("cue_interval").getOrElse(100000000L).max(1L)
      val batchEvents = if (maxEa == Long.MinValue) 0L else (maxEa - cur.eventsWritten).max(0L)
      val floor =
        if (batchEvents > 0) (batchEvents + Ev44.MaxCueCandidates - 1) / Ev44.MaxCueCandidates
        else 1L
      val interval = requested.max(floor)
      Ev44.lastCueInterval = interval
      val cand = proj.filter(
        intDiv(col("ea") - 1 - stableLit(L0), stableLit(interval)) >
          intDiv(col("ea_prev") - 1 - stableLit(L0), stableLit(interval)))
        .orderBy("row").collect()
      Ev44.lastCueCandidates  = cand.length
      Ev44.lastCueFallbacks   = 0
      Ev44.lastWalkPartitions = 0
      Ev44.lastWalkPlan       = ""
      val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var last = L0
      var i    = 0
      var done = false
      while (!done) {
        while (i < cand.length && cand(i).getAs[Long]("ea") <= last + interval) i += 1
        if (i < cand.length && cand(i).getAs[Long]("ea_prev") <= last + interval) {
          val r = cand(i)
          // sort key = the global event index itself: monotone and
          // unique across batches with no renumber pass
          hits += ((r.getAs[Long]("ea") - 1, r.getAs[Long]("ea") - 1,
            r.getAs[Long]("cue_ts")))
          last = r.getAs[Long]("ea") - 1
          i += 1
        } else if (maxEa > last + interval) {
          // superset miss: the true first crossing is a non-candidate.
          // Finish the ENTIRE remaining chain distributed: the greedy
          // recurrence (ev44_Writer.cpp:127-134) is inherently
          // sequential in the THRESHOLD, but ea is the monotone
          // cumulative event count, so after range-partitioning the slim
          // (row, ea, cue_ts) projection by row the chain sweeps the
          // partitions strictly left to right, entering each at most
          // once. The sort is therefore per-partition (parallel — no
          // coalesce(1) funnel), and the sequential part shrinks to one
          // driver Long threaded through at most one tiny cached-RDD job
          // per partition (sc.runJob on exactly that partition). A
          // partition whose max ea never exceeds the entering
          // threshold+interval is skipped without a job. Messages with
          // ea ≤ threshold+interval can never fire later (thresholds
          // only grow), so the filtered stream is sufficient; output is
          // one slim row per cue, bounded by batchEvents / interval ≤
          // MaxCueCandidates — the same clamp that bounds the candidate
          // collect.
          val (l0w, iv) = (last, interval)
          val session0  = df.sparkSession
          // P from the batch's message bound (same agg as maxEa): small
          // batches collapse to ONE partition — fallback job count stays
          // independent of the miss count — while large batches get
          // parallel local sorts with ~WalkRowsPerPartition rows/task.
          val p = math.min(32L,
            (nMsgs + Ev44.WalkRowsPerPartition - 1) / Ev44.WalkRowsPerPartition)
            .toInt.max(1)
          val src = proj
            .filter(col("ea") > l0w + iv)
            .select(col("row"), col("ea"), col("cue_ts"))
          val sorted =
            (if (p == 1) src.coalesce(1)
             else src.repartitionByRange(p, col("row")))
              .sortWithinPartitions("row")
          Ev44.lastWalkPartitions = p
          Ev44.lastWalkPlan       = sorted.queryExecution.executedPlan.toString
          import session0.implicits._
          val rdd = sorted.as[(Long, Long, Long)].rdd
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val walked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          try {
            val sc = session0.sparkContext
            // materializing pass: per-partition max ea (= last element —
            // the partition is row-sorted and ea is monotone in row)
            val partMaxEa: Array[Option[Long]] =
              sc.runJob(rdd, (it: Iterator[(Long, Long, Long)]) => {
                var m = Option.empty[Long]
                it.foreach(r => m = Some(r._2))
                m
              })
            var l   = l0w
            var pid = 0
            while (pid < partMaxEa.length) {
              if (partMaxEa(pid).exists(_ > l + iv)) {
                val lIn = l
                val res = sc.runJob(rdd, (it: Iterator[(Long, Long, Long)]) => {
                  var ll = lIn
                  val hs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
                  it.foreach { case (row, ea, ts) =>
                    if (ea > ll + iv) { ll = ea - 1; hs += ((row, ea, ts)) }
                  }
                  (hs.toSeq, ll)
                }, Seq(pid))
                walked ++= res(0)._1
                l = res(0)._2
              }
              pid += 1
            }
          } finally rdd.unpersist(blocking = false)
          // the metric keeps its meaning — number of superset misses —
          // they just no longer cost a job each: a TRUE crossing that IS
          // a candidate is always provable (its ea_prev ≤ last+interval
          // by firstness), so the misses are exactly the non-candidates
          val candRows = cand.iterator.map(_.getAs[Long]("row")).toSet
          Ev44.lastCueFallbacks += walked.count(w => !candRows.contains(w._1))
          walked.foreach { case (_, ea, ts) => hits += ((ea - 1, ea - 1, ts)) }
          done = true
        } else done = true
      }
      val session = df.sparkSession
      import session.implicits._
      val cue = hits.toSeq.toDF("row", "cue_index", "cue_timestamp_zero")
      Map("events" -> events, "index" -> index, "cue" -> cue)
    }
    override def finals(df: DataFrame, cfg: ModuleConfig): Map[String, DataFrame] =
      Map("meta" -> df.agg(
        coalesce(sum(size(col("time_of_flight"))), lit(0L)).as("events")))
    /** total events = the exploded events table's row count */
    override def sinkFinals(read: String => DataFrame, cfg: ModuleConfig): Map[String, DataFrame] =
      Map("meta" -> read("events").agg(count(lit(1)).as("events")))
  }

  /** ad00 n-D image: flattened element array + shape per message
    * (`src/WriterModule/ad00/ad00_Writer.cpp:142-204`).
    */
  object Ad00 extends WriterModule {
    val id = "ad00"
    override def elementCountCol = Some(size(col("data")))
    override def units(cfg: ModuleConfig): Map[String, String] =
      Map("time" -> "ns", "value" -> "")
    def tables(df: DataFrame, cfg: ModuleConfig, cur: Cursor): Map[String, DataFrame] = {
      val data = withRow(df, cur).select(col("row"), col("ts").as("time"),
        transform(col("data"), _.cast(cfg.dtype("double"))).as("value"),
        col("dimensions").as("shape"))
      // message-count cue chain (`ad00_Writer.cpp:198-202` CueCounter):
      // unit increments ⇒ anchored grid; rows are global across batches
      val n  = cfg.long("cue_interval").getOrElse(1000L)
      val gw = col("row") + 1
      // stableLit, not lit: the cursor advances every cue, and an inlined
      // literal would regenerate the whole-stage code each trigger (the
      // Janino-recompile class StableLong exists to remove — NOTES_r12 §1)
      val cue = data
        .filter(gw > stableLit(cur.lastCue) && (gw - stableLit(cur.lastCue)) % n === 0)
        .select(col("row"), (gw - 1).as("cue_index"),
          col("time").as("cue_timestamp_zero"))
      Map("data" -> data, "cue" -> cue)
    }
    // same unit-increment grid as f144, with ad00's 1000-message default
    override def plannedCueCount(cfg: ModuleConfig, cur: Cursor, rows: Long): Option[Long] = {
      val n = cfg.long("cue_interval").getOrElse(1000L)
      if (n <= 0) None
      else Some(unitGridCueCount(cur.lastCue, cur.rowStart, rows, n))
    }
  }

  /** da00 multi-variable data arrays: one column per configured variable,
    * missing variables null-filled (`variable_append_missing`,
    * `src/WriterModule/da00/da00_Writer.cpp:333-387`).
    */
  object Da00 extends WriterModule {
    val id = "da00"
    /** input rows are per-variable (pre-pivot): summing each row's array
      * size totals the batch payload across variables.
      */
    override def elementCountCol = Some(size(col("data")))
    /** the adapter explodes one da00 message into per-variable rows */
    override def multiRowMessages = true
    override def nxClass = "NXdata"
    /** NXdata signal/axes attributes with `time` prepended to the axes —
      * computed at plan time (`da00_Writer.cpp:132-227`).
      */
    override def groupAttrs(cfg: ModuleConfig): Map[String, String] = {
      val vars = variableNames(cfg)
      val axes = cfg.fields.get("variables") match {
        case Some(JArray(vs)) =>
          vs.headOption.toSeq.flatMap(v => (v \ "axes") match {
            case JArray(as) => as.collect { case JString(a) => a }
            case _          => Nil
          })
        case _ => Nil
      }
      Map("NX_class" -> nxClass) ++
        vars.headOption.map("signal" -> _) +
        ("axes" -> ("time" +: axes).mkString(","))
    }
    /** Effective variable spec after first-message reconciliation. */
    final case class VariableSpec(
        name: String,
        dataType: Option[String],
        shape: Option[Seq[Long]],
        declared: Boolean,
        mismatch: Boolean)

    /** First-message schema reconciliation (`handle_first_message`,
      * `da00_Writer.cpp:65-130`): declared config is authoritative; missing
      * dtype/shape fill from the message, declared-but-mismatched specs are
      * kept and flagged (the reference logs a warning), and variables the
      * message carries but the config doesn't are appended as inferred.
      */
    def reconcile(
        cfg: ModuleConfig,
        firstMessage: Map[String, (String, Seq[Long])]
    ): Seq[VariableSpec] = {
      val declared = cfg.fields.get("variables") match {
        case Some(JArray(vs)) =>
          vs.flatMap { v =>
            (v \ "name") match {
              case JString(n) =>
                val dt = (v \ "data_type") match { case JString(s) => Some(s); case _ => None }
                val sh = (v \ "shape") match {
                  case JArray(xs) => Some(xs.collect {
                    case JInt(i) => i.toLong
                    case JLong(l) => l
                  })
                  case _ => None
                }
                Some((n, dt, sh))
              case _ => None
            }
          }
        case _ => Nil
      }
      val reconciled = declared.map { case (n, dt, sh) =>
        firstMessage.get(n) match {
          case Some((msgDt, msgSh)) =>
            val mismatch = dt.exists(_ != msgDt) || sh.exists(_ != msgSh)
            VariableSpec(n, dt.orElse(Some(msgDt)), sh.orElse(Some(msgSh)),
              declared = true, mismatch = mismatch)
          case None =>
            VariableSpec(n, dt, sh, declared = true, mismatch = false)
        }
      }
      val extra = (firstMessage.keySet -- declared.map(_._1)).toSeq.sorted.map { n =>
        val (dt, sh) = firstMessage(n)
        VariableSpec(n, Some(dt), Some(sh), declared = false, mismatch = false)
      }
      reconciled ++ extra
    }

    def variableNames(cfg: ModuleConfig): Seq[String] =
      cfg.fields.get("variables") match {
        case Some(JArray(vs)) =>
          vs.flatMap(v => (v \ "name") match { case JString(s) => Some(s); case _ => None })
        case _ => Nil
      }

    /** Runtime constants-consistency check (`da00_Writer.cpp:92-118`):
      * constants are written once at structure creation, but later
      * messages may still CARRY a variable of the same name — the
      * reference compares that payload against the declared data and
      * warns "Data for constant {} is not consistent". Returns the
      * mismatch count per constant (one distributed aggregate; fed into
      * the stream's write-error counters).
      */
    def constantMismatches(df: DataFrame, cfg: ModuleConfig): Map[String, Long] = {
      def nums(jv: JValue): Seq[Double] = graft.plans.NexusPlan.jsonDoubles(jv)
      val declared: Seq[(String, Seq[Double])] = cfg.fields.get("constants") match {
        case Some(JArray(cs)) =>
          cs.flatMap { c =>
            ((c \ "name"), (c \ "data")) match {
              case (JString(n), d @ JArray(_)) => Some(n -> nums(d))
              case _                           => None // declared without data: filled by first message
            }
          }
        case _ => Nil
      }
      if (declared.isEmpty) Map.empty
      else {
        val checks = declared.map { case (n, xs) =>
          sum(when(col("name") === n &&
            !(col("data") <=> typedLit(xs)), 1L).otherwise(0L)).as(n)
        }
        val row = df.agg(checks.head, checks.tail: _*).collect()(0)
        declared.map { case (n, _) =>
          n -> Option(row.getAs[java.lang.Long](n)).map(_.toLong).getOrElse(0L)
        }.toMap
      }
    }
    def tables(df: DataFrame, cfg: ModuleConfig, cur: Cursor): Map[String, DataFrame] = {
      val vars = {
        val declared = variableNames(cfg)
        if (declared.nonEmpty) declared else Seq("signal")
      }
      // one message may carry several variables ⇒ group rows by offset,
      // pivot declared variable names to columns (first-message schema
      // reconciliation is plan-time; here config is authoritative)
      val pivoted = df
        .groupBy(col("offset"), col("ts"))
        .pivot(col("name"), vars)
        .agg(first(col("data")))
      val cols = Seq(col("row"), col("ts").as("time")) ++ vars.map(col)
      Map("data" -> withRow(pivoted, cur).select(cols: _*))
    }
  }

  /** se00 sample environment: per-element values with provided or generated
    * timestamps `t0 + i·Δ` (`src/WriterModule/se00/se00_Writer.cpp:135-224`,
    * generation 209-219).
    */
  object Se00 extends WriterModule {
    val id = "se00"
    /** exploded per-element rows → sparse keys, renumbered at append;
      * zero-element messages rejected (F8, `se00_Writer.cpp:202-204`).
      */
    override def denseRowTables: Set[String] = Set.empty
    override def elementCountCol = Some(size(col("values")))
    def tables(df: DataFrame, cfg: ModuleConfig, cur: Cursor): Map[String, DataFrame] = {
      val ex = withRow(df.filter(size(col("values")) > 0),
        Cursor(sizeHint = cur.sizeHint, elemHint = cur.elemHint))
        .select(col("row"), col("ts"), col("time_delta"), col("timestamps"),
          posexplode(col("values")).as(Seq("pos", "value")))
      val data = ex.select(
        sparseKey,
        coalesce(
          element_at(col("timestamps"), col("pos") + 1),
          (col("ts") + col("pos") * col("time_delta")).cast("long")
        ).as("time"),
        col("value").cast(cfg.dtype("bigint")).as("value"))
      Map("data" -> data)
    }
  }

  /** tdct chopper timestamps: explode the u64[] into `time`
    * (`src/WriterModule/tdct/tdct_Writer.cpp:67-83`; empty messages
    * rejected at 72-76).
    */
  object Tdct extends WriterModule {
    val id = "tdct"
    /** exploded rows → sparse keys, renumbered at append. */
    override def denseRowTables: Set[String] = Set.empty
    override def elementCountCol = Some(size(col("timestamps")))
    def tables(df: DataFrame, cfg: ModuleConfig, cur: Cursor): Map[String, DataFrame] = {
      val ex = withRow(df.filter(size(col("timestamps")) > 0),
        Cursor(sizeHint = cur.sizeHint, elemHint = cur.elemHint))
        .select(col("row"), posexplode(col("timestamps")).as(Seq("pos", "t")))
      Map("data" -> ex.select(sparseKey, col("t").as("time")))
    }
  }

  val registry: Map[String, WriterModule] =
    Seq(F144, Ep01, Al00, Ev44, Ad00, Da00, Se00, Tdct).map(m => m.id -> m).toMap
}
