package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Graft
import graft.operators.StreamKernel

/** Driver-contract queries for the stream-kernel operator family (SURVEY §2.3,
  * §2.5, §2.7), exercised over the driver's synthetic `events` table standing
  * in for decoded telemetry: `event_id` ≙ Kafka offset (arrival order),
  * `user_id` ≙ source_name, `ts` ≙ i64-ns event timestamp (read as Long via
  * nanosAsLong, matching the reference's time model,
  * `/root/reference/src/Stream/SourceFilter.cpp:68-71`), `value` ≙ sample.
  *
  * Every entry has a DuckDB oracle in [[sql]] with IDENTICAL column names and
  * (where float) IDENTICAL rounding, per the driver's hash-compare contract.
  */
object StreamQueries {

  /** 2024-01-10T00:00:00Z / 2024-01-20T00:00:00Z in µs — inside the events
    * table's Jan-2024 span at every scale factor. Oracle-facing timestamps are
    * µs because DuckDB truncates the parquet ns-timestamps to µs precision;
    * engine-internal time stays i64 ns (the reference's model).
    */
  private val StartUs = 1704844800000000L
  private val StopUs  = 1705708800000000L

  private def ev(s: SparkSession, dir: String): DataFrame = Graft.events(s, dir)

  /** Fanned read for the flatbuffer encode→decode roundtrips whose per-row
    * UDF work funds the fanout exchange (see [[graft.core.Graft.table]]).
    */
  private def evFanned(s: SparkSession, dir: String): DataFrame = Graft.eventsFanned(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 — source routing (src/Stream/SourceFilter.cpp:75-78): plain
    // predicates that push down to the parquet scan.
    "f1_route_source" -> ((s, dir) =>
      StreamKernel
        .routeSource(ev(s, dir), "event_type" -> "purchase")
        .filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))),

    // F4 — consecutive repeated-timestamp dedup at minute granularity
    // (src/Stream/SourceFilter.cpp:90-95).
    "f4_dedup_consecutive" -> { (s, dir) =>
      val d = ev(s, dir).withColumn("ts_min", expr("ts div 60000000000"))
      StreamKernel
        .dedupConsecutive(d, Seq("user_id"), "event_id", "ts_min")
        .select("event_id", "user_id", "ts_min", "value")
    },

    // F2+F3 — time window with last-value-before-start buffering
    // (src/Stream/SourceFilter.cpp:101-118).
    "f2f3_window_buffer" -> { (s, dir) =>
      val base = ev(s, dir)
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      StreamKernel.windowWithBuffer(base, Seq("user_id"), "event_id", "ts_us", StartUs, StopUs)
    },

    // F3+F4 over MULTI-ROW messages — the da00 shape: one message
    // explodes to one row per variable BEFORE the kernel runs (the da00
    // adapter's layout), so consecutive dedup must drop/keep whole
    // messages and the pre-start buffered pick must keep ALL rows of the
    // max-(ts, offset) message (`dense_rank`, the round-13 message-grain
    // rework) — the exact bug class row-grain `lag`/`row_number` forms
    // silently corrupt (`src/WriterModule/da00/da00_Writer.cpp` messages
    // carry every configured variable).
    "f3f4_da00_multirow" -> { (s, dir) =>
      val msgs = ev(s, dir)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"),
          expr("ts div 60000000000").as("ts_min"), col("value"),
          explode(array(
            struct(lit("a").as("vname"), col("value").as("elem")),
            struct(lit("b").as("vname"), (col("value") + 100.0).as("elem")))).as("v"))
        .select(col("event_id"), col("user_id"), col("ts_us"), col("ts_min"),
          col("v.vname").as("vname"), col("v.elem").as("elem"))
      val deduped = StreamKernel
        .dedupConsecutive(msgs, Seq("user_id"), "event_id", "ts_min")
      StreamKernel
        .windowWithBuffer(deduped, Seq("user_id"), "event_id", "ts_us",
          StartUs, StopUs)
        .select("event_id", "user_id", "ts_us", "vname", "elem", "is_buffered")
    },

    // F5+F7 — per-stream health: out-of-order ts + offset gaps
    // (src/Stream/SourceFilter.cpp:96-98, src/Stream/Partition.cpp:226-230).
    "f5f7_stream_health" -> ((s, dir) =>
      StreamKernel.streamHealth(
        ev(s, dir).withColumn("ts_us", expr("ts div 1000")),
        Seq("user_id"), "event_id", "ts_us")),

    // §2.7 — cue (sparse time→row) index every 10 rows per stream.
    "cue_index" -> ((s, dir) =>
      StreamKernel.cueIndex(ev(s, dir).withColumn("ts_us", expr("ts div 1000")), Seq("user_id"), "event_id", "ts_us", 10)),

    // W1 — f144 running aggregates per stream
    // (src/WriterModule/f144/f144_Writer.cpp:264-276).
    "w1_f144_stats" -> ((s, dir) =>
      ev(s, dir)
        .groupBy("user_id")
        .agg(
          min("value").as("minimum_value"),
          max("value").as("maximum_value"),
          // order-independent exact-decimal mean (see ExactStats): a
          // plain double avg() differs from the oracle's by a
          // summation-order ulp, which flips the 6th decimal on
          // knife-edge groups — found by the round-9 sf1 gate run.
          ExactStats.meanExact6(col("value"), count(lit(1))).as("average_value"),
          count(lit(1)).as("num_values")
        )),

    // W2 — ev44 cumulative event-index shift: event_index of a batch =
    // events written before it (src/WriterModule/ev44/ev44_Writer.cpp:118-126).
    // Batches ≙ (stream, hour); running pre-sum via a window cumsum.
    "w2_ev44_index_shift" -> { (s, dir) =>
      val batches = ev(s, dir)
        .withColumn("hour", expr("ts div 3600000000000"))
        .groupBy("user_id", "hour")
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy("user_id").orderBy("hour")
      batches.withColumn(
        "event_index",
        (sum("n_events").over(w) - col("n_events")).cast("long")
      )
    },

    // W4 — se00 generated per-element timestamps t0 + i·Δ
    // (src/WriterModule/se00/se00_Writer.cpp:209-219).
    "w4_se00_timestamps" -> ((s, dir) =>
      ev(s, dir)
        .select(col("event_id"), col("ts"), explode(sequence(lit(0L), lit(3L))).as("i"))
        .select(
          col("event_id"),
          col("i").as("pos"),
          (expr("ts div 1000") + col("i") * 1000L).as("sample_ts")
        )),

    // W6 — al00 projection: severity→int16, empty-message default
    // (src/WriterModule/al00/al00_Writer.cpp:57-70).
    "w6_al00_alarm" -> ((s, dir) =>
      ev(s, dir).select(
        col("event_id"),
        expr("ts div 1000").as("ts_us"),
        when(col("event_type") === "error", lit(2))
          .when(col("event_type") === "signup", lit(1))
          .otherwise(lit(0))
          .cast("short")
          .as("severity"),
        when(length(col("props")) === 0, lit("NO ALARM MESSAGE"))
          .otherwise(col("props"))
          .as("message")
      )),

    // W7 — ep01 projection: connection status→int16
    // (src/WriterModule/ep01/ep01_Writer.cpp:38-46).
    "w7_ep01_status" -> ((s, dir) =>
      ev(s, dir).select(
        col("event_id"),
        expr("ts div 1000").as("ts_us"),
        when(col("event_type") === "signup", lit(1)).otherwise(lit(0)).cast("short").as("status")
      )),

    // W8 — tdct explode: array column → one row per element
    // (src/WriterModule/tdct/tdct_Writer.cpp:67-83).
    "w8_tdct_explode" -> ((s, dir) =>
      Graft
        .documentsFanned(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))),

    // D1/D2 — FlatBuffers decode: encode each event as a real f144 wire
    // message, decode with the catalyst expression; the oracle is the
    // identity projection, so any wire/decode defect breaks the hash.
    "d1_decode_roundtrip" -> { (s, dir) =>
      val enc = udf((src: String, ts: Long, v: Double) =>
        graft.functions.FbEncoders.f144(src, ts, v))
      ev(s, dir)
        .select(col("event_id"),
          enc(concat(lit("user-"), col("user_id")), col("ts"), col("value")).as("buf"))
        .select(col("event_id"), graft.functions.Decode.decode_f144(col("buf")).as("d"))
        .select(col("event_id"), col("d.source_name").as("source_name"),
          expr("d.timestamp div 1000").as("ts_us"), col("d.value").as("value"))
    },

    // D2 — per-schema wire roundtrips for the remaining payload decoders
    // (al00_Writer.cpp:57-70, ep01_Writer.cpp:38-46, tdct_Writer.cpp:67-83,
    // se00_Writer.cpp:135-224, ad00_Writer.cpp:142-204,
    // da00_Writer.cpp:333-387): encode deterministic wire messages from the
    // events table, decode with the native expression, identity oracle.
    "d2_al00_roundtrip" -> { (s, dir) =>
      val enc = udf((src: String, ts: Long, sev: Short, msg: String) =>
        graft.functions.FbEncoders.al00(src, ts, sev, msg))
      ev(s, dir)
        .select(col("event_id"),
          enc(concat(lit("user-"), col("user_id")), col("ts"),
            when(col("event_type") === "error", lit(2))
              .when(col("event_type") === "signup", lit(1))
              .otherwise(lit(0)).cast("short"),
            col("props")).as("buf"))
        .select(col("event_id"), graft.functions.Decode.decode_al00(col("buf")).as("d"))
        .select(col("event_id"), col("d.source_name").as("source_name"),
          expr("d.timestamp div 1000").as("ts_us"),
          col("d.severity").as("severity"), col("d.message").as("message"))
    },

    "d2_ep01_roundtrip" -> { (s, dir) =>
      val enc = udf((src: String, ts: Long, st: Short) =>
        graft.functions.FbEncoders.ep01(src, ts, st))
      ev(s, dir)
        .select(col("event_id"),
          enc(concat(lit("user-"), col("user_id")), col("ts"),
            when(col("event_type") === "signup", lit(1)).otherwise(lit(0))
              .cast("short")).as("buf"))
        .select(col("event_id"), graft.functions.Decode.decode_ep01(col("buf")).as("d"))
        .select(col("event_id"), col("d.source_name").as("source_name"),
          expr("d.timestamp div 1000").as("ts_us"), col("d.status").as("status"))
    },

    "d2_tdct_roundtrip" -> { (s, dir) =>
      val enc = udf((name: String, ts: Long) =>
        graft.functions.FbEncoders.tdct(
          name, Seq(ts, ts + 1000000L, ts + 2000000L), 7L))
      ev(s, dir)
        .select(col("event_id"),
          enc(concat(lit("chopper-"), col("user_id")), col("ts")).as("buf"))
        .select(col("event_id"), graft.functions.Decode.decode_tdct(col("buf")).as("d"))
        .select(col("event_id"), col("d.source_name").as("source_name"),
          col("d.sequence_counter").as("sequence_counter"),
          posexplode(col("d.timestamps")).as(Seq("pos", "t")))
        .select(col("event_id"), col("source_name"), col("sequence_counter"),
          col("pos"), expr("t div 1000").as("time_us"))
    },

    "d2_se00_roundtrip" -> { (s, dir) =>
      val enc = udf((name: String, ch: Int, mc: Long, pt: Long, v: Double) =>
        graft.functions.FbEncoders.se00(name, ch, 1000000.0, None, mc, pt,
          Seq(v, v + 0.5, v + 1.0), "float64"))
      ev(s, dir)
        .select(col("event_id"),
          enc(concat(lit("sensor-"), col("user_id")),
            (col("user_id") % 8).cast("int"), col("event_id"), col("ts"),
            col("value")).as("buf"))
        .select(col("event_id"), graft.functions.Decode.decode_se00(col("buf")).as("d"))
        .select(col("event_id"), col("d.source_name").as("source_name"),
          col("d.channel").as("channel"),
          col("d.message_counter").as("message_counter"),
          expr("d.packet_timestamp div 1000").as("packet_ts_us"),
          col("d.values_type").as("values_type"),
          posexplode(col("d.values")).as(Seq("pos", "sample")))
        // generated per-element timestamps t0 + i·Δ (se00_Writer.cpp:209-219)
        .select(col("event_id"), col("source_name"), col("channel"),
          col("message_counter"), col("packet_ts_us"), col("values_type"),
          col("pos"), col("sample"),
          (col("packet_ts_us") + col("pos") * 1000L).as("sample_ts_us"))
    },

    "d2_ad00_roundtrip" -> { (s, dir) =>
      val enc = udf((src: String, ts: Long, v: Double) =>
        graft.functions.FbEncoders.ad00(src, ts, Seq(2L, 3L),
          (0 until 6).map(i => v + i), "float64"))
      evFanned(s, dir)
        .select(col("event_id"),
          enc(concat(lit("cam-"), col("user_id")), col("ts"), col("value")).as("buf"))
        .select(col("event_id"), graft.functions.Decode.decode_ad00(col("buf")).as("d"))
        .select(col("event_id"), col("d.source_name").as("source_name"),
          expr("d.timestamp div 1000").as("ts_us"),
          col("d.data_type").as("data_type"),
          element_at(col("d.dimensions"), 1).as("dim0"),
          element_at(col("d.dimensions"), 2).as("dim1"),
          posexplode(col("d.data")).as(Seq("pos", "elem")))
    },

    "d2_da00_roundtrip" -> { (s, dir) =>
      val enc = udf((src: String, ts: Long, v: Double) =>
        graft.functions.FbEncoders.da00(src, ts, Seq(
          graft.functions.FbEncoders.Da00Var("signal", "K", "", Seq("x"),
            Seq(3L), "int32", (0 until 3).map(i => math.floor(v) + i)))))
      evFanned(s, dir)
        .select(col("event_id"),
          enc(concat(lit("user-"), col("user_id")), col("ts"), col("value")).as("buf"))
        .select(col("event_id"), graft.functions.Decode.decode_da00(col("buf")).as("d"))
        .select(col("event_id"), col("d.source_name").as("source_name"),
          expr("d.timestamp div 1000").as("ts_us"),
          element_at(col("d.data"), 1).as("v0"))
        .select(col("event_id"), col("source_name"), col("ts_us"),
          col("v0.name").as("vname"), col("v0.unit").as("unit"),
          element_at(col("v0.axes"), 1).as("axis"),
          element_at(col("v0.shape"), 1).as("shape0"),
          col("v0.data_type").as("data_type"),
          posexplode(col("v0.data")).as(Seq("pos", "elem")))
    }
  )

  val sql: Map[String, String] = Map(
    "f1_route_source" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |FROM events WHERE event_type = 'purchase' AND user_id < 50""".stripMargin,
    "f4_dedup_consecutive" ->
      """SELECT event_id, user_id, ts_min, value FROM (
        |  SELECT event_id, user_id, epoch_us(ts) // 60000000 AS ts_min, value,
        |         lag(epoch_us(ts) // 60000000) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |  FROM events)
        |WHERE prev IS NULL OR prev <> ts_min""".stripMargin,
    "f2f3_window_buffer" ->
      s"""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
         |cut AS (SELECT *, min(CASE WHEN ts_us > $StopUs THEN event_id END)
         |                  OVER (PARTITION BY user_id) AS cutoff FROM ev),
         |live AS (SELECT * FROM cut WHERE cutoff IS NULL OR event_id < cutoff)
         |SELECT event_id, user_id, ts_us, value, false AS is_buffered
         |FROM live WHERE ts_us BETWEEN $StartUs AND $StopUs
         |UNION ALL
         |SELECT event_id, user_id, ts_us, value, true AS is_buffered FROM (
         |  -- dense_rank, mirroring the kernel's MESSAGE-grain pick: all
         |  -- rows of the max-(ts, offset) message survive (identical on
         |  -- this corpus where event_id is row-unique)
         |  SELECT *, dense_rank() OVER (PARTITION BY user_id
         |                               ORDER BY ts_us DESC, event_id DESC) AS rn
         |  FROM live WHERE ts_us < $StartUs) WHERE rn = 1""".stripMargin,
    "f5f7_stream_health" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN prev_ts IS NOT NULL AND ts_us < prev_ts THEN 1 ELSE 0 END) AS BIGINT) AS unordered_timestamps,
        |  CAST(sum(CASE WHEN prev_of IS NOT NULL AND event_id - prev_of <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_offsets,
        |  CAST(count(*) AS BIGINT) AS messages
        |FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         lag(epoch_us(ts)) OVER w AS prev_ts, lag(event_id) OVER w AS prev_of
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |GROUP BY user_id""".stripMargin,
    "cue_index" ->
      """SELECT user_id, rn AS cue_index, ts_us AS cue_timestamp FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events)
        |WHERE rn % 10 = 0""".stripMargin,
    "w1_f144_stats" ->
      s"""SELECT user_id, min(value) AS minimum_value, max(value) AS maximum_value,
        |       ${ExactStats.sqlMeanExact6("value")} + 0.0 AS average_value, CAST(count(*) AS BIGINT) AS num_values
        |FROM events GROUP BY user_id""".stripMargin,
    "w2_ev44_index_shift" ->
      """WITH b AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
        |         CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, hour, n_events,
        |       CAST(sum(n_events) OVER (PARTITION BY user_id ORDER BY hour) - n_events AS BIGINT) AS event_index
        |FROM b""".stripMargin,
    "w4_se00_timestamps" ->
      """SELECT event_id, CAST(i AS BIGINT) AS pos, epoch_us(ts) + i * 1000 AS sample_ts
        |FROM events, generate_series(0, 3) AS t(i)""".stripMargin,
    "w6_al00_alarm" ->
      """SELECT event_id, epoch_us(ts) AS ts_us,
        |  CAST(CASE WHEN event_type = 'error' THEN 2 WHEN event_type = 'signup' THEN 1 ELSE 0 END AS SMALLINT) AS severity,
        |  CASE WHEN length(props) = 0 THEN 'NO ALARM MESSAGE' ELSE props END AS message
        |FROM events""".stripMargin,
    "w7_ep01_status" ->
      """SELECT event_id, epoch_us(ts) AS ts_us,
        |  CAST(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS SMALLINT) AS status
        |FROM events""".stripMargin,
    "w8_tdct_explode" ->
      "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents",
    "d1_decode_roundtrip" ->
      """SELECT event_id, 'user-' || CAST(user_id AS VARCHAR) AS source_name,
        |       epoch_us(ts) AS ts_us, value
        |FROM events""".stripMargin,
    "d2_al00_roundtrip" ->
      """SELECT event_id, 'user-' || CAST(user_id AS VARCHAR) AS source_name,
        |  epoch_us(ts) AS ts_us,
        |  CAST(CASE WHEN event_type = 'error' THEN 2 WHEN event_type = 'signup' THEN 1 ELSE 0 END AS SMALLINT) AS severity,
        |  props AS message
        |FROM events""".stripMargin,
    "d2_ep01_roundtrip" ->
      """SELECT event_id, 'user-' || CAST(user_id AS VARCHAR) AS source_name,
        |  epoch_us(ts) AS ts_us,
        |  CAST(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS SMALLINT) AS status
        |FROM events""".stripMargin,
    "d2_tdct_roundtrip" ->
      """SELECT event_id, 'chopper-' || CAST(user_id AS VARCHAR) AS source_name,
        |  CAST(7 AS BIGINT) AS sequence_counter, CAST(i AS INTEGER) AS pos,
        |  epoch_us(ts) + i * 1000 AS time_us
        |FROM events, generate_series(0, 2) AS t(i)""".stripMargin,
    "d2_se00_roundtrip" ->
      """SELECT event_id, 'sensor-' || CAST(user_id AS VARCHAR) AS source_name,
        |  CAST(user_id % 8 AS INTEGER) AS channel, event_id AS message_counter,
        |  epoch_us(ts) AS packet_ts_us, 'float64' AS values_type,
        |  CAST(i AS INTEGER) AS pos, value + i * 0.5 AS sample,
        |  epoch_us(ts) + i * 1000 AS sample_ts_us
        |FROM events, generate_series(0, 2) AS t(i)""".stripMargin,
    "f3f4_da00_multirow" ->
      s"""WITH msgs AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         |         epoch_us(ts) // 60000000 AS ts_min, value FROM events),
         |-- message-grain consecutive dedup at minute grain
         |ded AS (
         |  SELECT * FROM (
         |    SELECT *, lag(ts_min) OVER (PARTITION BY user_id
         |                                ORDER BY event_id) AS prev
         |    FROM msgs) WHERE prev IS NULL OR prev <> ts_min),
         |cut AS (SELECT *, min(CASE WHEN ts_us > $StopUs THEN event_id END)
         |                  OVER (PARTITION BY user_id) AS cutoff FROM ded),
         |live AS (SELECT * FROM cut WHERE cutoff IS NULL OR event_id < cutoff),
         |kept AS (
         |  SELECT event_id, user_id, ts_us, value, false AS is_buffered
         |  FROM live WHERE ts_us BETWEEN $StartUs AND $StopUs
         |  UNION ALL
         |  SELECT event_id, user_id, ts_us, value, true AS is_buffered FROM (
         |    SELECT *, dense_rank() OVER (PARTITION BY user_id
         |                 ORDER BY ts_us DESC, event_id DESC) AS rn
         |    FROM live WHERE ts_us < $StartUs) WHERE rn = 1)
         |SELECT event_id, user_id, ts_us, t.vname, value + t.a AS elem,
         |       is_buffered
         |FROM kept CROSS JOIN (VALUES ('a', 0.0), ('b', 100.0)) AS t(vname, a)""".stripMargin,
    "d2_ad00_roundtrip" ->
      """SELECT event_id, 'cam-' || CAST(user_id AS VARCHAR) AS source_name,
        |  epoch_us(ts) AS ts_us, 'float64' AS data_type,
        |  CAST(2 AS BIGINT) AS dim0, CAST(3 AS BIGINT) AS dim1,
        |  CAST(i AS INTEGER) AS pos, value + i AS elem
        |FROM events, generate_series(0, 5) AS t(i)""".stripMargin,
    "d2_da00_roundtrip" ->
      """SELECT event_id, 'user-' || CAST(user_id AS VARCHAR) AS source_name,
        |  epoch_us(ts) AS ts_us, 'signal' AS vname, 'K' AS unit, 'x' AS axis,
        |  CAST(3 AS BIGINT) AS shape0, 'int32' AS data_type,
        |  CAST(i AS INTEGER) AS pos, CAST(floor(value) + i AS DOUBLE) AS elem
        |FROM events, generate_series(0, 2) AS t(i)""".stripMargin
  )
}
