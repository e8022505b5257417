package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

import graft.functions.TextFunctions

/** Retention-horizon streaming dedup on the `transformWithState` arbitrary
  * state API: admit a document the first time its canonical fingerprint is
  * seen, suppress repeats for `ttl`, and let the state store itself expire
  * the fingerprint afterwards — no timers, no external table, no manual
  * sweep.
  *
  * This completes the intake dedup spectrum:
  *   - [[DocStream.intake]]: duplicates within the EVENT-TIME watermark
  *     horizon (`dropDuplicatesWithinWatermark`);
  *   - this operator: duplicates within a PROCESSING-TIME retention window
  *     (a re-crawl policy — "the same page seen again within 30 days is a
  *     duplicate; after that it is a legitimate refresh");
  *   - [[graft.operators.IncrementalDedup]]: duplicates against the WHOLE
  *     history via a persisted bucketed index.
  *
  * Scale posture: per-fingerprint state is one long (the admitted doc_id),
  * value-state TTL bounds total state by the DISTINCT fingerprints of one
  * retention window (not the corpus), and `transformWithState` requires
  * the RocksDB state store provider
  * ([[StatefulSessions.RocksDbStateStore]]) — so that bounded window
  * lives off-heap with changelog checkpointing. Cf. the reference's
  * bounded stream buffers (`src/Stream/MessageWriter.cpp` keeps no
  * per-message history at all); the TTL horizon is the streaming analog
  * of that retention discipline.
  */
object TtlDedup {

  case class Doc(doc_id: Long, text: String)

  /** First-seen filter keyed by the canonical text fingerprint: one
    * output row per fingerprint per TTL window (within a batch the
    * smallest doc_id wins, the engine-wide keep-first rule). State: one
    * `ValueState[Long]` per live fingerprint, expired by the store.
    */
  private class FirstSeen(ttl: Duration)
      extends StatefulProcessor[String, Doc, Doc] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[Doc],
        timers: TimerValues): Iterator[Doc] =
      if (seen.exists()) Iterator.empty
      else {
        val first = rows.minBy(_.doc_id)
        seen.update(first.doc_id)
        Iterator.single(first)
      }
  }

  /** Admit first-in-window docs from a streaming `Dataset[Doc]`. The
    * session must run the RocksDB state store (apply
    * [[StatefulSessions.RocksDbStateStore]] before starting the query —
    * `transformWithState` rejects the default provider at query start,
    * so a misconfigured session fails fast rather than silently
    * accumulating heap state).
    *
    * Operational note: in ProcessingTime mode the operator keeps
    * requesting no-data micro-batches for TTL bookkeeping; tests (or any
    * caller relying on `processAllAvailable` settling) should set
    * `spark.sql.streaming.noDataMicroBatches.enabled=false` — expiry
    * itself doesn't need those batches, it is enforced lazily against
    * the batch timestamp on every state read.
    */
  def admitted(docs: Dataset[Doc], ttl: Duration): Dataset[Doc] = {
    implicit val docEnc: Encoder[Doc]    = Encoders.product[Doc]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    docs
      .groupByKey(d => fpOf(d.text))
      .transformWithState(new FirstSeen(ttl), TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** Executor-side canonical fingerprint for the keyed grouping — the
    * JVM twin of the `fingerprint` column expression, so TTL-admitted
    * sets compose with the batch/index dedup layers. A null text keys to
    * the empty sentinel (never a real md5 hex), grouping all null-text
    * docs into one TTL window — the `dropDuplicates`-style null rule,
    * and crucially NOT an executor NPE that would crash-loop the
    * streaming query on one malformed upstream row.
    */
  def fpOf(text: String): String =
    if (text == null) "" else TextFunctions.fingerprintOf(text)
}
