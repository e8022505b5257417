package graft.commands

/** Transport seam for the command plane — the Kafka boundary of the
  * reference's `JobListener` / `CommandListener` / `FeedbackProducer`
  * (`src/CommandSystem/JobListener.cpp:1-38`, `CommandListener.cpp:1-69`).
  * A real deployment backs this with driver-side kafka-clients consumers
  * and a producer (NOT a streaming query — command handling is control
  * plane, exactly as the reference separates it); tests inject an
  * in-memory queue pair and observe the produced messages.
  */
trait CommandTransport {
  /** Next job-pool record, polled only while idle (pl72 candidates). */
  def pollJobPool(): Option[Array[Byte]]
  /** Next command-topic record, polled only while writing (6s4t etc.). */
  def pollCommands(): Option[Array[Byte]]
  /** Produce an outbound message (answ / x5f2 / wrdn). */
  def produce(kind: String, payload: Array[Byte]): Unit
  /** Commit + disconnect from the job pool after accepting a job — the
    * at-most-one-job-per-worker contract (`Handler.cpp:45-53`).
    */
  def commitJobPool(): Unit
  /** Switch command consumption to the run's control topic (`Some(t)`, the
    * pl72 `control_topic`) or back to the default (`None`) — the
    * reference's alternative-command-channel switch (`Handler.cpp:84-105`).
    * Default no-op for transports with a single channel.
    */
  def useControlTopic(topic: Option[String]): Unit = ()
}

/** The reference's `Handler::loopFunction` re-expressed
  * (`src/CommandSystem/Handler.cpp:45-61`): while idle poll the job pool,
  * while writing poll the command topic; every tick runs the stop monitor
  * (`Master::run` → `checkProgress`), and x5f2 status heartbeats are
  * produced on their own cadence (`src/Status/StatusReporter`).
  */
final class CommandLoop(
    master: Master,
    transport: CommandTransport,
    statusIntervalMs: Long = 2000
) {
  private var lastStatusAt = Long.MinValue / 2 // first tick always heartbeats

  /** One poll-loop iteration. Returns the outbound kinds emitted this
    * tick, in production order (command answers, then completion, then
    * the heartbeat) — callers use it for tests/metrics only.
    */
  def tick(nowMs: Long = System.currentTimeMillis()): Seq[String] = {
    val wasIdle = master.currentJob.isEmpty
    val inbound = if (wasIdle) transport.pollJobPool() else transport.pollCommands()
    val handled = inbound.toSeq.flatMap(master.handle)
    // accepting a job commits the pool offset, stops pool consumption,
    // and switches commands to the run's control topic
    if (wasIdle && master.currentJob.nonEmpty) {
      transport.commitJobPool()
      transport.useControlTopic(master.activeControlTopic)
    }
    val progressed = master.checkProgress(nowMs)
    // run completed (wrdn emitted) → revert to the default command channel
    if (!wasIdle && master.currentJob.isEmpty) transport.useControlTopic(None)
    (handled ++ progressed).foreach(o => transport.produce(o.kind, o.payload))
    val status =
      if (nowMs - lastStatusAt >= statusIntervalMs) {
        lastStatusAt = nowMs
        transport.produce("x5f2", master.statusMessage(statusIntervalMs))
        Seq("x5f2")
      } else Nil
    (handled ++ progressed).map(_.kind) ++ status
  }
}
