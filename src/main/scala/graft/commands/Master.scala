package graft.commands

import org.apache.spark.sql.SparkSession

import graft.plans.NexusPlan
import graft.streaming.StreamingJob

/** The control-plane state machine — `Master` + `Handler` re-expressed
  * (`src/Master.cpp:50-160`, `src/CommandSystem/Handler.cpp:45-163`):
  * at-most-one job per worker; pl72 starts a StreamingJob, 6s4t updates its
  * stop time or stops now; answers and a wrdn completion are emitted as
  * wire messages for the caller to produce to Kafka (driver-side
  * kafka-clients loop in a real deployment — deliberately NOT a streaming
  * query, matching the reference's JobListener).
  */
final class Master(spark: SparkSession, serviceId: String, outRoot: String) {

  import CommandProtocol._

  sealed trait State
  case object Idle extends State
  final case class Writing(
      jobId: String,
      job: StreamingJob,
      controlTopic: String = "") extends State

  /** Job-specific control topic while writing (pl72's `control_topic`,
    * switched to by the reference for the run's commands and reverted at
    * completion — `Handler.cpp:84-105`); empty ⇒ stay on the default.
    */
  def activeControlTopic: Option[String] = state match {
    case Writing(_, _, t) if t.nonEmpty => Some(t)
    case _                              => None
  }

  @volatile private var state: State = Idle

  def currentState: State = state
  def currentJob: Option[StreamingJob] = state match {
    case Writing(_, j, _) => Some(j)
    case Idle          => None
  }

  /** Outbound wire messages produced by command handling. */
  final case class Outbound(kind: String, payload: Array[Byte])

  /** Handle one raw command message (the Kafka record value). */
  def handle(bytes: Array[Byte]): Seq[Outbound] = schemaId(bytes) match {
    case "pl72" => decodeRunStart(bytes).fold(err => reject("", err), start)
    case "6s4t" => decodeRunStop(bytes).fold(err => reject("", err), stop)
    case other  => reject("", s"unknown command schema '$other'")
  }

  /** Start validation per `Handler.cpp:138-163`: UUID job id, parseable
    * structure, sane window; at-most-one job.
    */
  private def start(cmd: RunStart): Seq[Outbound] = state match {
    case Writing(id, _, _) =>
      reject(cmd.jobId, s"already writing job $id")
    case Idle =>
      if (!isValidUuid(cmd.jobId))
        reject(cmd.jobId, s"job id '${cmd.jobId}' is not a valid UUID")
      else if (cmd.nexusStructure.isEmpty)
        reject(cmd.jobId, "empty nexus_structure")
      else if (cmd.stopTimeMs != 0 && cmd.stopTimeMs <= cmd.startTimeMs)
        reject(cmd.jobId, "stop time not after start time")
      else {
        try {
          val plan = NexusPlan.parse(cmd.nexusStructure)
          val stop = if (cmd.stopTimeMs == 0) Long.MaxValue / 2000000 else cmd.stopTimeMs
          val job = new StreamingJob(
            spark, plan, s"$outRoot/${cmd.filename}", cmd.startTimeMs, stop)
          state = Writing(cmd.jobId, job, cmd.controlTopic)
          Seq(Outbound("answ", encodeAnswer(serviceId, cmd.jobId,
            ActionType.StartJob, ActionOutcome.Success, 0, stop,
            "started", cmd.jobId)))
        } catch {
          case e: Exception => reject(cmd.jobId, s"bad nexus_structure: ${e.getMessage}")
        }
      }
  }

  /** Stop semantics per `Master.cpp:100-124`: stop time 0 ⇒ stop now; only
    * the matching job (and service, when set) may be stopped.
    */
  private def stop(cmd: RunStop): Seq[Outbound] = state match {
    case Idle => reject(cmd.jobId, "not writing", ActionType.SetStopTime, cmd.commandId)
    case Writing(id, job, _) =>
      if (cmd.jobId != id)
        reject(cmd.jobId, s"job id mismatch (writing $id)", ActionType.SetStopTime, cmd.commandId)
      else if (cmd.serviceId.nonEmpty && cmd.serviceId != serviceId)
        reject(cmd.jobId, "service id mismatch", ActionType.SetStopTime, cmd.commandId)
      else if (cmd.stopTimeMs == 0L) finishNow(id, job, "stopped immediately")
      else if (job.setStopTime(cmd.stopTimeMs))
        Seq(Outbound("answ", encodeAnswer(serviceId, id,
          ActionType.SetStopTime, ActionOutcome.Success, 0, cmd.stopTimeMs,
          s"stop time set to ${cmd.stopTimeMs}", cmd.commandId)))
      else reject(cmd.jobId, "job already past stop", ActionType.SetStopTime, cmd.commandId)
  }

  /** Called by the stop monitor when all streams are finished (or on
    * stop-now): flush, emit wrdn, return to idle.
    */
  def finishNow(jobId: String, job: StreamingJob, message: String): Seq[Outbound] = {
    // the artifact the reference workflow names IS an HDF5 file: emit the
    // native .h5 inside the job's mirror directory (same basename) unless
    // opted out — spark.graft.service.emitHdf5=off keeps mirror-only runs
    val emitH5 =
      spark.conf.get("spark.graft.service.emitHdf5", "on") != "off"
    val base = java.nio.file.Paths.get(job.outDir).getFileName.toString
    val h5 =
      if (base.endsWith(".h5") || base.endsWith(".nxs")) s"${job.outDir}/$base"
      else s"${job.outDir}/$base.h5"
    var finishError: Option[String] = None
    try job.finish(emitHdf5 = if (emitH5) Some(h5) else None)
    catch {
      // the sink must still go idle and REPORT the failure — a throw here
      // would leave the service stuck in Writing forever
      case e: Exception => finishError = Some(String.valueOf(e.getMessage))
    }
    state = Idle
    // error_encountered mirrors the run's truth: a finish failure or any
    // accumulated per-stream write error; file_name is the JOB's output,
    // not the shared root
    val writeErrors =
      job.metrics.values.map(_.getOrElse("write_errors", 0L)).sum
    val msg = finishError.map(e => s"$message; finish failed: $e")
      .getOrElse(if (writeErrors > 0) s"$message ($writeErrors write errors)"
                 else message)
    Seq(Outbound("wrdn",
      encodeFinished(serviceId, jobId,
        error = finishError.nonEmpty || writeErrors > 0,
        job.outDir, "{}", msg)))
  }

  /** Stop monitor tick: finish the job when every stream saw its
    * beyond-stop message, or when wall clock passed stop + leeway with the
    * streams at EOF (`StreamController::isDoneWriting` +
    * `PartitionFilter`). Returns wrdn when the job completed.
    */
  def checkProgress(nowMs: Long = System.currentTimeMillis()): Seq[Outbound] =
    state match {
      case Writing(id, job, _) if job.allStreamsFinished =>
        finishNow(id, job, "all streams finished")
      case Writing(id, job, _) if job.shouldStop(nowMs) =>
        finishNow(id, job, "wall clock past stop time")
      case _ => Nil
    }

  /** Periodic x5f2 status heartbeat (`src/Status/StatusReporter` cadence),
    * including per-stream write counters (A3) and the approximate output
    * size (A4, `src/FileWriterTask.cpp:102-114`).
    */
  def statusMessage(updateIntervalMs: Long = 2000): Array[Byte] = {
    val json = state match {
      case Idle => """{"state":"idle"}"""
      case Writing(j, job, _) =>
        val streams = job.metrics.map { case (k, m) =>
          s""""$k":{${m.map { case (n, v) => s""""$n":$v""" }.mkString(",")}}"""
        }.mkString(",")
        s"""{"state":"writing","job_id":"$j","file_size":${job.approxFileSizeBytes},""" +
          s""""streams":{$streams}}"""
    }
    encodeStatus(serviceId, json, updateIntervalMs)
  }

  private def reject(jobId: String, why: String,
      action: Short = CommandProtocol.ActionType.StartJob,
      commandId: String = null): Seq[Outbound] =
    // command_id correlates the answer with the COMMAND: pl72 has no
    // separate command id (the job id doubles as it), but 6s4t failures
    // must echo the 6s4t's own command id or the orchestrator never
    // matches the failure response
    Seq(Outbound("answ", encodeAnswer(serviceId, jobId, action,
      ActionOutcome.Failure, 1, 0L, why,
      if (commandId == null) jobId else commandId)))
}
