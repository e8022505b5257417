package org.apache.spark

/** Test-only access to `private[spark]` state: SparkContext has no public
  * way to UNSET a checkpoint dir, and the spec session is shared across
  * suites — a leaked checkpoint dir would silently flip every later
  * lineageCut to reliable-checkpoint mode.
  */
object GraftTestBridge {
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None
}
