package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The Reuse pins must (1) change nothing about results, (2) keep lineage
  * RECOMPUTABLE (no severed-lineage `Scan ExistingRDD` in the plan — the
  * r10 localCheckpoint defect class), and (3) land on the storage tier
  * their class names (corpus → DISK_ONLY, slim → MEMORY_AND_DISK).
  */
class ReuseSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 1000).map(i => (i.toLong, s"doc $i word$i"))
    .toDF("doc_id", "text")

  test("corpus pin: results identical, lineage recomputable, DISK_ONLY") {
    val pinned = Reuse.corpus(df.withColumn("n", length(col("text"))))
    try {
      // plan must NOT bottom out in a severed-lineage RDD scan
      assert(!pinned.queryExecution.analyzed.toString.contains("LogicalRDD"),
        "corpus pin must keep recomputable lineage (no localCheckpoint)")
      assert(pinned.storageLevel == StorageLevel.DISK_ONLY)
      // two consumers agree with the unpinned computation
      val plain = df.withColumn("n", length(col("text")))
      assert(pinned.count() == plain.count())
      assert(pinned.agg(sum("n")).head.getLong(0) ==
        plain.agg(sum("n")).head.getLong(0))
      // blocks dropped + recomputed still agree (the lost-executor path)
      pinned.unpersist(blocking = true)
      assert(pinned.agg(sum("n")).head.getLong(0) ==
        plain.agg(sum("n")).head.getLong(0))
    } finally pinned.unpersist(blocking = true)
  }

  test("slim pin: MEMORY_AND_DISK, recomputable") {
    val pinned = Reuse.slim(df.groupBy(col("doc_id") % 10).count())
    try {
      assert(pinned.storageLevel == StorageLevel.MEMORY_AND_DISK)
      assert(!pinned.queryExecution.analyzed.toString.contains("LogicalRDD"))
      assert(pinned.count() == 10)
    } finally pinned.unpersist(blocking = true)
  }

  test("conf override: checkpoint mode reproduces the pre-r11 pin") {
    spark.conf.set(Reuse.ConfKey, "checkpoint")
    try {
      val pinned = Reuse.corpus(df)
      // localCheckpoint severs lineage — the A/B-measurable legacy shape
      assert(pinned.queryExecution.analyzed.toString.contains("LogicalRDD"))
      assert(pinned.count() == 1000)
    } finally spark.conf.unset(Reuse.ConfKey)
  }

  test("lineageCut: localCheckpoint without a checkpoint dir, reliable with one") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val local = Reuse.lineageCut(df, eager = true)
    assert(local.queryExecution.analyzed.toString.contains("LogicalRDD"))
    assert(local.count() == 1000)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val reliable = Reuse.lineageCut(df, eager = true)
      assert(reliable.count() == 1000)
      // reliable checkpoint writes partition files under the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "reliable checkpoint must write to the checkpoint dir")
    } finally {
      // the session is shared across suites: a leaked checkpoint dir would
      // flip every later lineageCut to reliable mode — reset it
      org.apache.spark.GraftTestBridge.clearCheckpointDir(spark.sparkContext)
    }
  }
}
