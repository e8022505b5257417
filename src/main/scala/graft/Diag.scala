package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scale diagnostics: candidate-vs-survivor counts and bucket
  * occupancy for the pair-generating queries, at any SF dir — the tool
  * that distinguishes "the blocking generates quadratically many
  * candidates" (a plan defect: tighten the blocking) from "the corpus
  * genuinely contains quadratic near-dup pairs" (semantics: the output
  * itself is the cost, and no blocking can be sub-output).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.Diag <which>"
  * where <which> ∈ {simhash, winnow}.
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.DocQueries
    import graft.core.Graft

    args.headOption.getOrElse("simhash") match {
      case "simhash" =>
        import graft.functions.SimHash32.simhash32
        val sh = Graft.documents(spark, sfDir)
          .select(col("doc_id"), simhash32(col("text")).as("simhash"))
          .transform(graft.operators.Reuse.lineageCut(_))
        println(s"docs: ${sh.count()}")
        // block-bucket occupancy (4 rotations x 16-bit prefix)
        val rotBlocks = (0 until 4).map { r =>
          val rot = 8 * r
          struct(lit(r).as("rot"),
            expr(s"((shiftleft(simhash, $rot) % 4294967296) + " +
              s"shiftright(simhash, ${32 - rot})) >> 16").as("blk"))
        }
        val occ = sh.select(explode(array(rotBlocks: _*)).as("rb"))
          .groupBy(col("rb.rot"), col("rb.blk")).agg(count(lit(1)).as("b"))
          .transform(graft.operators.Reuse.lineageCut(_))
        occ.agg(count(lit(1)).as("buckets"), max(col("b")).as("max_occ"),
            sum(col("b") * (col("b") - 1) / 2).as("pair_work"),
            sum(when(col("b") > 4096, col("b")).otherwise(0)).as("capped_docs"))
          .show(false)
        occ.orderBy(desc("b")).show(20, false)
        val pairs = DocQueries.simhashPairs(
          sh.select(col("doc_id"), col("simhash"))).transform(graft.operators.Reuse.lineageCut(_))
        println(s"verified pairs (hamming<=6): ${pairs.count()}")
        println(s"identical-hash pairs: ${pairs.filter(col("hamming") === 0).count()}")
      case "winnow" =>
        val fps = DocQueries.winnowFingerprints(Graft.documents(spark, sfDir))
          .select("doc_id", "fp").distinct().transform(graft.operators.Reuse.lineageCut(_))
        println(s"(doc, fp) rows: ${fps.count()}")
        val occ = fps.groupBy("fp").agg(count(lit(1)).as("b")).transform(graft.operators.Reuse.lineageCut(_))
        occ.agg(count(lit(1)).as("fps"), max(col("b")).as("max_occ"),
            sum(col("b") * (col("b") - 1) / 2).as("pair_work"),
            sum(when(col("b") > 4096, col("b")).otherwise(0)).as("capped_docs"))
          .show(false)
        occ.orderBy(desc("b")).show(20, false)
        val out = SparkEntry.queries("winnow_matches")(spark, sfDir)
        println(s"winnow_matches output pairs: ${out.count()}")
      case "explain" =>
        // AQE-final plan of a named query at this SF: execute (collect
        // drives AQE to its final plan), then summarize the join
        // strategies — the broadcast→shuffle flip evidence
        val name = args(1)
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        println(plan)
        Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "BroadcastNestedLoopJoin").foreach { j =>
          println(s"JOINCOUNT $j = ${j.r.findAllIn(plan).length}")
        }
      case "stages" =>
        // per-stage shuffle-write bytes for a named query: which exchange
        // grows across scales
        val name = args(1)
        val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val m = s.stageInfo.taskMetrics
            rows.add((s.stageInfo.stageId, m.shuffleWriteMetrics.bytesWritten,
              m.shuffleReadMetrics.totalBytesRead,
              s.stageInfo.name.take(60)))
          }
        }
        spark.sparkContext.addSparkListener(l)
        SparkEntry.queries(name)(spark, sfDir).collect()
        Thread.sleep(2000)
        import scala.jdk.CollectionConverters._
        rows.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (id, w, r, n) =>
          println(f"STAGE $id%4d write=${w / 1e6}%10.1f MB read=${r / 1e6}%10.1f MB  $n")
        }
      case other => sys.error(s"unknown diag: $other")
    }
    spark.stop()
  }
}
