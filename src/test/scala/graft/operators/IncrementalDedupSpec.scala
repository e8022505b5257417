package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Continuous-ingestion dedup: cross-batch novelty via the persisted
  * bucketed fingerprint index, within-batch keep-first, and the
  * no-Exchange guarantee on the index side of the anti-join.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val table = "graft_inc_dedup_idx"

  private def loc(name: String): java.nio.file.Path =
    java.nio.file.Paths.get(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath)
      .resolve(name)

  private def clearDir(name: String): Unit = {
    val p = loc(name)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(p)
      val all  = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      all.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Drop the catalog entry and every on-disk trace (incl. swap debris)
    * so each test builds its own fixture.
    */
  private def reset(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    clearDir(name)
    clearDir(name + "__compacting")
    clearDir(name + "__retiring")
  }

  test("batches admit only never-seen documents; index accumulates") {
    reset(table) // clear any files from a previous JVM so the suite starts clean

    val b1 = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (3L, "alpha  beta   gamma") // same canonical fingerprint as 1
    ).toDF("doc_id", "text")
    val a1 = IncrementalDedup.ingest(b1, table).select("doc_id").as[Long].collect().toSet
    assert(a1 == Set(1L, 2L)) // within-batch keep-first

    val b2 = Seq(
      (10L, "ALPHA BETA GAMMA"),  // canonical dup of batch-1 doc 1
      (11L, "eta theta iota"),    // novel
      (12L, "delta epsilon zeta") // dup of batch-1 doc 2
    ).toDF("doc_id", "text")
    val a2 = IncrementalDedup.ingest(b2, table).select("doc_id").as[Long].collect().toSet
    assert(a2 == Set(11L)) // only the novel doc survives

    // the index now holds all three canonical fingerprints
    assert(spark.table(table).count() == 3)

    // a replayed batch admits nothing
    val a3 = IncrementalDedup.ingest(b2, table).count()
    assert(a3 == 0)
  }

  test("the index survives a catalog restart (external table re-registration)") {
    // simulate a new session's empty in-memory catalog: the external
    // table vanishes from the catalog but its files remain
    spark.sql(s"DROP TABLE `$table`")
    assert(!spark.catalog.tableExists(table))
    val replay = Seq((20L, "alpha beta gamma"), (21L, "nu xi omicron"))
      .toDF("doc_id", "text")
    val admitted = IncrementalDedup.ingest(replay, table)
      .select("doc_id").as[Long].collect().toSet
    // the pre-restart fingerprints still gate: only the novel doc enters
    assert(admitted == Set(21L))
    assert(spark.table(table).count() == 4)
  }

  test("a replayed stream batch re-admits its own docs (crash-safe ordering)") {
    // crash model: batch 7's fingerprints reached the index but the
    // output write never completed. The replay must admit the SAME docs
    // again (its own index rows are excluded from the anti-join), so the
    // idempotent batch-keyed output overwrite can land them.
    val out   = collection.mutable.ArrayBuffer.empty[Set[Long]]
    val batch = Seq((30L, "pi rho sigma"), (31L, "alpha beta gamma")).toDF("doc_id", "text")
    def run(key: String): Unit = out += IncrementalDedup.ingestBatch(
      batch, table, key,
      writeOut = adm => out += adm.select("doc_id").as[Long].collect().toSet
    ).select("doc_id").as[Long].collect().toSet
    run("runA#7") // original attempt: index append happened
    run("runA#7") // replay after the modeled crash
    // doc 31 is a canonical dup of the batch-1 fingerprint → rejected in
    // both attempts; doc 30 is novel and must be admitted BOTH times
    assert(out.toList == List(Set(30L), Set(30L), Set(30L), Set(30L)))
    // duplicate (fp, batch_key) rows from the replay are inert
    val own = spark.table(table).where("batch_key = 'runA#7'").count()
    assert(own == 2L)
    // a DIFFERENT run reusing the same foreachBatch id must NOT unlock
    // run A's rows: doc 30's fingerprint is indexed → nothing admitted
    out.clear()
    run("runB#7")
    assert(out.toList == List(Set.empty[Long], Set.empty[Long]))
  }

  test("compaction removes replay residue exactly; admission unchanged") {
    // self-contained fixture (no dependence on sibling tests' leftover
    // state): one normal batch, then a crash-replayed stream batch whose
    // second append leaves exactly one residue row for doc 30
    val t = "graft_inc_dedup_compact"
    reset(t)
    IncrementalDedup.ingest(
      Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
        .toDF("doc_id", "text"), t)
    val replayed = Seq((30L, "pi rho sigma"), (31L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    IncrementalDedup.ingestBatch(replayed, t, "runA#7", _ => ())
    IncrementalDedup.ingestBatch(replayed, t, "runA#7", _ => ()) // crash replay
    val before = spark.table(t).count()
    val live   = spark.table(t).select("fp").distinct().count()
    assert(live == 3L && before == live + 1, s"fixture: expected one " +
      s"residue row over 3 fingerprints, got total=$before distinct=$live")
    val removed = IncrementalDedup.compact(spark, t)
    assert(removed == 1L)
    // index is now exactly the live fingerprint set, one row each
    assert(spark.table(t).count() == live)
    assert(spark.table(t).select("fp").distinct().count() == live)
    // membership is unchanged: every previously seen doc still gates,
    // novel docs still enter
    val probe = Seq(
      (40L, "pi rho sigma"),     // indexed by runA#7 before compaction
      (41L, "alpha beta gamma"), // indexed by batch 1
      (42L, "phi chi psi")       // novel
    ).toDF("doc_id", "text")
    val admitted = IncrementalDedup.ingest(probe, t)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(42L))
    // the compacted index kept its bucket layout: the anti-join's index
    // side still reads bucket-aligned files with no Exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val b = Seq((50L, "omega alpha")).toDF("doc_id", "text")
        .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      val plan = b.join(spark.table(t), Seq("fp"), "left_anti")
        .queryExecution.executedPlan.toString
      val indexSide = plan.linesIterator.dropWhile(l => !l.contains(t)).toSeq
      assert(indexSide.nonEmpty && !indexSide.exists(_.contains("Exchange hashpartitioning")),
        s"compacted index side re-shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a crash inside the compaction swap never loses the index") {
    val t = "graft_inc_dedup_crash"
    reset(t)
    IncrementalDedup.ingest(
      Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
        .toDF("doc_id", "text"), t)
    // crash model A: compact died BETWEEN the two renames — catalog entry
    // dropped, live dir renamed aside, staging never promoted
    spark.sql(s"DROP TABLE `$t`")
    java.nio.file.Files.move(loc(t), loc(t + "__retiring"))
    // the next touch restores the retired copy: seen docs still gate
    val a = IncrementalDedup.ingest(
      Seq((3L, "alpha beta gamma"), (4L, "kappa lambda mu"))
        .toDF("doc_id", "text"), t)
      .select("doc_id").as[Long].collect().toSet
    assert(a == Set(4L), "retired index copy was not restored")
    assert(!java.nio.file.Files.exists(loc(t + "__retiring")))
    // crash model B: compact died AFTER the swap — live index is the
    // compacted copy, the retired tree is still waiting for its sweep
    java.nio.file.Files.createDirectories(loc(t + "__retiring"))
    java.nio.file.Files.writeString(
      loc(t + "__retiring").resolve("stale.parquet"), "x")
    val b = IncrementalDedup.ingest(
      Seq((5L, "kappa lambda mu"), (6L, "nu xi omicron"))
        .toDF("doc_id", "text"), t)
      .select("doc_id").as[Long].collect().toSet
    assert(b == Set(6L)) // membership intact (live copy authoritative)
    assert(!java.nio.file.Files.exists(loc(t + "__retiring")),
      "post-swap retired copy was not swept")
  }

  test("a legacy 1-column index entry is upgraded in place") {
    val legacy = "graft_inc_dedup_legacy"
    reset(legacy)
    // a pre-batch_key index: catalog entry and data both 1-column
    spark.sql(
      s"""CREATE TABLE `$legacy` (fp STRING) USING parquet
         |CLUSTERED BY (fp) SORTED BY (fp) INTO 16 BUCKETS
         |LOCATION '${loc(legacy).toUri}'""".stripMargin)
    Seq("alpha beta gamma").toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .write.mode("append").bucketBy(16, "fp").sortBy("fp")
      .format("parquet").saveAsTable(legacy)
    // the 2-column append used to fail against the legacy entry; now the
    // schema upgrades in place and the legacy row keeps gating
    val batch = Seq((60L, "alpha beta gamma"), (61L, "mu nu xi")).toDF("doc_id", "text")
    val admitted = IncrementalDedup.ingest(batch, legacy)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(61L))
    assert(spark.table(legacy).columns.toSeq == Seq("fp", "batch_key"))
    // legacy rows read batch_key = NULL and still count as members
    assert(spark.table(legacy).where(col("batch_key").isNull).count() == 1L)
    spark.sql(s"DROP TABLE `$legacy`")
  }

  test("the accumulated index side of the anti-join has no Exchange") {
    // force the sort-merge path (at real scale the index outgrows any
    // broadcast threshold; locally everything would broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try {
        val batch = Seq((100L, "kappa lambda mu")).toDF("doc_id", "text")
          .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
        batch.join(spark.table(table), Seq("fp"), "left_anti")
          .queryExecution.executedPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the scan of the bucketed index must not be re-shuffled: any
    // hash-partitioning Exchange in the plan may only be on the batch side
    val indexSide = plan.linesIterator
      .dropWhile(l => !l.contains(table)).toSeq
    assert(indexSide.nonEmpty, s"index scan missing in:\n$plan")
    assert(!indexSide.exists(_.contains("Exchange hashpartitioning")),
      s"index side re-shuffled:\n$plan")
  }
}
