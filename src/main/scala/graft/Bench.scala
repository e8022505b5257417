package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query wall
  * seconds. Results are forced through the noop writer so the full plan
  * (including column materialization) executes — a bare `count()` lets the
  * scan skip columns and under-reports.
  *
  * Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and the
  * PER-QUERY MEDIAN is reported: single runs on a shared machine swing
  * ±25% and have repeatedly mimicked regressions that were load, not
  * plans. The `SPARK_GRAFT_BENCH_HEAVY_COUNT` (default 20) heaviest
  * queries get `SPARK_GRAFT_BENCH_HEAVY_EXTRA` (default 2) extra samples
  * — with only 3, a 2-sample host load spike owns the median — and the
  * artifact records min + every raw sample per query. The total is the
  * sum of medians.
  */
object Bench {

  /** Deterministic per-query byte counters from task metrics. Wall seconds
    * on a shared host jitter ±25%; shuffle/input/spill BYTES are a property
    * of the plan + data and repeat exactly run-over-run, so they are the
    * clean signal for scaling analysis (SCALE.md): a super-linear shuffle
    * byte exponent across sf0.1 → sf1 → sf10 is a quadratic no amount of
    * wall-clock noise can hide or fake. Accumulated via SparkListener;
    * attribution is snapshot-delta per query sample — Bench runs queries
    * strictly sequentially, so after the listener bus quiesces the delta
    * belongs to the just-finished query alone.
    */
  private final class ByteMeter extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLongArray
    private val a = new AtomicLongArray(5) // shufW, shufR, spillMem, spillDisk, input
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        a.addAndGet(0, m.shuffleWriteMetrics.bytesWritten)
        a.addAndGet(1, m.shuffleReadMetrics.totalBytesRead)
        a.addAndGet(2, m.memoryBytesSpilled)
        a.addAndGet(3, m.diskBytesSpilled)
        a.addAndGet(4, m.inputMetrics.bytesRead)
      }
    }
    def snap(): Array[Long] = Array.tabulate(5)(a.get)
    /** Poll until the async listener bus has drained (counters stable
      * across a sleep window) — there is no public flush API. Runs in the
      * untimed gap between samples. The second element is false when the
      * loop exited via the iteration cap WITHOUT observing stability — a
      * still-draining bus misattributes bytes to the adjacent query, so
      * the instability must surface in the artifact, not vanish.
      */
    def quiesced(): (Array[Long], Boolean) = {
      var prev = snap(); var cur = prev; var i = 0
      var stable = false
      while (!stable && i < 30) {
        prev = cur; Thread.sleep(60); cur = snap(); i += 1
        stable = java.util.Arrays.equals(prev, cur)
      }
      if (!stable)
        System.err.println("[bench] WARNING: listener bus still draining after quiesce cap; byte attribution for the adjacent query is suspect")
      (cur, stable)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs  = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // The generated-class cache (static conf, default 100 entries) is far
    // too small for a 195-plan suite visited round-robin: every plan's
    // WholeStageCodegen classes are LRU-evicted between two visits of the
    // same query, so EVERY timed sample pays a fresh Janino compile — a
    // flat per-query floor that grew with the suite (r10 measured it at
    // ~+0.08 s/query vs the 119-query r8 suite; raising the cache removes
    // it). A real deployment runs ONE plan repeatedly — the small cache is
    // a harness artifact, not a production cost.
    val codegenCache = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", codegenCache)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // measure alternate chunk-numbering strategies (ChunkIds.ConfKey)
    // without touching the default: SPARK_GRAFT_CHUNK_NUMBERING=sampled
    sys.env.get("SPARK_GRAFT_CHUNK_NUMBERING")
      .foreach(m => spark.conf.set(graft.operators.ChunkIds.ConfKey, m))
    // A/B the reuse-pin storage (Reuse.ConfKey): SPARK_GRAFT_REUSE=checkpoint
    sys.env.get("SPARK_GRAFT_REUSE")
      .foreach(m => spark.conf.set(graft.operators.Reuse.ConfKey, m))
    // A/B the scan fanout (Graft.FanoutConfKey): SPARK_GRAFT_FANOUT=off
    sys.env.get("SPARK_GRAFT_FANOUT")
      .foreach(m => spark.conf.set(graft.core.Graft.FanoutConfKey, m))
    // generic runtime-conf A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ =>
      }
    })

    val meter = new ByteMeter
    spark.sparkContext.addSparkListener(meter)
    // last observed per-query byte deltas (bytes are plan-deterministic, so
    // any sample's delta is representative; the last one wins), plus
    // whether BOTH bracketing quiesces observed stability
    val bytesByQuery = scala.collection.mutable.LinkedHashMap.empty[String, (Array[Long], Boolean)]

    // Janino compilations inside the timed window, per query sample: a
    // warm plan should compile NOTHING — a nonzero steady-state count is
    // the generated-class cache evicting between visits (the flat
    // per-query floor the r9 artifact suffered). Driver-side registry;
    // codegen runs on the driver, so no listener lag.
    def compileCount(): Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    val compilesByQuery = scala.collection.mutable.LinkedHashMap.empty[String, Long]

    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val compilesBefore = compileCount()
      val (before, beforeStable) = meter.quiesced()
      val t0 = System.nanoTime()
      val elapsed =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      // Release reuse-pin storage deterministically (untimed). Two layers:
      // CacheManager entries (the Reuse persist pins) must be DROPPED, not
      // just have their blocks freed — a surviving entry would serve the
      // NEXT timed sample of the same plan from cache and fake its time —
      // and localCheckpoint blocks are freed only after a GC notices dead
      // weak refs, so storage otherwise ACCUMULATES across the suite and
      // randomly throttles later queries (observed: dsir 2 s alone vs 16 s
      // mid-suite behind a dozen checkpoint-heavy dedup plans).
      // blocking = true: async removal would let the freeing work (and
      // the still-occupied storage memory) land inside the NEXT query's
      // timed window — the wait itself sits in this untimed gap.
      // ORDER MATTERS: clearCache() unpersists cached plans NON-blocking
      // and removes their RDDs from persistentRdds, so run the blocking
      // unpersist sweep FIRST (it covers the cache-backed RDDs too), then
      // clearCache() to drop the now-empty CacheManager entries.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      if (elapsed >= 0) {
        val (after, afterStable) = meter.quiesced()
        bytesByQuery(name) =
          (Array.tabulate(5)(i => after(i) - before(i)), beforeStable && afterStable)
        compilesByQuery(name) = compileCount() - compilesBefore
      }
      elapsed
    }

    // Schema-drift canary (see Graft.schemaCanary): fail fast with a
    // readable message on testdata drift instead of -1.000 sentinels.
    graft.core.Graft.schemaCanary(spark, sfDir).foreach(System.err.println)

    // JVM/session warmup so the first measured query doesn't absorb
    // startup (codegen compiler, parquet footer reads, executor spin-up)
    Seq("events", "documents", "embeddings", "lineitem").foreach { t =>
      graft.core.Graft.table(spark, sfDir, t)
        .write.format("noop").mode("overwrite").save()
    }

    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      else if (ok.length % 2 == 1) ok(ok.length / 2)
      else (ok(ok.length / 2 - 1) + ok(ok.length / 2)) / 2
    }

    // stable ordering for comparable per-round numbers; whole suite
    // repeated (not back-to-back per query) so cache warmth is uniform
    // (SPARK_GRAFT_BENCH_ONLY=a,b,c narrows to named queries when
    // iterating on one plan — never set by the driver)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Audit-only queries (SparkEntry.auditOnlyQueries): still run and
    // recorded, but bucketed out of the headline total — they certify an
    // operator at sample scale and are non-scalable BY DESIGN, so leaving
    // them in the timed total makes it a scaling-meaningless number.
    // Scale (sf >= 1) runs drop them entirely with
    // SPARK_GRAFT_BENCH_SKIP_AUDIT=1.
    val skipAudit = sys.env.getOrElse("SPARK_GRAFT_BENCH_SKIP_AUDIT", "0") == "1"
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .filter { case (n, _) => !(skipAudit && SparkEntry.auditOnlyQueries(n)) }
    // UNTIMED warm-up passes of every query before the timed samples: the
    // first executions of a plan pay whole-stage-codegen javac/JIT + code-
    // cache compilation (observed 27s-vs-4s first-sample skew on heavy
    // queries; r9 measured the inflation reaching into pass 2 on the full
    // 195-query suite), which is startup cost, not plan cost. The warm-up
    // keeps JIT out of ALL samples so first/median ratios stay comparable.
    // SPARK_GRAFT_BENCH_WARMUP=N runs N full untimed passes (0 disables;
    // default 1; the clean-artifact protocol uses 2).
    val warmupPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt
    (1 to warmupPasses).foreach { _ =>
      names.foreach { case (name, fn) => runOne(name, fn) }
    }
    val samples = scala.collection.mutable.LinkedHashMap(
      names.map { case (n, _) => n -> scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    (1 to runs).foreach { _ =>
      names.foreach { case (name, fn) => samples(name) += runOne(name, fn) }
    }
    // Noise guard for the slow tail: with 3 samples, one 2-sample host
    // load spike OWNS the median (r7's whole TPC-H "regression" was
    // exactly that). The heaviest queries get 2 extra samples so a
    // transient window needs 3-of-5 contaminated to move the reported
    // number; the raw samples land in the artifact either way so load
    // can be told from plans without a forensic pass.
    val extraRuns  = sys.env.getOrElse("SPARK_GRAFT_BENCH_HEAVY_EXTRA", "2").toInt
    val heavyCount = sys.env.getOrElse("SPARK_GRAFT_BENCH_HEAVY_COUNT", "20").toInt
    if (extraRuns > 0 && heavyCount > 0) {
      val heavy = names.filter { case (n, _) =>
        samples(n).exists(_ >= 0)
      }.sortBy { case (n, _) => -median(samples(n).toSeq) }.take(heavyCount)
      (1 to extraRuns).foreach { _ =>
        heavy.foreach { case (name, fn) => samples(name) += runOne(name, fn) }
      }
    }
    val results = names.map { case (name, _) =>
      name -> median(samples(name).toSeq)
    }
    // locale-invariant decimals: the f"" interpolator honors the JVM
    // default locale, and a comma-decimal locale would render the JSON
    // (stdout line AND committed artifact) unparseable
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    // headline total = TIMED queries only; audit-only certifiers get
    // their own bucket so the total stays comparable across scales
    val (auditResults, timedResults) =
      results.partition { case (n, _) => SparkEntry.auditOnlyQueries(n) }
    val total = timedResults.map(_._2).filter(_ >= 0).sum
    val auditTotal = auditResults.map(_._2).filter(_ >= 0).sum
    // Harness config rides IN the artifact (ADVICE r10): a cross-round
    // ratio is only code-attributable when both artifacts record the same
    // codegen-cache size and warm-up count — without the stamp, a harness
    // change silently reads as a code change.
    // stamp the RESOLVED strategy, not the raw conf: 'auto' on local and
    // explicit 'checkpoint' behave identically and must stamp identically
    val chunkMode = graft.operators.ChunkIds.resolvedStrategy(spark)
    val reuseMode = spark.conf.get(graft.operators.Reuse.ConfKey, "cut")
    val harness =
      s""""codegen_cache":$codegenCache,"warmup_passes":$warmupPasses,"chunk_numbering":"$chunkMode","reuse":"$reuseMode","cpus":$cpus"""
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"audit_total_sec":${num(auditTotal)},$harness}"""
    println(line)
    // The full line above is ~7 KB at 197 queries and the driver's log
    // capture keeps only a ~2 KB tail, truncating it mid-object — the
    // driver has never parsed a bench since the suite outgrew the tail
    // (BENCH_r10..r14 all record parsed:null). Print a compact,
    // tail-survivable summary line LAST (complete line inside any ≥512 B
    // tail) pointing at the committed per-query artifact; the full line
    // stays for humans and for captures big enough to hold it.
    val compact =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","sf":"$sfDir","runs":$runs,"n_queries":${names.size},"audit_total_sec":${num(auditTotal)},"cpus":$cpus,"queries_file":"bench_results/bench_last.json"}"""
    println(compact)
    // the stdout line rides a log capture that has truncated its tail in
    // past rounds; ALSO write the complete per-query artifact (medians +
    // every raw sample) to a committed file so round-over-round
    // comparisons always cover the whole suite. Subset runs
    // (SPARK_GRAFT_BENCH_ONLY) get the artifact too when an explicit
    // SPARK_GRAFT_BENCH_OUT is set — min/samples are what noise-guard
    // reads of a single query need — but never overwrite the default
    // full-suite artifact with a subset.
    if (only.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_OUT")) {
      val outPath = java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_OUT", "bench_results/bench_full.json"))
      if (outPath.getParent != null) java.nio.file.Files.createDirectories(outPath.getParent)
      val perQuery = names.map(_._1).zipWithIndex.map { case (name, i) =>
        val raw = samples(name).map(num).mkString("[", ",", "]")
        val ok  = samples(name).filter(_ >= 0)
        val mn  = if (ok.isEmpty) -1.0 else ok.min
        val (b, stable) = bytesByQuery.getOrElse(name, (Array.fill(5)(-1L), true))
        val unstable = if (stable) "" else ""","bytes_unstable":true"""
        val audit = if (SparkEntry.auditOnlyQueries(name)) ""","audit":true""" else ""
        val bs  = s""","bytes":{"shuffle_write":${b(0)},"shuffle_read":${b(1)},"spill_mem":${b(2)},"spill_disk":${b(3)},"input":${b(4)}$unstable}"""
        val cc  = s""","last_sample_compiles":${compilesByQuery.getOrElse(name, -1L)}"""
        s""""$name":{"median":${num(results(i)._2)},"min":${num(mn)},"samples":$raw$audit$bs$cc}"""
      }.mkString("{", ",", "}")
      val artifact =
        s"""{"total_sec":${num(total)},"audit_total_sec":${num(auditTotal)},"sf":"$sfDir","runs":$runs,"n_queries":${names.size},$harness,"queries":$perQuery}""" + "\n"
      java.nio.file.Files.writeString(outPath, artifact)
      // stable well-known path the compact stdout line points the driver
      // at — full-suite runs only, so a subset probe can't masquerade as
      // the suite artifact
      if (only.isEmpty)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("bench_results/bench_last.json"), artifact)
    }
    spark.stop()
  }
}
