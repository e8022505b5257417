package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table plumbing for the graft engine.
  *
  * Mirrors the operating envelope of the reference service entry point
  * (`/root/reference/apps/kafka-to-nexus.cpp:187-412`) translated to Spark:
  * one SparkSession is the "service", tables stand in for topics.
  */
object Graft {

  /** Build a local session tuned for the test harness (local[N], AQE on,
    * shuffle partitions sized to cores — NOT the 200 default, which at
    * local scale just multiplies task overhead; on a real cluster this
    * is set per deployment).
    */
  def session(appName: String = "graft", cpus: String = "32"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // the driver's synthetic events table stores TIMESTAMP(NANOS) which
      // Spark 4 otherwise rejects; reading it as raw ns-since-epoch Long
      // matches the reference's i64-ns timestamp model exactly
      // (/root/reference/src/Stream/SourceFilter.cpp:68-71)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one of the driver-provided parquet tables. Defensively sets the
    * nanos-as-long flag so this also works on sessions the harness created
    * without [[session]] (the flag is dynamic SQLConf).
    *
    * Plain read — NO scan fanout. The r14 round fanned out EVERY table
    * read here and the suite-wide A/B showed the policy is only a win for
    * operators with expensive per-row map work (tokenize / n-gram explode
    * / flatbuffer decode / vector distance): 68 such queries gained
    * 1.1-4.6×, while 83 scan-light queries (plain aggregates, projections,
    * window stats) paid a 10-150% round-robin-exchange tax. Whether the
    * fanout pays is a property of the OPERATOR, not of the table or its
    * size, so the map-heavy call sites opt in explicitly via
    * [[fannedTable]] / [[documentsFanned]] / [[embeddingsFanned]] /
    * [[eventsFanned]] and everything else reads plain.
    * `spark.graft.scan.fanout=all` restores the r14 fan-everything policy
    * for A/B probes.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = rawTable(spark, dir, name)
    if (fanoutMode(spark) == "all") scanFanout(spark, df, s"$dir/$name.parquet")
    else df
  }

  private def rawTable(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** [[table]] wrapped by [[scanFanout]]: when the file layout caps scan
    * parallelism far below the session's cores (the single-file,
    * single-row-group testdata shape — a parquet row group is the atomic
    * split unit, so no `maxPartitionBytes` setting can parallelize it), a
    * round-robin repartition fans the rows out so the map-side work
    * (tokenize/explode/decode/partial-agg) uses the machine instead of one
    * core. Scale-adaptive, not a local constant: the fanout only fires
    * when the estimated scan-task count is below the session parallelism,
    * which a corpus-sized input never is — at 100 TB the read plans
    * thousands of splits and this is the identity function. Opt-in per
    * call site: only operators whose per-row work funds the exchange
    * should read through this (see [[table]]).
    */
  def fannedTable(spark: SparkSession, dir: String, name: String): DataFrame =
    scanFanout(spark, rawTable(spark, dir, name), s"$dir/$name.parquet")

  /** Fanout policy conf: `auto` (default — fan out at the opt-in call
    * sites) | `off` (never fan) | `all` (fan EVERY table read — the r14
    * policy, kept for A/B probes) | a positive integer (explicit fanout
    * width at the opt-in sites, for width sweeps). Any other value is
    * reported once and treated as `auto`.
    */
  val FanoutConfKey = "spark.graft.scan.fanout"

  private val badModeWarned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def fanoutMode(spark: SparkSession): String = {
    val raw = spark.conf.get(FanoutConfKey, "auto")
    raw match {
      case "auto" | "off" | "all" => raw
      case n if n.nonEmpty && n.forall(_.isDigit) => raw
      case other =>
        if (badModeWarned.add(other))
          System.err.println(
            s"[graft] $FanoutConfKey='$other' is not auto|off|all|<width>; treating as auto")
        "auto"
    }
  }

  /** Minimum compressed input bytes funding one fanned-out task (conf:
    * `spark.graft.scan.fanout.minBytesPerTask`, default 16 KiB — parquet
    * decompresses ~4×, so a task gets ≥ ~64 KiB of rows to chew on;
    * below that the per-task overhead outweighs the parallelism).
    */
  val FanoutMinBytesKey = "spark.graft.scan.fanout.minBytesPerTask"

  // per-path listing cache: the suite re-reads each table thousands of
  // times and HDFS-API listing, while cheap locally, is a remote call on
  // a real cluster. Keyed by path alone — table inputs are assumed
  // immutable for the session (the driver testdata is; a rewrite at a
  // different size would only make the fanout-width heuristic stale,
  // never the results).
  private val sizeCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Round-robin fanout of a scan whose file layout under-parallelizes
    * (see [[fannedTable]]). Row-count-preserving and deterministic (Spark
    * sorts before round-robin repartition — SPARK-23207), so results are
    * unchanged for the partition-order-independent query surface; filters
    * still reach the parquet scan because the optimizer pushes predicates
    * through Repartition (spec'd in ScanFanoutSpec "filters still push to
    * the parquet scan", and visible in the committed `plans/r15`
    * after-files: PushedFilters unchanged vs the un-fanned plans).
    */
  private def scanFanout(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val mode = fanoutMode(spark)
    if (mode == "off") return df
    val bytes = sizeCache.computeIfAbsent(path, p => {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      try fs.getContentSummary(hp).getLength
      catch { case scala.util.control.NonFatal(_) => 0L }
    })
    val cores = spark.sparkContext.defaultParallelism
    // Spark's own byte-suffix parser: handles "134217728", "128m", "128MB"
    val maxPartitionBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    // what the scan will plan on its own (files.maxPartitionBytes splits;
    // row groups may make even this an over-estimate, never an under-)
    val plannedScanTasks = math.max(1L, (bytes + maxPartitionBytes - 1) / maxPartitionBytes)
    if (plannedScanTasks >= cores) return df // cluster regime: scan already parallel
    val minBytesPerTask = spark.conf.get(FanoutMinBytesKey, "16384").toLong
    // auto cap = cores / divisor (default 4), NOT all cores: contract
    // queries hang several independent branches off one table and AQE
    // runs those query stages CONCURRENTLY, so a per-stage width of
    // cores/4 already saturates the machine while full-width stages
    // oversubscribe it — measured on a 14-query subset (min-of-5 each,
    // same window): width 8 = 18.5 s, 16 = 19.4 s, 32 = 22.6 s,
    // no fanout = 24.3 s on 32 cores.
    val divisor = spark.conf.get(FanoutDivisorKey, "4").toInt
    val cap = if (mode == "auto" || mode == "all") math.max(2L, (cores / divisor).toLong)
              else mode.toLong // explicit width for A/B probes
    val target = math.min(cap, bytes / math.max(1L, minBytesPerTask)).toInt
    if (target <= plannedScanTasks) df else df.repartition(target)
  }

  /** Fanout width divisor for `auto` (conf, default 4): cap = cores/divisor. */
  val FanoutDivisorKey = "spark.graft.scan.fanout.divisor"

  /** The events table with `ts` normalized to the engine's i64 ns-since-epoch
    * contract (the reference's timestamp model,
    * `/root/reference/src/Stream/SourceFilter.cpp:68-71`), regardless of the
    * physical parquet type the driver generated it with:
    *
    *  - `LongType`: already ns (TIMESTAMP(NANOS) read via
    *    `spark.sql.legacy.parquet.nanosAsLong`) — pass through untouched so
    *    the column stays a bare attribute and every predicate on it pushes
    *    down to the scan.
    *  - `TimestampType` (µs instant): `unix_micros(ts) * 1000L` — instant
    *    semantics, session-timezone-independent.
    *  - `TimestampNTZType` (µs wall clock — what pyarrow `timestamp[us]`
    *    without a zone reads as): the wall clock IS the UTC instant the
    *    driver wrote, so micros are extracted with PURE LOCAL arithmetic
    *    (`timestampdiff` against the NTZ epoch). Casting NTZ→Timestamp
    *    first would re-interpret the wall clock in
    *    `spark.sql.session.timeZone` and silently shift every ts by the
    *    zone offset on any session not pinned to UTC.
    *
    * Downstream code (StreamQueries/AnalyticsQueries, ~30 call sites) always
    * sees a Long of ns, both data vintages. All other columns are passed
    * through by name, so nested-schema pruning and pushdown on
    * `event_type`/`user_id` are unaffected.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEvents(spark, table(spark, dir, "events"))

  /** [[events]] over a fanned read — for the flatbuffer encode/decode
    * roundtrips whose per-row UDF work dwarfs the exchange (see [[table]]).
    */
  def eventsFanned(spark: SparkSession, dir: String): DataFrame =
    normalizeEvents(spark, fannedTable(spark, dir, "events"))

  private def normalizeEvents(spark: SparkSession, raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) | None => raw
      case Some(TimestampType) =>
        raw.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case Some(TimestampNTZType) =>
        raw.withColumn("ts",
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * 1000L)
      case Some(other) =>
        throw new IllegalStateException(
          s"events.ts: cannot normalize physical type $other to the i64-ns contract " +
            "(expected LongType ns, TimestampType, or TimestampNTZType) — driver testdata drift?")
    }
  }
  /** Schema-drift canary: one readable line per driver table with its
    * physical parquet schema, plus a forced [[events]] normalization so an
    * un-normalizable `ts` vintage surfaces as a LOUD `DRIFT ERROR` line
    * up front instead of 30 opaque query errors deep in the run. Round 5
    * lost the whole stream-kernel suite to a silent driver-side
    * regeneration of `events.parquet` (TIMESTAMP(NANOS) → timestamp[us]);
    * this makes the next drift one readable line in the log.
    *
    * The canary NEVER throws: killing Verify/Bench here would turn an
    * events-only drift into total loss of the round's artifacts (every
    * non-events query still works, and the events queries record their
    * individual errors in verify_errors.json). Missing tables are
    * likewise reported, not fatal — the driver controls the testdata set.
    */
  def schemaCanary(spark: SparkSession, dir: String): Seq[String] = {
    val tables = Seq("events", "documents", "embeddings", "lineitem", "orders",
      "customer", "nation", "region", "supplier", "part")
    tables.map { t =>
      try {
        val physical = table(spark, dir, t).schema
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
        val normalized =
          if (t == "events") {
            try {
              val tsType = events(spark, dir).schema
                .find(_.name == "ts").map(_.dataType.simpleString).getOrElse("<absent>")
              s" | normalized ts:$tsType"
            } catch {
              case e: IllegalStateException => s" | DRIFT ERROR: ${e.getMessage}"
            }
          } else ""
        s"[schema] $t: $physical$normalized"
      } catch {
        case e: Throwable => s"[schema] $t: UNREADABLE (${e.getMessage})"
      }
    }
  }

  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  /** Fanned payload-table reads for map-heavy operators (see [[table]]). */
  def documentsFanned(spark: SparkSession, dir: String): DataFrame  = fannedTable(spark, dir, "documents")
  def embeddingsFanned(spark: SparkSession, dir: String): DataFrame = fannedTable(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
}
