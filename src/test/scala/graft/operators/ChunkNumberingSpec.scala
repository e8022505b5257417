package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The chunk+stitch operators must be numbering-strategy-agnostic
  * (ChunkIds: `checkpoint` vs `sampled` produce identical OUTPUT), and
  * must survive HIGH KEY CARDINALITY: the stitch frame holds one row per
  * (chunk, key), so with 10⁶ distinct keys a forced broadcast of it would
  * be a driver OOM at cluster scale — the join must carry no broadcast
  * hint and the plan must leave the choice to AQE.
  */
class ChunkNumberingSpec extends SparkSpec {
  import spark.implicits._

  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set(ChunkIds.ConfKey, mode)
    try body finally spark.conf.unset(ChunkIds.ConfKey)
  }

  private val prefixRows = ((0 until 10000).map(i => ("hot", f"$i%06d", 1L)) ++
    Seq(("cold", "a", 5L), ("cold", "b", 7L), ("cold", "c", 11L)))

  private def prefixOut(chunks: Int = 64): Map[(String, String), Long] =
    PrefixSum.runningSumExclusive(
      prefixRows.toDF("k", "ord", "v").repartition(8),
      Seq("k"), Seq("ord"), "v", "cum", chunks)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap

  private def asofOut(): Map[Long, Option[Double]] = {
    val purchases = (0 until 3000).map(i => (i.toLong, 0L, i.toLong * 1000000L)) ++
      Seq((9001L, 1L, 5L), (9002L, 1L, 50L), (9003L, 2L, 7L))
    val clicks = Seq(
      (0L, 0L, 111.0), (0L, 1000000000L, 222.0), (0L, 2500000000L, 333.0),
      (1L, 20L, 444.0), (2L, 7L, 555.0))
    AsofJoin.asofJoinChunked(
      purchases.toDF("event_id", "user_id", "ts_us"),
      clicks.toDF("user_id", "ts_us", "click_value"),
      Seq("user_id"), "ts_us", Seq("click_value"), 64)
      .select("event_id", "click_value").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
  }

  test("sampled numbering: prefix sum output identical to checkpoint numbering") {
    val cp = withMode("checkpoint")(prefixOut())
    val sm = withMode("sampled")(prefixOut())
    assert(sm.size == 10003)
    assert(sm == cp)
    // and both match the hand math, not just each other
    assert(sm(("hot", "007777")) == 7777L)
    assert(sm(("cold", "c")) == 12L)
  }

  test("sampled numbering: chunked as-of output identical to checkpoint numbering") {
    val cp = withMode("checkpoint")(asofOut())
    val sm = withMode("sampled")(asofOut())
    assert(sm.size == 3003)
    assert(sm == cp)
    assert(sm(2999L).contains(333.0)) // carry cascaded across click-free chunks
    assert(sm(9001L).isEmpty)         // left row before any right row
  }

  test("sampled numbering materializes nothing: no checkpointed RDD scan in the plan") {
    withMode("sampled") {
      val df = PrefixSum.runningSumExclusive(
        prefixRows.toDF("k", "ord", "v"), Seq("k"), Seq("ord"), "v", "cum", 16)
      // checkpoint mode bottoms out in `Scan ExistingRDD` (PrefixSumSpec
      // pins that); sampled mode must stay a pure recomputable lineage
      assert(!df.queryExecution.executedPlan.toString.contains("Scan ExistingRDD"),
        "sampled numbering must not materialize the chunk frame")
    }
  }

  test("1e6 distinct keys: stitch join carries no broadcast hint and completes") {
    // one million keys, two rows each — the stitch frame itself holds ~1e6
    // rows, the exact regime where a forced broadcast is a driver OOM at
    // cluster scale. The logical plan must carry NO hint (AQE free to pick
    // a shuffle join from measured sizes), and the job must complete with
    // exact results, checked DISTRIBUTED (no 2M-row collect).
    val n = 1000000L
    val df = spark.range(n).select(
        col("id").as("k"), lit("a").as("ord"), (col("id") % 7).cast("long").as("v"))
      .unionAll(spark.range(n).select(
        col("id").as("k"), lit("b").as("ord"), lit(1L).as("v")))
    val out = PrefixSum.runningSumExclusive(df, Seq("k"), Seq("ord"), "v", "cum", 32)
    assert(!out.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "stitch join must not force a broadcast (1e6-key stitch frame)")
    // per key: cum('a') = 0, cum('b') = k % 7 → sum over all rows of cum
    // = Σ_{k<n} (k % 7); rows where cum is wrong would break either sum
    val got = out.agg(
      sum(col("cum")).as("s"), count(lit(1)).as("c"),
      sum(when(col("ord") === "a" && col("cum") =!= 0L, 1).otherwise(0)).as("badA"))
      .collect()(0)
    val expect = (0L until n).map(_ % 7).sum
    assert(got.getLong(1) == 2 * n)
    assert(got.getLong(2) == 0L, "every first-of-key row must have cum = 0")
    assert(got.getLong(0) == expect)
  }

  test("sampled numbering: null range fields bucket consistently (nulls first)") {
    withMode("sampled") {
      // nulls in BOTH the data and (necessarily) the boundary sample:
      // Spark's interpreted row ordering sorts nulls first, so null-keyed
      // rows must land in the lowest chunks, consistently across reads
      val rows = (0 until 2000).map(i =>
        (if (i % 5 == 0) null else s"k${i % 40}",
         if (i % 7 == 0) null.asInstanceOf[java.lang.Long] else java.lang.Long.valueOf(i.toLong)))
      val df = ChunkIds.withChunkIds(
        rows.toDF("k", "o"), Seq(col("k"), col("o")), 16)
      val got = df.select("k", "o", "__pid").collect()
        .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getLong(1))) -> r.getInt(2))
      // consistent: same key tuple → same pid on a second evaluation
      val again = df.select("k", "o", "__pid").collect()
        .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getLong(1))) -> r.getInt(2))
      assert(got.toMap == again.toMap)
      // monotone under nulls-first lexicographic order
      implicit val ordS: Ordering[Option[String]] = Ordering.Option(Ordering.String)
      implicit val ordL: Ordering[Option[Long]] = Ordering.Option(Ordering.Long)
      val sorted = got.toMap.toSeq.sortBy(_._1).map(_._2)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
        "__pid must be monotone with null fields ordered first")
      // and the null-key rows occupy the lowest chunk(s)
      val nullPids = got.toMap.collect { case ((None, _), pid) => pid }
      assert(nullPids.nonEmpty && nullPids.max <= sorted.max)
      assert(nullPids.max <= got.toMap.collect { case ((Some(_), _), pid) => pid }.min)
    }
  }

  test("auto default: local master resolves to the checkpoint strategy") {
    // no conf set → auto; on a local master that must be the pinned
    // range-exchange numbering (ExistingRDD scan), keeping bench-mode
    // behavior identical to the pre-auto default
    assert(spark.conf.getOption(ChunkIds.ConfKey).isEmpty)
    val df = ChunkIds.withChunkIds(
      prefixRows.toDF("k", "ord", "v"), Seq(col("k"), col("ord")), 8)
    assert(df.queryExecution.analyzed.toString.contains("LogicalRDD"),
      "auto on local[*] must pick the checkpoint strategy")
  }

  test("512 chunks: sampled numbering stays correct at high chunk counts") {
    // the r10 shape unrolled one struct compare per boundary — O(chunks)
    // generated code that blows the whole-stage-codegen method limit past
    // a few hundred chunks. The binary-search expression must stay exact
    // (equivalent to checkpoint numbering's output) at cluster-scale
    // chunk counts.
    val cp = withMode("checkpoint")(prefixOut(512))
    val sm = withMode("sampled")(prefixOut(512))
    assert(sm.size == 10003)
    assert(sm == cp)
    assert(sm(("hot", "007777")) == 7777L)
  }

  test("sampled numbering: __pid monotone + consistent across two reads") {
    withMode("sampled") {
      val df = ChunkIds.withChunkIds(
        prefixRows.toDF("k", "ord", "v"), Seq(col("k"), col("ord")), 64)
      // consistency: the id derives purely from the row, so re-evaluating
      // the frame twice (the stitch operators' read pattern) must agree
      val a = df.select("k", "ord", "__pid").collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
      val b = df.select("k", "ord", "__pid").collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
      assert(a == b)
      // monotone: sorting by (k, ord) must never see __pid decrease
      val sorted = prefixRows.sortBy(r => (r._1, r._2)).map(r => a((r._1, r._2)))
      assert(sorted.zip(sorted.tail).forall { case (x, y) => x <= y },
        "__pid must be monotone in the lexicographic range order")
    }
  }

  test("1e6 distinct keys: chunked as-of carries no broadcast hint and fills exactly") {
    val n = 1000000L
    val left = spark.range(n).select(
      col("id").as("event_id"), col("id").as("user_id"), lit(2L).as("ts_us"))
    val right = spark.range(n).select(
      col("id").as("user_id"), lit(1L).as("ts_us"),
      (col("id") * 2).cast("double").as("click_value"))
    val out = AsofJoin.asofJoinChunked(
      left, right, Seq("user_id"), "ts_us", Seq("click_value"), 32)
    assert(!out.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "stitch join must not force a broadcast (1e6-key stitch frame)")
    val got = out.agg(
      count(lit(1)).as("c"),
      sum(when(col("click_value") =!= col("user_id") * 2.0, 1).otherwise(0)).as("bad"),
      sum(when(col("click_value").isNull, 1).otherwise(0)).as("nulls"))
      .collect()(0)
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == 0L)
    assert(got.getLong(2) == 0L)
  }
}
