package graft.operators

import graft.SparkSpec

/** Chunked two-level prefix sum: must equal the single-window running sum
  * on every input (physical re-arrangement, not a semantic variant), with
  * the hot key actually split across many chunks.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("hot key across many chunks: exclusive running sum matches hand math") {
    // key "hot": 10_000 rows, value = 1 each, ord = zero-padded index so
    // lexicographic order IS numeric order → cum_before(i) = i exactly.
    // key "cold": three rows checking the first-row zero and a >1 value.
    val rows = (0 until 10000).map(i => ("hot", f"$i%06d", 1L)) ++
      Seq(("cold", "a", 5L), ("cold", "b", 7L), ("cold", "c", 11L))
    val df = rows.toDF("k", "ord", "v").repartition(8)
    val out = PrefixSum.runningSumExclusive(df, Seq("k"), Seq("ord"), "v", "cum", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(out(("cold", "a")) == 0L)
    assert(out(("cold", "b")) == 5L)
    assert(out(("cold", "c")) == 12L)
    assert(out(("hot", "000000")) == 0L)
    (1 until 10000 by 997).foreach { i =>
      assert(out(("hot", f"$i%06d")) == i.toLong, s"row $i")
    }
    assert(out.size == 10003)
  }

  test("null keys keep their rows and their carry (the single-window form " +
    "groups nulls into a partition; the stitch join must be null-safe)") {
    // a null key with enough rows to span chunks: a plain USING equi-join
    // back from the offsets frame never matches the null key — losing the
    // carry and, being inner, dropping the rows entirely
    val rows = (0 until 500).map(i => (Option.empty[String], f"$i%06d", 1L)) ++
      (0 until 500).map(i => (Some("k1"), f"$i%06d", 2L))
    val df = rows.toDF("k", "ord", "v").repartition(8)
    val out = PrefixSum.runningSumExclusive(df, Seq("k"), Seq("ord"), "v", "cum", 16)
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(out.size == 1000, "null-key rows must survive the stitch join")
    assert(out((None, "000000")) == 0L)
    (1 until 500 by 97).foreach { i =>
      assert(out((None, f"$i%06d")) == i.toLong, s"null-key row $i carry")
    }
    assert(out((Some("k1"), "000499")) == 998L)
  }

  test("rejects non-integral value columns (re-grouped double sums drift)") {
    val df = Seq(("a", "x", 1.5)).toDF("k", "ord", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.runningSumExclusive(df, Seq("k"), Seq("ord"), "v", "cum", 4)
    }
  }

  test("skewsafe query variants equal their window-based primaries on driver testdata") {
    val dir = "/root/testdata/sf0.001"
    def rows(name: String): Set[String] =
      graft.SparkEntry.queries(name)(spark, dir).collect()
        .map(_.toSeq.mkString("|")).toSet
    assert(rows("sample_token_budget_skewsafe") == rows("sample_token_budget"))
    assert(rows("pack_sequences_skewsafe") == rows("pack_sequences"))
  }

  test("plan: chunk numbering pinned; no window keyed by the bare hot-key column over the stream") {
    val plan = graft.SparkEntry.queries("pack_sequences_skewsafe")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // the range-partitioned chunk frame is pinned via localCheckpoint (two
    // consumers must agree on __pid — see the operator note), so the plan
    // bottoms out in the checkpointed RDD scan rather than showing the
    // range exchange (SkewSafeSessionizeSpec asserts rangepartitioning on
    // the linear-lineage variant, where it stays visible)
    assert(plan.contains("Scan ExistingRDD"),
      "expected the pinned (checkpointed) chunk frame under the windows")
    // the raw-stream window must be (pid, source); the stitch window
    // (source, pid ASC) over the per-chunk totals is the only bare-source one
    assert("""windowspecdefinition\(source#\d+, doc_id""".r.findFirstIn(plan).isEmpty,
      "found the hot-key window shape the chunked prefix sum exists to avoid")
    assert("""windowspecdefinition\(__pid#\d+, source""".r.findFirstIn(plan).nonEmpty)
  }
}
