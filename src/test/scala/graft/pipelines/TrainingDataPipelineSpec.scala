package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end composition: one planted pathology per pipeline stage, and
  * the attrition report must attribute each drop to the right stage.
  */
class TrainingDataPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int, from: Int = 0): Seq[String] =
    (from until from + n).map(i => f"$prefix$i%03d")

  // planted corpus:
  //  1 good     — survives everything
  //  2 exactdup — byte-identical to 1 (dropped: exact_dedup)
  //  3 neardup  — doc 1 with its last token replaced (same length ⇒ tie
  //               on quality → higher id goes; dropped: near_dedup)
  //  4 degenerate — one token repeated (dropped: heuristic_filters)
  //  5 contaminated — unique text embedding a bench 8-gram (dropped:
  //               decontaminated)
  //  6 spanA / 7 spanB — mostly-different docs sharing a 50-token run;
  //               Jaccard far below the near-dup bar, so both survive to
  //               substring_drop, where 7 (non-canonical) loses the span
  //  8 contained / 9 container — 8's 40 tokens all sit inside 9 (100
  //               tokens): Jaccard ≈ 0.39 (below the LSH verify bar), the
  //               shared run < 50 tokens (below substring_drop) — ONLY
  //               the containment stage catches it; 8 dropped, 9 kept
  private val good   = toks("good", 30).mkString(" ")
  private val near   = (toks("good", 29) :+ "changed").mkString(" ")
  private val degen  = Seq.fill(30)("spam").mkString(" ")
  private val benchG = toks("bench", 8)
  private val contam = (toks("uniq", 11) ++ benchG ++ toks("uniq", 11, 11)).mkString(" ")
  private val shared = toks("shared", 50)
  private val spanA  = (toks("alpha", 70) ++ shared).mkString(" ")
  private val spanB  = (shared ++ toks("beta", 70)).mkString(" ")
  private val contained = toks("cont", 40).mkString(" ")
  private val container = (toks("gamma", 60) ++ toks("cont", 40)).mkString(" ")

  private lazy val docs = Seq(
    (1L, good, "en", "src0"),
    (2L, good, "en", "src1"),
    (3L, near, "en", "src2"),
    (4L, degen, "en", "src3"),
    (5L, contam, "en", "src4"),
    (6L, spanA, "en", "src5"),
    (7L, spanB, "en", "src6"),
    (8L, contained, "en", "src7"),
    (9L, container, "en", "src8")
  ).toDF("doc_id", "text", "lang", "source")

  private lazy val bench = Seq((100L, benchG.mkString(" "))).toDF("doc_id", "text")

  private lazy val result = TrainingDataPipeline.run(docs, bench, lmKeepAtMost = 1e9)

  test("attrition report attributes each planted pathology to its stage") {
    val att = result.attrition.toMap
    assert(att("raw") == 9)
    assert(att("heuristic_filters") == 8)  // -4 (degenerate repetition)
    assert(att("exact_dedup") == 7)        // -2 (byte dup of 1)
    assert(att("near_dedup") == 6)         // -3 (near dup of 1, tie → higher id)
    assert(att("containment_drop") == 5)   // -8 (near-subset of 9)
    assert(att("substring_drop") == 5)     // span cut, no doc lost
    assert(att("decontaminated") == 4)     // -5 (bench 8-gram)
    assert(result.attrition.map(_._1) == Seq("raw", "heuristic_filters",
      "exact_dedup", "near_dedup", "containment_drop", "substring_drop",
      "decontaminated"))
  }

  test("writeShards emits per-shard dirs with model-exact membership and positions") {
    import java.security.MessageDigest
    def md5hex(s: String) = MessageDigest.getInstance("MD5").digest(s.getBytes)
      .map("%02x".format(_)).mkString
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    TrainingDataPipeline.writeShards(docs, out, nShards = 4)
    val back = spark.read.parquet(out)
      .select("doc_id", "shard", "pos_in_shard", "tok_offset").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(back.map(_._1).toSet == docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    back.groupBy(_._2).foreach { case (shard, rows) =>
      val exp = rows.map(_._1).sortBy(id => md5hex(id.toString))
      rows.foreach { case (id, sh, _, _) =>
        assert(java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 4 == sh)
      }
      assert(rows.sortBy(_._3).map(_._1).toSeq == exp.toSeq, s"shard $shard order")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
      // offsets are the exclusive prefix sums of token counts in ord order
      val toks = docs.collect().map(r => r.getLong(0) -> r.getString(1).split(" ").length).toMap
      var cum = 0L
      exp.zip(rows.sortBy(_._3)).foreach { case (id, row) =>
        assert(row._4 == cum, s"shard $shard doc $id offset")
        cum += toks(id)
      }
    }
  }

  test("each stage materializes the corpus once (no O(stages²) recompute)") {
    val acc = spark.sparkContext.longAccumulator("source_scans")
    val tap = udf { (t: String) => acc.add(1); t }
    val tapped = docs.withColumn("text", tap(col("text")))
    val res = TrainingDataPipeline.run(tapped, bench, lmKeepAtMost = 1e9)
    res.corpus.count()
    // the source is evaluated only while the "raw" stage checkpoint
    // materializes — every later stage (and the attrition counts) reads
    // checkpointed blocks. Unchecked, each of ~7 stage counts re-executed
    // the lineage from the source and this accumulator hit ~stages×rows.
    assert(acc.value <= 2L * 9,
      s"source text evaluated ${acc.value} times for 9 rows — stages are recomputing")
  }

  test("surviving corpus is exactly the planted survivors") {
    val rows = result.corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set(1L, 6L, 7L, 9L))
    // canonical span holder keeps its text; non-canonical lost the run
    assert(rows(6L) == spanA)
    assert(rows(7L) == toks("beta", 70).mkString(" "))
    assert(rows(1L) == good)
    // the container keeps its full text; the contained doc is gone
    assert(rows(9L) == container)
  }
}
