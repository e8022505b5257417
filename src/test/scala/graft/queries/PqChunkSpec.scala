package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization + token-window chunking against independent local
  * models: zero self-quantization error for codebook members, code-range
  * invariants, a vs-chance recall floor, and chunk reconstruction equal to
  * a plain Scala sliding-window model.
  */
class PqChunkSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  test("pq codes: length, range, and zero error for codebook members") {
    val e = graft.core.Graft.embeddings(spark, Sf)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", graft.functions.VectorExpressions.l2_norm(col("v")))
    val coded = EmbedQueries.pqCodes(e)
      .select("vec_id", "v", "codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Int](2)))
    assert(coded.nonEmpty)
    assert(coded.forall { case (_, _, cs) => cs.length == 8 })
    assert(coded.forall { case (_, _, cs) => cs.forall(c => c >= 0 && c < 16) })
    // the sampled codebook IS vectors 0..15: each encodes with zero
    // quantization error (its chosen entry's subvector equals its own)
    val cb = coded.filter(_._1 < 16).sortBy(_._1).map(_._2)
    coded.filter(_._1 < 16).foreach { case (_, v, cs) =>
      (0 until 8).foreach { m =>
        val sub    = v.slice(m * 8, m * 8 + 8).toSeq
        val chosen = cb(cs(m)).slice(m * 8, m * 8 + 8).toSeq
        assert(chosen == sub, s"subspace $m quantized with error")
      }
    }
  }

  test("pq ranking beats chance by an order of magnitude") {
    val rec = graft.SparkEntry.queries("embed_pq_recall")(spark, Sf)
      .agg(avg("recall_at_k")).head().getDouble(0)
    // the synthetic embeddings are near-random (coarse quantizers all
    // score low here — IVF lands in the same band); chance recall@5 is
    // k/corpus ≈ 0.008 at this sf
    assert(rec >= 0.05, s"mean pq recall@5 $rec not above chance band")
  }

  test("chunk_documents equals a plain sliding-window model") {
    val got = graft.SparkEntry.queries("chunk_documents")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3)))
      .toMap
    val docs = graft.core.Graft.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, text) =>
      val tk = text.split(" ", -1)
      val n  = tk.length
      if (n == 0) Nil
      else {
        val lastStart = math.max(0, ((n - 32 + 23) / 24) * 24)
        (0 to lastStart by 24).map { start =>
          val ck = tk.slice(start, math.min(start + 32, n))
          (id, (start / 24).toLong) -> (ck.length.toLong, ck.mkString(" "))
        }
      }
    }.toMap
    assert(got == expected)
    // multi-chunk docs exist in the corpus (the operator is exercised
    // beyond the one-window degenerate case)
    assert(got.keys.exists(_._2 > 0))
  }
}
