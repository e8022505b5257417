package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQ8 scalar quantization + SemDeDup: quantization codes against a hand
  * model, recall floor of the quantized ranking, and the semantic-dedup
  * drop list against a local union-find over the exact same pair rule.
  */
class Sq8SemdedupSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  test("sq8 codes: hand-checkable quantization, range, constant dims") {
    val raw = Seq(
      (0L, Array(0f, 10f, 7f)),
      (1L, Array(255f, 10f, 7f)),
      (2L, Array(51f, 10f, 7f))
    ).toDF("vec_id", "embedding")
    val got = EmbedQueries.sq8Codes(raw)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // dim0 spans [0,255] → scale 1, codes = value; dims 1-2 constant → 0
    assert(got(0L) == Seq(0.0, 0.0, 0.0))
    assert(got(1L) == Seq(255.0, 0.0, 0.0))
    assert(got(2L) == Seq(51.0, 0.0, 0.0))
  }

  test("sq8 codes stay in [0, 255] on the real corpus") {
    val bad = EmbedQueries.sq8Codes(graft.core.Graft.embeddings(spark, Sf))
      .filter(exists(col("cq"), c => c < 0 || c > 255 || c =!= floor(c)))
      .count()
    assert(bad == 0)
  }

  test("sq8 ranking keeps a recall floor vs exact brute force") {
    val rec = graft.SparkEntry.queries("embed_sq8_recall")(spark, Sf)
      .agg(avg("recall_at_k")).head().getDouble(0)
    assert(rec >= 0.5, s"mean sq8 recall@5 $rec")
  }

  test("semdedup drop list = non-canonical members of within-cell cosine components") {
    // local model: exact same pair rule (same-label, rounded cosine >= 0.5)
    // + union-find, then drop every id != its component min
    val vecs = graft.core.Graft.embeddings(spark, Sf)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      java.math.BigDecimal.valueOf(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      Seq(a, b) <- vecs.groupBy(_._2).values.flatMap(_.toSeq.sortBy(_._1).combinations(2))
      if cos(a._3, b._3) >= 0.5
    } {
      val (ra, rb) = (find(a._1), find(b._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val exp = vecs.map(_._1).filter(id => find(id) != id)
      .map(id => (id, find(id))).toSet
    val got = graft.SparkEntry.queries("semdedup_drop")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp)
    // canonical members never appear in the drop list
    assert(got.forall { case (id, cid) => id > cid && !got.exists(_._1 == cid) })
  }
}
