package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.SparkSpec

/** Stupid Backoff bigram LM vs hand-computed arithmetic: a fixture with
  * known counts exercises the seen, backoff-seen-unigram, and
  * backoff-unseen-unigram branches; the corpus run is checked against an
  * independent Scala model.
  */
class BackoffLmSpec extends SparkSpec {
  import spark.implicits._

  private def round6(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("fixture: all three scoring branches match hand arithmetic") {
    // train (src0): "a b a b c" → N=5, V=3; C(a)=2 C(b)=2 C(c)=1
    // bigrams: (a,b)×2, (b,a), (b,c)
    val df = Seq(
      (1L, "a b a b c", "src0"),
      (2L, "a b x c a", "src1") // (a,b) seen; (b,x) unseen w/ unseen x;
                                // (x,c) unseen w/ seen c; (c,a) unseen w/ seen a
    ).toDF("doc_id", "text", "source")
    val got = DocQueries.backoffLm(df)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (id, nb, nbo, avg) = got.head
    assert(id == 2L && nb == 4L && nbo == 3L)
    val seen    = round6(math.log(2.0 / 2.0))             // S(b|a) = C(ab)/C(a)
    val boX     = round6(math.log(0.4 * (0 + 1) / 8.0))   // x unseen: (C+1)/(N+V)=1/8
    val boC     = round6(math.log(0.4 * (1 + 1) / 8.0))   // c seen once
    val boA     = round6(math.log(0.4 * (2 + 1) / 8.0))   // a seen twice
    val expAvg  = round6(
      Seq(seen, boX, boC, boA).map(x => JBigDecimal.valueOf(x).setScale(6))
        .reduce(_.add(_)).doubleValue / 4)
    assert(avg == expAvg, s"avg_logscore $avg vs $expAvg")
  }

  test("corpus run matches the independent Scala model") {
    val Sf = "/root/testdata/sf0.001"
    val rows = graft.core.Graft.documents(spark, Sf)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    def toks(t: String)    = t.split(" ", -1).toSeq
    def srcNum(s: String)  = s.stripPrefix("src").toInt
    val train = rows.filter(r => srcNum(r._2) % 2 == 0)
    val uni   = train.flatMap(r => toks(r._3)).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val bi    = train.flatMap(r => toks(r._3).sliding(2).filter(_.size == 2))
      .groupBy(b => (b.head, b.last)).map { case (k, xs) => k -> xs.size.toLong }
    val n     = uni.values.sum.toDouble
    val v     = uni.size.toDouble
    val expected = rows.filter(r => srcNum(r._2) % 2 == 1).flatMap { case (id, _, text) =>
      val bgs = toks(text).sliding(2).filter(_.size == 2).toSeq
      if (bgs.isEmpty) None
      else {
        val logs = bgs.map { b =>
          bi.get((b.head, b.last)) match {
            case Some(cb) => (round6(math.log(cb.toDouble / uni(b.head))), 0L)
            case None =>
              (round6(math.log(0.4 * (uni.getOrElse(b.last, 0L) + 1) / (n + v))), 1L)
          }
        }
        val avg = round6(logs.map(x => JBigDecimal.valueOf(x._1).setScale(6))
          .reduce(_.add(_)).doubleValue / bgs.size)
        Some(id -> (bgs.size.toLong, logs.map(_._2).sum, avg))
      }
    }.toMap
    val got = graft.SparkEntry.queries("text_backoff_lm")(spark, Sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == expected)
  }
}
