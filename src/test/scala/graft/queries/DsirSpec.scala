package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest

import graft.SparkSpec

/** DSIR importance weighting (Xie et al. 2023) + Gumbel top-k resampling,
  * each checked against an independent plain-Scala model of the paper's
  * arithmetic (hashed unigram+bigram bag models, add-one smoothing,
  * Gumbel-max selection) — not against the query's own plan.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(g: String): Long =
    java.lang.Long.parseLong(md5hex(g).take(8), 16) % 4096L

  private def round6(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP).doubleValue

  /** (doc_id, source, bucket→count) for every doc, plus the model weights
    * for raw (non-src0) docs: the spec's ground truth.
    */
  private lazy val model: (Map[Long, (Long, Double)], Set[Long]) = {
    val rows = graft.core.Graft.documents(spark, Sf)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val perDoc = rows.map { case (id, src, text) =>
      val tk = text.split(" ", -1).toSeq
      val grams = tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      (id, src, grams.groupBy(bucket).map { case (b, g) => b -> g.size.toLong })
    }
    val tgt = perDoc.filter(_._2 == "src0")
    val raw = perDoc.filter(_._2 != "src0")
    val tc  = tgt.flatMap(_._3).groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val rc  = raw.flatMap(_._3).groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val tt  = tc.values.sum.toDouble
    val rt  = rc.values.sum.toDouble
    def lr(b: Long): JBigDecimal = JBigDecimal.valueOf(round6(
      math.log((tc.getOrElse(b, 0L) + 1).toDouble / (tt + 4096)) -
        math.log((rc.getOrElse(b, 0L) + 1).toDouble / (rt + 4096)))).setScale(6)
    val weights = raw.map { case (id, _, cs) =>
      val slr = cs.foldLeft(JBigDecimal.ZERO) { case (acc, (b, c)) =>
        acc.add(lr(b).multiply(JBigDecimal.valueOf(c)))
      }
      id -> (cs.values.sum, round6(slr.doubleValue))
    }.toMap
    (weights, tgt.map(_._1).toSet)
  }

  test("dsir_importance_weights matches the independent bag-model arithmetic") {
    val (expected, targetIds) = model
    val got = graft.SparkEntry.queries("dsir_importance_weights")(spark, Sf)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == expected.keySet, "raw-doc coverage")
    assert(got.keySet.intersect(targetIds).isEmpty, "target docs excluded")
    expected.foreach { case (id, (nf, lw)) =>
      assert(got(id)._1 == nf, s"doc $id n_feats")
      assert(got(id)._2 == lw, s"doc $id logw")
    }
  }

  test("dsir resample is the exact Gumbel top-k of the model weights") {
    val (expected, _) = model
    val k = 10
    val modelTop = expected.toSeq.map { case (id, (_, lw)) =>
      val u = (java.lang.Long.parseLong(md5hex(s"$id#dsir").take(8), 16)
        .toDouble + 0.5) / 4294967296.0
      (id, lw, round6(lw - math.log(-math.log(u))))
    }.sortBy { case (id, _, g) => (-g, id) }.take(k)
    val got = DocQueries.dsirResample(graft.core.Graft.documents(spark, Sf), k)
      .as[(Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == modelTop.map(_._1), "selected ids in order")
    got.zip(modelTop).foreach { case ((_, lw, g), (_, elw, eg)) =>
      assert(lw == elw && g == eg, "weight and gumbel score")
    }
    // deterministic noise ⇒ a rerun selects the identical sample
    val again = DocQueries.dsirResample(graft.core.Graft.documents(spark, Sf), k)
      .as[(Long, Double, Double)].collect().toSeq
    assert(again == got, "reproducible across runs")
  }
}
