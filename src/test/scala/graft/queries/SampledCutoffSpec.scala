package graft.queries

import graft.SparkSpec

/** The sampled-cutoff production forms (orders_value_quartiles,
  * lm_quality_buckets, quality_percentile_by_source) against their exact
  * siblings: banding must respect the value order BY CONSTRUCTION
  * (cutoff comparison, no row counting), and the sampled assignment must
  * agree with the exact one away from cutoff boundaries — the
  * measured price of dropping the per-group partition sort.
  */
class SampledCutoffSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.01"

  test("orders_value_quartiles: banding monotone in price, high agreement with exact ntile") {
    val sampled = graft.SparkEntry.queries("orders_value_quartiles")(spark, Sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(sampled.nonEmpty)
    // within a priority, a higher price can never land in a LOWER band
    sampled.map(_._2).groupBy(_._1).foreach { case (pri, rs) =>
      rs.sortBy(-_._2).sliding(2).foreach {
        case Array((_, p1, q1), (_, p2, q2)) =>
          assert(q1 <= q2 || p1 == p2, s"$pri: ($p1,$q1) before ($p2,$q2)")
        case _ =>
      }
    }
    val exact = graft.SparkEntry.queries("orders_value_quartiles_exact")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val agree = sampled.count { case (k, (_, _, q)) => exact(k) == q }
    // only rows between the true and sampled cutoffs can disagree —
    // a few % at a 10% sample of ~3000-row groups
    assert(agree.toDouble / sampled.length >= 0.9,
      s"agreement ${agree.toDouble / sampled.length}")
  }

  test("lm_quality_buckets: same doc set as exact, order respected, majority agreement") {
    val sampled = graft.SparkEntry.queries("lm_quality_buckets")(spark, Sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getString(3)))
    val exact = graft.SparkEntry.queries("lm_quality_buckets_exact")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(sampled.map(_._1).toSet == exact.keySet)
    val ord = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    sampled.map(_._2).groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.forall(r => ord.contains(r._3)), lang)
      // cutoff semantics: bucket is monotone in nll within a language
      rs.sortBy(_._2).sliding(2).foreach {
        case Array((_, n1, b1), (_, n2, b2)) =>
          assert(ord(b1) <= ord(b2) || n1 == n2, s"$lang: ($n1,$b1) vs ($n2,$b2)")
        case _ =>
      }
    }
    val agree = sampled.count { case (k, (_, _, b)) => exact(k) == b }
    assert(agree.toDouble / sampled.length >= 0.7,
      s"agreement ${agree.toDouble / sampled.length}")
  }

  test("quality_percentile_by_source: approx rank in [0,1], monotone, close to exact") {
    // sf0.1: the ECDF error is sampling noise ~ sqrt(F(1−F)/n_s); the
    // sf0.01 corpus (500 docs → ~20 samples/source) sits at ~0.15 mean
    // error by that formula — measure where the sample is meaningful
    val Sf = "/root/testdata/sf0.1"
    val sampled = graft.SparkEntry.queries("quality_percentile_by_source")(spark, Sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getDouble(3)))
    sampled.foreach { case (id, (_, _, p)) =>
      assert(p >= 0.0 && p <= 1.0, s"doc $id rank $p")
    }
    sampled.map(_._2).groupBy(_._1).foreach { case (src, rs) =>
      rs.sortBy(_._2).sliding(2).foreach {
        case Array((_, q1, p1), (_, q2, p2)) =>
          assert(p1 <= p2 || q1 == q2, s"$src: ($q1,$p1) vs ($q2,$p2)")
        case _ =>
      }
    }
    val exact = graft.SparkEntry.queries("quality_percentile_by_source_exact")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val meanErr = sampled.map { case (k, (_, _, p)) => math.abs(p - exact(k)) }
      .sum / sampled.length
    // DKW: sup|F̂−F| ≈ sqrt(ln(2/δ)/2n) — a 20% sample of ~1000-row
    // sources keeps the mean ECDF error well under 0.1
    assert(meanErr <= 0.1, s"mean |approx − exact| = $meanErr")
  }
}
