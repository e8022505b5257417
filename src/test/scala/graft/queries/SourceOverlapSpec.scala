package graft.queries

import graft.SparkSpec

/** Sketched pairwise source overlap vs an independent Scala model: exact
  * counts must equal plain set arithmetic over 5-gram shingles, every
  * pair must appear exactly once (a < b), and the HLL estimate must sit
  * inside its declared envelope on real corpus data.
  */
class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  test("source_overlap_sketch matches set-arithmetic ground truth") {
    val docs = graft.core.Graft.documents(spark, Sf)
      .select("source", "text").as[(String, String)].collect()
    val bySource: Map[String, Set[String]] = docs
      .groupBy(_._1)
      .map { case (src, rows) =>
        src -> rows.flatMap { case (_, text) =>
          val tk = text.split(" ", -1)
          if (tk.length < 5) Nil else tk.sliding(5).map(_.mkString(" ")).toSeq
        }.toSet
      }
    val sources = bySource.keys.toSeq.sorted
    val expected = (for {
      a <- sources; b <- sources if a < b
    } yield (a, b) -> (bySource(a).size.toLong, bySource(b).size.toLong,
      bySource(a).intersect(bySource(b)).size.toLong)).toMap

    val got = graft.SparkEntry.queries("source_overlap_sketch")(spark, Sf)
      .as[(String, String, Long, Long, Long, Boolean)].collect()
    assert(got.length == expected.size, "one row per unordered pair")
    got.foreach { case (a, b, na, nb, ov, ok) =>
      val (ena, enb, eov) = expected((a, b))
      assert((na, nb, ov) == (ena, enb, eov), s"pair ($a,$b)")
      assert(ok, s"pair ($a,$b) estimate outside its envelope")
    }
  }
}
