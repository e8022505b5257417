package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest

import graft.SparkSpec

/** Curriculum staging vs an independent model: stages from the quality
  * formula, md5-ordered positions, and a global step that is an exact
  * permutation of 1..N concatenating stages best-first.
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def round6(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("curriculum_order equals the staged md5-permutation model") {
    val docs = graft.core.Graft.documents(spark, Sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val stop = graft.functions.TextFunctions.Stopwords.toSet
    val staged = docs.map { case (id, text) =>
      val tk = text.split(" ", -1)
      val sr = round6(tk.count(stop).toDouble / tk.length)
      val qs = round6(math.min(tk.length.toDouble / 100.0, 1.0) * 0.5 + (1.0 - sr) * 0.5)
      (id, math.min(math.floor(qs * 5).toInt, 4), md5hex(s"$id#curr"))
    }
    val expected = staged.groupBy(_._2).toSeq.flatMap { case (stage, rows) =>
      rows.sortBy(r => (r._3, r._1)).zipWithIndex.toSeq.map { case ((id, _, _), i) =>
        id -> (stage, (i + 1).toLong)
      }
    }.toMap
    val offsets = staged.groupBy(_._2).map { case (st, rs) => st -> rs.length }
    def off(st: Int) = offsets.filter(_._1 > st).values.sum.toLong

    val got = graft.SparkEntry.queries("curriculum_order")(spark, Sf)
      .as[(Long, Int, Long, Long)].collect()
    assert(got.length == docs.length)
    got.foreach { case (id, stage, pos, step) =>
      val (est, epos) = expected(id)
      assert(stage == est, s"doc $id stage")
      assert(pos == epos, s"doc $id pos_in_stage")
      assert(step == off(stage) + pos, s"doc $id global_step")
    }
    // global_step is a dense permutation of 1..N
    assert(got.map(_._4).sorted.toSeq == (1L to docs.length).toSeq)
    // every doc in a cleaner stage trains strictly before any dirtier stage
    val byStage = got.groupBy(_._2).map { case (st, rs) => st -> rs.map(_._4) }
    byStage.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(lo, hi) => assert(byStage(hi).max < byStage(lo).min, s"stage $hi before $lo")
      case _           =>
    }
  }
}
