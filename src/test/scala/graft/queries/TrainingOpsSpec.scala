package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Training-set assembly + filter operators added in round 3:
  * deterministic fractional upsampling, shard planning, winnowing
  * fingerprints, and the corpus-trained char-trigram LM score. Each is
  * checked against an independent Scala model (not against itself).
  */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def md5bucket(id: Long, mod: Long): Long =
    java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % mod

  // --- sample_upsample ------------------------------------------------

  test("sample_upsample: per-doc copy count matches the md5-fraction model") {
    val rows = graft.SparkEntry.queries("sample_upsample")(spark, Sf)
      .groupBy("doc_id", "source", "n_copies")
      .agg(count(lit(1)).as("n_rows"), min("epoch").as("e0"), max("epoch").as("e1"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id     = r.getLong(0)
      val srcNum = r.getString(1).stripPrefix("src").toInt
      val w10    = Seq(5L, 11L, 17L, 23L)(srcNum % 4)
      val exp    = w10 / 10 + (if (md5bucket(id, 10) < w10 % 10) 1 else 0)
      assert(r.getLong(2) == exp, s"doc $id: n_copies")
      assert(r.getLong(3) == exp, s"doc $id: one row per epoch")
      assert(r.getLong(4) == 1L && r.getLong(5) == exp, s"doc $id: epochs 1..n")
    }
  }

  test("sample_upsample: zero-copy docs are absent") {
    val present = graft.SparkEntry.queries("sample_upsample")(spark, Sf)
      .select("doc_id").distinct().as[Long].collect().toSet
    val all = graft.core.Graft.documents(spark, Sf)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect()
    all.foreach { case (id, src) =>
      val w10 = Seq(5L, 11L, 17L, 23L)(src.stripPrefix("src").toInt % 4)
      val exp = w10 / 10 + (if (md5bucket(id, 10) < w10 % 10) 1 else 0)
      assert(present.contains(id) == (exp >= 1), s"doc $id presence")
    }
  }

  // --- shard_plan -----------------------------------------------------

  test("shard_plan: ranks are dense per shard and offsets are exact prefix sums") {
    val plan = graft.SparkEntry.queries("shard_plan")(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(plan.nonEmpty)
    plan.groupBy(_._1).foreach { case (shard, rows) =>
      // every doc hashed into this shard, ordered by its md5 hex
      val expOrder = rows.map(t => (md5hex(t._2.toString), t._2, t._5)).sortBy(_._1)
      rows.foreach(t => assert(md5bucket(t._2, 8) == shard, s"doc ${t._2} shard"))
      val got = rows.sortBy(_._3)
      assert(got.map(_._2).toSeq == expOrder.map(_._2).toSeq, s"shard $shard order")
      assert(got.map(_._3).toSeq == (1L to rows.length).toSeq, s"shard $shard ranks")
      var cum = 0L
      got.zip(expOrder).foreach { case (g, e) =>
        assert(g._4 == cum, s"shard $shard doc ${g._2} tok_offset")
        cum += e._3
      }
    }
  }

  // --- text_winnow_fingerprint ---------------------------------------

  private val P = BigInt("2305843009213693951") // 2^61 - 1

  private def tokHash(t: String): BigInt =
    t.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) => (h * 257 + (b & 0xff)) mod P)

  private def gramHashes(toks: Seq[String], k: Int): Seq[BigInt] = {
    val hs = toks.map(tokHash)
    hs.sliding(k).map(w => w.reduceLeft((h, x) => (h * 1000003 + x) mod P)).toSeq
  }

  /** Reference winnowing: per window of `win` gram hashes select the min,
    * rightmost on ties; distinct (1-based pos, hash).
    */
  private def winnowModel(toks: Seq[String], k: Int, win: Int): Set[(Long, Long)] = {
    val gh = gramHashes(toks, k)
    (0 to gh.length - win).map { j =>
      val sl = gh.slice(j, j + win)
      val mn = sl.min
      val pos = j + sl.lastIndexOf(mn) + 1
      (pos.toLong, mn.toLong)
    }.toSet
  }

  test("winnow fingerprints match the reference model on planted docs") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x x x x x x x x"),       // all-equal hashes: rightmost tie rule
      (3L, "q w e r t y u"),
      (4L, "one two three four five six") // minimum length (k+win-1 = 6)
    ).toDF("doc_id", "text")
    val got = DocQueries.winnowFingerprints(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toSet
    val exp = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "x x x x x x x x",
      3L -> "q w e r t y u",
      4L -> "one two three four five six"
    ).flatMap { case (id, t) =>
      winnowModel(t.split(" ").toSeq, 3, 4).map(p => (id, p))
    }.toSet
    assert(got == exp)
  }

  test("winnow guarantee: docs sharing a >=6-token verbatim run share a fingerprint") {
    val common = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two $common tail tail2"),
      (2L, s"$common completely different suffix words here")
    ).toDF("doc_id", "text")
    val fps = DocQueries.winnowFingerprints(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val a = fps.filter(_._1 == 1L).map(_._2).toSet
    val b = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((a intersect b).nonEmpty)
  }

  test("winnow drops docs shorter than k+win-1 tokens") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(DocQueries.winnowFingerprints(docs).count() == 0)
  }

  // --- text_lm_score --------------------------------------------------

  private def round6(v: Double): JBigDecimal =
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)

  test("lm score matches the add-one trigram model on a planted corpus") {
    val texts = Seq((1L, "abcabc"), (2L, "abcxyz"), (3L, "zzzz"))
    val docs  = texts.toDF("doc_id", "text")
    val grams = texts.flatMap { case (id, t) =>
      (0 to t.length - 3).map(i => (id, t.substring(i, i + 3)))
    }
    val counts = grams.groupBy(_._2).view.mapValues(_.size).toMap
    val denom  = (grams.size + counts.size).toDouble
    val exp = grams.groupBy(_._1).map { case (id, gs) =>
      val slog = gs
        .map(g => round6(math.log((counts(g._2) + 1).toDouble / denom)))
        .reduce(_.add(_))
      val nll = round6(-slog.doubleValue() / gs.size).doubleValue()
      id -> (gs.size.toLong, nll)
    }
    val got = DocQueries.lmScore(docs, keepAtMost = 5.36)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == exp)
    // repetitive text compresses: the all-z doc must score strictly lower
    assert(got(3L)._2 < got(1L)._2 && got(1L)._2 < got(2L)._2)
  }

  test("lm keep flag splits the real corpus at the 5.36 threshold") {
    val keep = graft.SparkEntry.queries("text_lm_score")(spark, Sf)
      .groupBy("keep").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // threshold calibrated to the synthetic corpus median: both sides present
    assert(keep.getOrElse(true, 0L) > 0 && keep.getOrElse(false, 0L) > 0)
  }
}
