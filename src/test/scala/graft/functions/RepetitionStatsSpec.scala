package graft.functions

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen

import graft.SparkSpec

/** Property test: the native one-pass RepetitionStats agrees with an
  * independent Scala model on arbitrary text — including empty
  * segments, repeated newlines, and non-ASCII (codepoint lengths).
  */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._
  import RepetitionStats.repetition_stats

  private def forAll[A](gen: Gen[A], n: Int = 60)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.sample.foreach(check)
      if (i % 20 == 0) gen.sample.foreach(check) // extra draws
    }

  private def model(text: String): (Int, Int, Long, Int, Long, Int, Long) = {
    def cp(s: String) = s.codePointCount(0, s.length).toLong
    val lines = text.split("\n", -1).toSeq
    val dl    = lines.distinct
    val dupChars = dl.map(l => (lines.count(_ == l) - 1).toLong * cp(l)).sum
    val toks = text.split(" ", -1).toSeq
    def top(n: Int): (Int, Long) =
      if (toks.length < n) (0, 0L)
      else {
        val grams  = toks.sliding(n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size)
        val max    = counts.values.max
        val best   = counts.filter(_._2 == max).keys.min
        (max, cp(best))
      }
    val (c2, l2) = top(2); val (c3, l3) = top(3)
    (lines.length, dl.length, dupChars, c2, l2, c3, l3)
  }

  private val word = Gen.oneOf("a", "bb", "ccc", "δδ", "🙂", "", "x y")
  private val textGen: Gen[String] = for {
    n    <- Gen.chooseNum(0, 40)
    sep  <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "\n"))
    ws   <- Gen.listOfN(n, word)
  } yield ws.zipAll(sep, "", "").map { case (w, s) => w + s }.mkString

  test("native stats equal the model on arbitrary text") {
    forAll(textGen) { text =>
      val r = Seq(Tuple1(text)).toDF("text")
        .select(repetition_stats(col("text")).as("rs"))
        .select("rs.*").head()
      val got = (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5), r.getLong(6))
      assert(got == model(text), s"text=${text.replace("\n", "\\n")}")
    }
  }

  test("degenerate inputs: empty text, only separators") {
    for (t <- Seq("", " ", "\n", "\n\n", "  ", " \n ")) {
      val r = Seq(Tuple1(t)).toDF("text")
        .select(repetition_stats(col("text")).as("rs"))
        .select("rs.*").head()
      assert((r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5), r.getLong(6)) == model(t), s"t='$t'")
    }
  }
}
