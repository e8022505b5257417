package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition statistics for the Gopher/C4 filters: duplicate
  * line counts/chars and most-frequent-2/3-gram concentration, computed
  * with hash maps in O(text) per row — the higher-order-function
  * formulation needs O(n²) membership scans per metric and evaluates
  * interpreted (measured ~20× slower at sf0.1 even after binding
  * arrays to columns).
  *
  * Semantics match the column formulation exactly: lines are
  * `split('\n')` with trailing empties kept, tokens `split(' ')`,
  * grams single-space joins, lengths are codepoint counts (Spark
  * `length` ≡ DuckDB `length`), and gram/argmax ties break to the
  * lexicographically smallest gram.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.Schema

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.statsEval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RepetitionStats.statsEval($s);")

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(c)
}

object RepetitionStats {
  private[functions] val SumInts
      : java.util.function.BiFunction[Int, Int, Int] = (a, b) => a + b

  /** Static eval body (forwarded onto the companion class for codegen). */
  def statsEval(input: UTF8String): InternalRow = {
    val text  = input.toString
    val lines = text.split("\n", -1)
    val toks  = text.split(" ", -1)

    def cp(s: String): Long = s.codePointCount(0, s.length).toLong

    val lineCounts = new java.util.HashMap[String, Int]
    lines.foreach(l => lineCounts.merge(l, 1, SumInts))
    var dupChars = 0L
    lineCounts.forEach { (l, c) => dupChars += (c - 1).toLong * cp(l) }

    def gramStats(n: Int): (Int, Long) = {
      if (toks.length < n) (0, 0L)
      else {
        val m = new java.util.HashMap[String, Int]
        var i = 0
        while (i + n <= toks.length) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          m.merge(sb.toString, 1, SumInts)
          i += 1
        }
        var bestCnt  = 0
        var bestGram: String = null
        m.forEach { (g, c) =>
          if (c > bestCnt || (c == bestCnt && g.compareTo(bestGram) < 0)) {
            bestCnt = c; bestGram = g
          }
        }
        (bestCnt, cp(bestGram))
      }
    }
    val (c2, l2) = gramStats(2)
    val (c3, l3) = gramStats(3)

    new GenericInternalRow(Array[Any](
      lines.length, lineCounts.size, dupChars, c2, l2, c3, l3))
  }

  val Schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_dlines", IntegerType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("top2_cnt", IntegerType, nullable = false),
    StructField("top2_chars", LongType, nullable = false),
    StructField("top3_cnt", IntegerType, nullable = false),
    StructField("top3_chars", LongType, nullable = false)))

  import org.apache.spark.sql.GraftBridge.{column, expression}
  def repetition_stats(c: Column): Column = column(RepetitionStats(expression(c)))
}
