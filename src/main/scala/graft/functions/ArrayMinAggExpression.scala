package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Expression, If, IsNull, LambdaFunction, Least, Literal,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise minimum of `array<long>` values across a group — a
  * DECLARATIVE aggregate (update/merge/eval are Catalyst expression
  * trees, the most Spark-native aggregate form; contrast the imperative
  * buffer of [[TopKStructs]]). The flagship use is MinHash signature
  * union: min-merging per-document signatures yields the signature of
  * the group's underlying SET UNION (the MinHash merge property), so a
  * whole corpus slice compresses to k longs in one partial-aggregated
  * pass.
  *
  * Null handling: null arrays are ignored (first non-null wins the
  * initial buffer); groups of only nulls return null. Arrays are
  * assumed equal-length (as MinHash signatures are); on ragged input
  * zip_with pads the SHORTER array with nulls and `least` ignores
  * nulls, so the result has the LONGER array's length with its tail
  * passed through un-minned (no error, but not a prefix truncation).
  */
case class ArrayMinAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean  = true

  /** Fail at ANALYSIS for non-long-array inputs: the zip_with lambda
    * variables are LongType, so a string array would otherwise pass
    * analysis and ClassCastException mid-task.
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_min_agg: expected array<bigint>, got ${other.sql}")
    }

  private lazy val buf = AttributeReference("buf", dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, dataType))

  private def minMerge(a: Expression, b: Expression): Expression = {
    val x = NamedLambdaVariable("x", LongType, nullable = true)
    val y = NamedLambdaVariable("y", LongType, nullable = true)
    If(IsNull(a), b,
      If(IsNull(b), a,
        ZipWith(a, b, LambdaFunction(Least(Seq(x, y)), Seq(x, y)))))
  }

  override lazy val updateExpressions: Seq[Expression] =
    Seq(minMerge(buf, child))

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(minMerge(buf.left, buf.right))

  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildInternal(c: Expression): ArrayMinAgg =
    copy(child = c)

  override def prettyName: String = "array_min_agg"
}

object ArrayMinAgg {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def array_min_agg(c: Column): Column =
    column(ArrayMinAgg(expression(c)).toAggregateExpression())
}
