package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Coalesce, Expression, If, IsNull, Literal, Multiply}
import org.apache.spark.sql.types._

/** `product(x)` — multiplicative aggregate (DuckDB's product aggregate;
  * reference surface duckdb docs/sql/functions/aggregates). Spark has no
  * built-in spelling, and `exp(sum(ln(x)))` is both float-inexact and
  * wrong for zero/negative inputs, so this is a native Catalyst
  * DeclarativeAggregate: the buffer is one nullable DOUBLE, updates and
  * merges are plain expression trees (codegen'd, map-side partial like
  * any built-in sum), and the shuffle carries one scalar per group.
  *
  * NULL inputs are skipped; an empty / all-null group yields NULL —
  * same null contract as SQL sum. Result is DOUBLE (DuckDB returns
  * DOUBLE for product regardless of input type); exactness for integer
  * inputs holds while the running product stays below 2^53.
  */
case class ProductAgg(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"product needs a numeric input, got $other")
  }

  private lazy val prod = AttributeReference("product", DoubleType)()
  private lazy val input = Cast(child, DoubleType)

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(prod)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(input), prod,
      Multiply(Coalesce(Seq(prod, Literal(1.0d))), input)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(prod.right), prod.left,
      Multiply(Coalesce(Seq(prod.left, Literal(1.0d))), prod.right)))

  override lazy val evaluateExpression: Expression = prod

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
