package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{Add, And, AttributeReference, Cast, Divide, Expression, Floor, If, IsNotNull, Literal, Multiply, Rint}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** `graft_wavg(qty, price)` — quantity-weighted average price as a
  * DeclarativeAggregate: the buffer is two longs (exact cents x qty, qty)
  * and every phase is a pure Catalyst expression, so the whole aggregate
  * lives inside whole-stage codegen's HashAggregate (unlike the
  * `Aggregator`-based UDAF in [[graft.ops.Aggregates.WeightedAvgPrice]],
  * which round-trips through Scala objects). Same arithmetic contract:
  * qty rounds half-even (rint), price to exact cents (floor(p*100+0.5)),
  * merge order irrelevant — the 100 TB-safe money math.
  */
case class ExactWeightedAvg(qty: Expression, price: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(qty, price)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_wavg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (qty.dataType == DoubleType && price.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (DOUBLE, DOUBLE), got " +
        s"${qty.dataType.catalogString}, ${price.dataType.catalogString}")

  private lazy val sumCents =
    AttributeReference("sumCents", LongType, nullable = false)()
  private lazy val sumQty =
    AttributeReference("sumQty", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sumCents, sumQty)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L))

  private def qtyLong: Expression = Cast(Rint(qty), LongType)
  private def cents: Expression =
    Cast(Floor(Add(Multiply(price, Literal(100.0)), Literal(0.5))), LongType)

  // Null-safe updates (as the built-in DeclarativeAggregates do): a row
  // with a null qty OR price is ignored entirely — without the guard one
  // null input would poison the non-nullable buffer and surface as a null
  // through a nullable=false attribute. Both inputs must be present for
  // the row to count toward either buffer slot (a half-counted row would
  // skew the average).
  private def bothSet: Expression = And(IsNotNull(qty), IsNotNull(price))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(bothSet, Add(sumCents, Multiply(qtyLong, cents)), sumCents),
    If(bothSet, Add(sumQty, qtyLong), sumQty))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(sumCents.left, sumCents.right),
    Add(sumQty.left, sumQty.right))

  override lazy val evaluateExpression: Expression =
    If(sumQty === Literal(0L), Literal(0.0),
      Divide(
        Divide(Cast(sumCents, DoubleType), Cast(sumQty, DoubleType)),
        Literal(100.0)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactWeightedAvg =
    copy(qty = newChildren(0), price = newChildren(1))
}
