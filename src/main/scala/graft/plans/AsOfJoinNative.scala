package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the (c)-tier custom operator path from the build
  * brief: a `LogicalPlan` node, a planner `Strategy`, and a `SparkPlan`
  * whose distribution/ordering REQUIREMENTS make Catalyst do the heavy
  * lifting (EnsureRequirements inserts the hash exchanges and per-key
  * sorts, exactly as it does for the built-in SortMergeJoin).
  *
  * Execution is a streaming two-pointer merge per partition: both sides
  * arrive hash-partitioned by key and sorted by (key, ts); for each left
  * row the operator holds the latest right row with `r.ts <= l.ts` in the
  * same key group (inclusive bound, matching `ASOF JOIN ... ON l.ts >=
  * r.ts`), emitting nulls when none exists. O(|L| + |R|) per partition,
  * no buffering beyond one held row — the asymptotics a 100 TB as-of
  * needs. Right side must be unique per (key, ts); pre-dedup otherwise.
  *
  * The composed-from-built-ins variant lives in [[graft.ops.AsOf]]
  * (union + last-ignoring-nulls window); this operator exists for the
  * cases where the union trick's single wide shuffle is worse than two
  * narrow ones — and to exercise the full extension surface.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // EnsureRequirements co-partitions on the keys and sorts each side by
  // (key, ts) — declaring intent instead of hand-building the shuffle.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = leftKey
    val rKeyOrd = rightKey
    val lTsE = leftTs
    val rTsE = rightTs
    val lOut = left.output
    val rOut = right.output
    val rWidth = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyOrd, lTsE), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyOrd, rTsE), rOut)
      // bind against nullable-marked right attrs: the joined row's right
      // half can be all-null, and a non-nullable BoundReference would skip
      // the null check and read zeros instead
      val outProj = UnsafeProjection.create(output, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rWidth)
      val rBuf = rIter.buffered
      // held = latest right row (copied) whose (key, ts) <= current left
      var heldKey: Long = 0L
      var heldTs: Long = 0L
      var held: InternalRow = null
      lIter.map { lRow =>
        val lkt = lKeyProj(lRow)
        val lk = lkt.getLong(0)
        val lt = lkt.getLong(1)
        // advance the right side up to (lk, lt) inclusive
        var continue = true
        while (continue && rBuf.hasNext) {
          val rkt = rKeyProj(rBuf.head)
          val rk = rkt.getLong(0)
          val rt = rkt.getLong(1)
          if (rk < lk || (rk == lk && rt <= lt)) {
            held = rBuf.next().copy(); heldKey = rk; heldTs = rt
          } else continue = false
        }
        val matches = held != null && heldKey == lk && heldTs <= lt
        outProj(joined(lRow, if (matches) held else nullRight)).copy()
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  /** Register the strategy on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    }

  /** Native as-of join of two DataFrames on long keys + timestamp-like ts
    * columns. Output = left columns ++ right columns (right nulled when no
    * row at-or-before).
    *
    * Type contract, ENFORCED here (the exec reads key/ts as raw longs, so
    * an unvalidated IntegerType key would silently produce garbage):
    *  - keys: any integral type; narrower ones are widened via `Cast` to
    *    long so the projection reads a real long;
    *  - ts: TimestampType (raw micros), integral (widened to long), or
    *    DateType (cast to TimestampType). Both sides must agree on the
    *    family — comparing one side's epoch-MICROS against the other's
    *    plain longs would join garbage, so mixing timestamp-ish and
    *    integral ts types is rejected. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTs: Column, rightTs: Column): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = GraftSqlShims.analyzed(left)
    val rPlan = GraftSqlShims.analyzed(right)
    def resolve(plan: LogicalPlan, c: Column, df: DataFrame): Expression = {
      val name = df.select(c).schema.fields.head.name
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    }
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types._
    def asKey(e: Expression, side: String): Expression = e.dataType match {
      case LongType => e
      case ByteType | ShortType | IntegerType => Cast(e, LongType)
      case dt => throw new IllegalArgumentException(
        s"asofJoin $side key must be an integral type, got ${dt.catalogString}")
    }
    def asTs(e: Expression, side: String): Expression = e.dataType match {
      case TimestampType | LongType => e
      case ByteType | ShortType | IntegerType => Cast(e, LongType)
      case DateType => Cast(e, TimestampType)
      case dt => throw new IllegalArgumentException(
        s"asofJoin $side ts must be TIMESTAMP, DATE, or integral, got ${dt.catalogString}")
    }
    def timestampish(dt: DataType): Boolean =
      dt == TimestampType || dt == DateType
    val (lTsRaw, rTsRaw) = (resolve(lPlan, leftTs, left), resolve(rPlan, rightTs, right))
    if (timestampish(lTsRaw.dataType) != timestampish(rTsRaw.dataType))
      throw new IllegalArgumentException(
        s"asofJoin ts types must both be timestamp-like or both integral, got " +
          s"${lTsRaw.dataType.catalogString} vs ${rTsRaw.dataType.catalogString}")
    GraftSqlShims.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      asKey(resolve(lPlan, leftKey, left), "left"),
      asKey(resolve(rPlan, rightKey, right), "right"),
      asTs(lTsRaw, "left"), asTs(rTsRaw, "right")))
  }
}
