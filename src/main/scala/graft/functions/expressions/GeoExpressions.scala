package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.GeoFunctions

/** Native Catalyst expressions for the hot geo scalar functions
  * (SURVEY.md §2.10: "promote hot ones (vincenty, geohash) to Expression
  * w/ codegen"). Unlike a Scala UDF these stay inside whole-stage codegen
  * — no encoder round-trip, no closure serialization, null-safety handled
  * by the framework — the generated code is a direct static call.
  */
case class VincentyDistance(first: Expression, second: Expression,
                            third: Expression, fourth: Expression)
    extends QuaternaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vincenty expects 4 DOUBLE arguments, got ${children.map(_.dataType)}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override protected def nullSafeEval(lat1: Any, lng1: Any,
                                      lat2: Any, lng2: Any): Any =
    GeoFunctions.vincentyM(lat1.asInstanceOf[Double], lng1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lng2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.GeoFunctions.vincentyM($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): VincentyDistance =
    copy(newFirst, newSecond, newThird, newFourth)
}

case class GeohashEncode(first: Expression, second: Expression,
                         third: Expression)
    extends TernaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second).forall(_.dataType == DoubleType) &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geohash_encode expects (DOUBLE, DOUBLE, INT), got ${children.map(_.dataType)}")
  override def dataType: DataType = StringType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override protected def nullSafeEval(lat: Any, lng: Any, prec: Any): Any =
    UTF8String.fromString(GeoFunctions.geohashEncodeScala(
      lat.asInstanceOf[Double], lng.asInstanceOf[Double], prec.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lng, p) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.GeoFunctions.geohashEncodeScala($lat, $lng, $p));""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): GeohashEncode =
    copy(newFirst, newSecond, newThird)
}

object GeoExpressions {
  import org.apache.spark.sql.catalyst.expressions.Cast

  private def d(c: Column): Expression = Cast(SqlShims.expression(c), DoubleType)
  private def i(c: Column): Expression = Cast(SqlShims.expression(c), IntegerType)

  /** Numeric-coercing constructors (used by both the Column API and the
    * SQL FunctionRegistry builder — without ExpectsInputTypes, decimal
    * literals need an explicit Cast; Cast(double→double) folds away).
    */
  def vincentyExpr(args: Seq[Expression]): VincentyDistance =
    VincentyDistance(Cast(args(0), DoubleType), Cast(args(1), DoubleType),
      Cast(args(2), DoubleType), Cast(args(3), DoubleType))

  def geohashExpr(args: Seq[Expression]): GeohashEncode =
    GeohashEncode(Cast(args(0), DoubleType), Cast(args(1), DoubleType),
      Cast(args(2), IntegerType))

  /** Column-API entry points for the native expressions. */
  def vincenty(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column =
    SqlShims.column(VincentyDistance(d(lat1), d(lng1), d(lat2), d(lng2)))

  def geohash(lat: Column, lng: Column, precision: Column): Column =
    SqlShims.column(GeohashEncode(d(lat), d(lng), i(precision)))
}
