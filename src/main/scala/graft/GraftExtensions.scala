package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.{CosineSimilarity, GeoExpressions, GeohashEncode, VincentyDistance}

/** SparkSessionExtensions hook registering the engine's native functions
  * for SQL use:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT vincenty(12.97, 77.59, 12.98, 77.60)")
  * }}}
  *
  * (or `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vincenty"),
      new ExpressionInfo(classOf[VincentyDistance].getName, "vincenty"),
      (args: Seq[Expression]) => GeoExpressions.vincentyExpr(args)))
    e.injectFunction((
      new FunctionIdentifier("geohash_encode"),
      new ExpressionInfo(classOf[GeohashEncode].getName, "geohash_encode"),
      (args: Seq[Expression]) => GeoExpressions.geohashExpr(args)))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
  }
}
