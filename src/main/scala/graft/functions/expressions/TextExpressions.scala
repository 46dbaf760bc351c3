package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.SqlShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash→LSH-band kernel for the text near-dup family.
  *
  * The UDF formulation (`minhashUdf` piped into `lshBandsUdf`) pays two
  * Catalyst↔Scala conversions per row — array-of-strings in,
  * array-of-longs out, array-of-longs in, array-of-strings out — on the
  * path every LSH query plus the streaming admission bands its corpus
  * through. This expression computes shingles → signature → band keys
  * in one compiled call, delegating to the SAME
  * `TextFunctions.minhashSignature`/`lshBandKeys` Scala kernels the
  * UDFs use — bucket keys are string-identical by construction, so the
  * q29/q38/q52/q55 exact-parity specs remain authoritative for both
  * forms, and a unit spec pins expression-vs-UDF equality directly.
  * Measured honestly: at verify scale the fusion is perf-NEUTRAL (the
  * 64-permutation signature loop dominates, not the boundary) — its
  * value is one codegen-integrated call instead of a nested UDF
  * lineage, and a SQL surface (`minhash_band_keys`) for the banding
  * stage, matching the engine's expression-first discipline.
  */
object TextKernels {
  def minhashBandKeys(arr: ArrayData, numHashes: Int, bands: Int,
      rows: Int): ArrayData = {
    val n = arr.numElements()
    val shingles = new Array[String](n)
    var i = 0
    while (i < n) { shingles(i) = arr.getUTF8String(i).toString; i += 1 }
    val sig = graft.functions.TextFunctions
      .minhashSignature(scala.collection.immutable.ArraySeq.unsafeWrapArray(shingles), numHashes)
    val keys = graft.functions.TextFunctions
      .lshBandKeys(scala.collection.immutable.ArraySeq.unsafeWrapArray(sig), bands, rows)
    new GenericArrayData(keys.map(k => UTF8String.fromString(k): Any).toArray)
  }
}

case class MinHashBandKeys(child: Expression, numHashes: Int, bands: Int,
    rows: Int) extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys expects ARRAY<STRING>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    TextKernels.minhashBandKeys(v.asInstanceOf[ArrayData], numHashes, bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.expressions.TextKernels.minhashBandKeys($v, $numHashes, $bands, $rows);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object TextExpressions {
  def minhashBandKeysExpr(shingles: Column, numHashes: Int, bands: Int,
      rows: Int): Column =
    SqlShims.column(MinHashBandKeys(SqlShims.expression(shingles),
      numHashes, bands, rows))
}
