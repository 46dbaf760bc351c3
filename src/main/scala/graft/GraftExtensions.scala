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

  /** Arity check before indexing args — a wrong-arity SQL call must fail
    * as a clean AnalysisException naming the expected signature, the way
    * Spark's builtin builders do, not an IndexOutOfBoundsException.
    */
  private def checkArity(name: String, signature: String, expected: Int,
                         args: Seq[Expression]): Unit =
    if (args.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> s"$expected (signature: $signature)",
          "actualNum" -> args.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Literal-argument check: index/config parameters of the native
    * functions and TVFs must be foldable literals. Raised as Spark's own
    * NON_FOLDABLE_ARGUMENT condition so the message names the function and
    * parameter (the r5 code borrowed the seed-expression error class,
    * whose wording was misleading for these arguments).
    */
  private def requireFoldable(func: String, param: String, tpe: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> s"`$func`",
        "paramName" -> s"`$param`",
        "paramType" -> ("\"" + tpe + "\"")))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vincenty"),
      new ExpressionInfo(classOf[VincentyDistance].getName, "vincenty"),
      (args: Seq[Expression]) => {
        checkArity("vincenty", "vincenty(lat1, lng1, lat2, lng2)", 4, args)
        GeoExpressions.vincentyExpr(args)
      }))
    e.injectFunction((
      new FunctionIdentifier("geohash_encode"),
      new ExpressionInfo(classOf[GeohashEncode].getName, "geohash_encode"),
      (args: Seq[Expression]) => {
        checkArity("geohash_encode", "geohash_encode(lat, lng, precision)", 3, args)
        GeoExpressions.geohashExpr(args)
      }))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        checkArity("cosine_sim", "cosine_sim(vec1, vec2)", 2, args)
        CosineSimilarity(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("srp_bucket"),
      new ExpressionInfo(classOf[graft.functions.expressions.SrpBucket].getName, "srp_bucket"),
      (args: Seq[Expression]) => {
        if (args.length < 2 || args.length > 3)
          checkArity("srp_bucket", "srp_bucket(vec, nPlanes[, offset])",
            if (args.length < 2) 2 else 3, args)
        def intLit(i: Int, name: String): Int = args(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => requireFoldable("srp_bucket", name, "INT")
        }
        graft.functions.expressions.SrpBucket(args(0), intLit(1, "nPlanes"),
          if (args.length == 3) intLit(2, "offset") else 0)
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(
        classOf[graft.functions.expressions.MinHashBandKeys].getName,
        "minhash_band_keys"),
      (args: Seq[Expression]) => {
        checkArity("minhash_band_keys",
          "minhash_band_keys(shingles, numHashes, bands, rows)", 4, args)
        def intLit(i: Int, name: String): Int = args(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => requireFoldable("minhash_band_keys", name, "INT")
        }
        graft.functions.expressions.MinHashBandKeys(args(0),
          intLit(1, "numHashes"), intLit(2, "bands"), intLit(3, "rows"))
      }))

    // table function: per-partition segment/entry/byte status of a ledger
    // topic — the `kafka-consumer-groups --describe` / pulsar-admin stats
    // analogue, as plain SQL. Metadata-only (dir listing + cached entry
    // counts + file sizes), materialized driver-side into a LocalRelation:
    //   SELECT * FROM graft_ledger_status('/path/to/topic')
    e.injectTableFunction((
      new FunctionIdentifier("graft_ledger_status"),
      new ExpressionInfo("graft.sources.LedgerSource", "graft_ledger_status"),
      (args: Seq[Expression]) => {
        checkArity("graft_ledger_status", "graft_ledger_status(path)", 1, args)
        val path = args.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
              s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case _ => requireFoldable("graft_ledger_status", "path", "STRING")
        }
        graft.sources.LedgerSource.statusRelation(path)
      }))

    // artifact-store ops TVF: per-family entry counts, bytes, freshness
    // and builder debris of a disk artifact store — the view an operator
    // checks before trusting a store or scheduling Dev storegc:
    //   SELECT * FROM graft_artifacts_status('/tmp/graft-artifacts')
    e.injectTableFunction((
      new FunctionIdentifier("graft_artifacts_status"),
      new ExpressionInfo("graft.ArtifactStore", "graft_artifacts_status"),
      (args: Seq[Expression]) => {
        checkArity("graft_artifacts_status", "graft_artifacts_status(path)", 1, args)
        val path = args.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
              s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case _ => requireFoldable("graft_artifacts_status", "path", "STRING")
        }
        graft.ArtifactStore.statusRelation(path)
      }))

    // companion lag TVF: backlog per partition relative to a checkpoint
    // offsets JSON (the consumer-lag column):
    //   SELECT * FROM graft_ledger_lag('/path', '{"0":[3,2]}')   -- the
    //   checkpoint offset JSON format: partition -> [ledgerId, entryId]
    e.injectTableFunction((
      new FunctionIdentifier("graft_ledger_lag"),
      new ExpressionInfo("graft.sources.LedgerSource", "graft_ledger_lag"),
      (args: Seq[Expression]) => {
        checkArity("graft_ledger_lag", "graft_ledger_lag(path, offsetsJson)", 2, args)
        def strLit(i: Int, name: String): String = args(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
              s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case _ => requireFoldable("graft_ledger_lag", name, "STRING")
        }
        graft.sources.LedgerSource.lagRelation(
          strLit(0, "path"), strLit(1, "offsetsJson"))
      }))
  }
}
