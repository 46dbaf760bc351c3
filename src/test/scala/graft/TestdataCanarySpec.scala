package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary for the driver-owned testdata (TESTDATA.md).
  *
  * Round 7 lost 27 queries silently when the driver regenerated
  * events.parquet with a different physical timestamp type. This spec makes
  * the next drift fail ONE NAMED TEST instead: it asserts every table loads
  * with its canonical derived columns, and proves `Tables.events`
  * normalizes all three timestamp encodings the generator has produced or
  * could produce (long nanos, TIMESTAMP_NTZ micros, TIMESTAMP ltz micros)
  * to identical canonical values.
  */
class TestdataCanarySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private val integral: DataType => Boolean =
    t => t == LongType || t == IntegerType || t == ShortType
  private val numeric: DataType => Boolean =
    t => integral(t) || t == DoubleType || t == FloatType || t.isInstanceOf[DecimalType]

  // canonical column → type surface each query family depends on; a driver
  // regeneration that renames/retypes any of these fails here by table name
  private val expectedCols: Map[String, Seq[(String, DataType => Boolean)]] = Map(
    "region"   -> Seq("r_regionkey" -> integral),
    "nation"   -> Seq("n_nationkey" -> integral),
    "customer" -> Seq("c_custkey" -> integral,
                      "c_acctbal" -> numeric),
    "supplier" -> Seq("s_suppkey" -> integral),
    "part"     -> Seq("p_partkey" -> integral),
    "orders"   -> Seq("o_orderkey" -> integral,
                      "o_orderdate" -> (t => t == DateType || t.isInstanceOf[TimestampType] || t == TimestampNTZType)),
    "lineitem" -> Seq("l_orderkey" -> integral,
                      "l_quantity" -> numeric,
                      "l_shipdate" -> (t => t == DateType || t.isInstanceOf[TimestampType] || t == TimestampNTZType)),
    "documents"  -> Seq("doc_id" -> integral,
                        "text" -> (_ == StringType)),
    "embeddings" -> Seq("vec_id" -> integral,
                        "embedding" -> (t => t == ArrayType(FloatType, true) ||
                          t == ArrayType(FloatType, false) ||
                          t == ArrayType(DoubleType, true) ||
                          t == ArrayType(DoubleType, false)))
  )

  test("every TESTDATA.md table loads with its canonical columns") {
    expectedCols.foreach { case (table, cols) =>
      val schema = Tables(spark, dir, table).schema
      cols.foreach { case (name, typeOk) =>
        assert(schema.fieldNames.contains(name), s"$table missing column $name; has ${schema.fieldNames.mkString(",")}")
        assert(typeOk(schema(name).dataType), s"$table.$name unexpected type ${schema(name).dataType}")
      }
    }
  }

  test("Tables.events derives canonical ts (long nanos), ts_ms, event_ts from the live fixture") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == LongType, s"ts is ${ev.schema("ts").dataType}")
    assert(ev.schema("ts_ms").dataType == LongType)
    assert(ev.schema("event_ts").dataType == TimestampType)
    val row = ev.select("ts", "ts_ms").filter(col("ts").isNotNull).head()
    assert(row.getLong(0) / 1000000L == row.getLong(1), "ts_ms must be ts div 1e6")
    // sanity window: nanos magnitude (2000..2100 epoch range), catches a
    // regeneration that lands micros in the long path or vice versa
    assert(row.getLong(0) > 9e17 && row.getLong(0) < 4.2e18,
      s"ts=${row.getLong(0)} not in epoch-nanos range")
  }

  test("events normalization is encoding-invariant: long nanos, NTZ micros, ltz micros") {
    val micros = Seq(1700000000123456L, 1700000999000001L, 946684800000000L)
    val tmpPath = java.nio.file.Files.createTempDirectory("canary_events")
    val tmp = tmpPath.toString
    // reverse-sorted walk deletes children before parents on JVM exit
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val walk = java.nio.file.Files.walk(tmpPath)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }))
    import spark.implicits._
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong, "click", 1.0, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")

    // encoding 1: long epoch nanos (what TIMESTAMP(NANOS) + nanosAsLong reads as)
    base.withColumn("ts", col("us") * 1000L).drop("us")
      .write.mode("overwrite").parquet(s"$tmp/nanos/events.parquet")
    // encoding 2: TIMESTAMP_NTZ micros (current generator output)
    base.withColumn("ts", to_timestamp_ntz(timestamp_micros(col("us")))).drop("us")
      .write.mode("overwrite").parquet(s"$tmp/ntz/events.parquet")
    // encoding 3: TIMESTAMP (UTC-adjusted) micros
    base.withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .write.mode("overwrite").parquet(s"$tmp/ltz/events.parquet")

    def canon(sub: String): Seq[(Long, Long, Long, java.sql.Timestamp)] =
      Tables.events(spark, s"$tmp/$sub")
        .select("event_id", "ts", "ts_ms", "event_ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getTimestamp(3))).toSeq.sortBy(_._1)

    val fromNanos = canon("nanos")
    assert(fromNanos.map(_._2) == micros.map(_ * 1000L),
      s"nanos path ts mismatch: ${fromNanos.map(_._2)}")
    assert(canon("ntz") == fromNanos, "NTZ micros must normalize identically to long nanos")
    assert(canon("ltz") == fromNanos, "ltz micros must normalize identically to long nanos")
  }
}
