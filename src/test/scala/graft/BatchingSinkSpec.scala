package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{BatchingForeachWriter, BatchingSink}

/** Top-level so sink closures don't capture the (non-serializable) suite;
  * static state is visible across tasks in same-JVM local mode.
  */
object Collector extends Serializable {
  val batches = new ConcurrentLinkedQueue[Seq[String]]()
  val post: Seq[String] => Unit = b => batches.add(b)
  def clear(): Unit = batches.clear()
  def all: Seq[Seq[String]] = {
    val it = batches.iterator(); val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    while (it.hasNext) out += it.next()
    out.toSeq
  }
}

/** K4 batched external sink: groups of N per partition, tail flush on
  * close, pluggable transport (reference BigfootClient grouped-200 POST).
  */
class BatchingSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming foreach writer batches per partition with tail flush") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Collector.clear()
    val mem = MemoryStream[String]
    val q = mem.toDS().repartition(1)
      .writeStream
      .foreach(new BatchingForeachWriter(3, Collector.post))
      .start()
    mem.addData((1 to 7).map(i => s"m$i"): _*)
    q.processAllAvailable()
    q.stop()
    val batches = Collector.all
    assert(batches.map(_.size).sorted == Seq(1, 3, 3),
      s"got ${batches.map(_.size)}")
    assert(batches.flatten.toSet == (1 to 7).map(i => s"m$i").toSet)
  }

  test("batch postPartitioned groups every partition's rows") {
    import spark.implicits._
    Collector.clear()
    val df = (1 to 10).map(i => s"r$i").toDF("payload").repartition(2)
    BatchingSink.postPartitioned(df, 4, Collector.post)
    val batches = Collector.all
    assert(batches.flatten.toSet == (1 to 10).map(i => s"r$i").toSet)
    assert(batches.forall(_.size <= 4))
  }
}
