package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for local spot checks while developing. Not part of the
  * driver contract. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption match {
      case Some("ledger") =>
        // drive the DSv2 ledger source end-to-end: write a topic dir, read
        // it rate-limited through the public format("graft-ledger") API
        import java.nio.file.Files
        val topic = Files.createTempDirectory("dev_topic")
        val p0 = topic.resolve("partition-0"); Files.createDirectories(p0)
        Files.write(p0.resolve("ledger-1.log"),
          (0 until 10).map(i => s"k$i,payload-$i").mkString("\n").getBytes)
        val q = spark.readStream.format("graft-ledger")
          .option("path", topic.toString)
          .option("maxRatePerPartition", "4")
          .load()
          .writeStream.format("memory").queryName("dev_ledger")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(60000)
        spark.sql("select * from dev_ledger").show(20, truncate = false)
        println(s"[dev] ledger rows = ${spark.sql("select count(*) from dev_ledger").collect().head.getLong(0)}")
      case _ =>
        val flagship = SparkEntry.entry(spark)
        flagship.show(5, truncate = false)
        println(s"[dev] entry rows = ${flagship.count()}")
    }
    spark.stop()
  }
}
