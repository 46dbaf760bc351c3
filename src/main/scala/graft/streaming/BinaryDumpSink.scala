package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K6 binary blob dump sink (reference: ImageDump.scala:17-60 — per-row
  * signature PNGs under date directories with a random 0-500 fan-out
  * subdir so no directory holds millions of files). Restated Spark-first:
  * executor-side foreachPartition (no driver funnel, no collect), and the
  * fan-out bucket is a STABLE hash of the id instead of the reference's
  * Random — re-running the dump overwrites each blob at the same path
  * (idempotent retry) instead of scattering duplicates.
  */
object BinaryDumpSink {

  /** Blob ids become file names, and they are arbitrary row data: an id
    * containing '/' or '..' would resolve outside the dump root (data-driven
    * path traversal in an executor-side sink). Safe charset passes through
    * unchanged; anything else is hex-encoded, which is injective so distinct
    * ids never collide on disk.
    */
  private[streaming] def safeName(id: String): String =
    if (id.nonEmpty && id != "." && id != ".." && id.forall(c =>
        c.isLetterOrDigit && c < 128 || c == '.' || c == '_' || c == '-')) id
    else "x" + id.getBytes("UTF-8").map("%02x".format(_)).mkString

  /** Write each row's binary column as `<root>/<yyyy-MM-dd>/<bucket>/<id>.<ext>`.
    *
    * @param idCol   unique blob id (file name)
    * @param binCol  binary payload column
    * @param dateCol timestamp column driving the date partition
    * @param fanout  subdirectory count per date (reference uses 500)
    */
  def dump(df: DataFrame, root: String, idCol: String, binCol: String,
           dateCol: String, ext: String = "bin", fanout: Int = 500): Unit = {
    df.select(col(idCol).cast("string").as("id"), col(binCol).as("bin"),
        date_format(col(dateCol), "yyyy-MM-dd").as("d"))
      .foreachPartition { rows: Iterator[Row] =>
        rows.foreach { r =>
          val id = r.getString(0)
          val bytes = r.getAs[Array[Byte]](1)
          // null date is skipped like null id/bytes — one bad row must not
          // NPE the task and fail the whole dump
          if (id != null && bytes != null && r.getString(2) != null) {
            // bucket on the RAW id so renaming via safeName never moves a
            // blob between fan-out dirs for ids that were already safe
            val bucket = math.floorMod(id.hashCode, fanout)
            val dir = Paths.get(root, r.getString(2), bucket.toString)
            Files.createDirectories(dir)
            val target = dir.resolve(s"${safeName(id)}.$ext").normalize()
            // defense in depth: safeName should make escape impossible, but
            // a write outside the root must never happen regardless
            require(target.startsWith(Paths.get(root).toAbsolutePath.normalize()) ||
                    target.startsWith(Paths.get(root).normalize()),
              s"binary dump: resolved path $target escapes root $root")
            Files.write(target, bytes)
          }
        }
      }
  }
}
