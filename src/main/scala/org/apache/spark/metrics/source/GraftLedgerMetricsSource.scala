package org.apache.spark.metrics.source

import com.codahale.metrics.{Gauge, MetricRegistry}
import org.apache.spark.SparkEnv

/** Spark-metrics-system registration for graft-ledger streams — the
  * engine's counterpart to the reference's per-topic Codahale source
  * (`pulsar-spark-dstream/.../PulsarMetricsSource.scala:7-30`, metric
  * catalogue `PulsarMetricType.scala:11-113`): one `Source` per topic
  * whose gauges read the live stream state (backlog, per-batch entry/
  * byte counts, decode failures), so any configured metrics sink
  * (JMX, Graphite, the REST endpoint) exports them alongside Spark's own.
  *
  * This complements — not replaces — `ReportsSourceMetrics`: the DSv2
  * hook surfaces the same figures per batch inside
  * `StreamingQueryProgress`, while this source feeds the METRICS SYSTEM,
  * which is what dashboards scrape (the reference only had the latter).
  *
  * Lives in `org.apache.spark.metrics.source` because the `Source` trait
  * is `private[spark]` at the Scala level — the same placement the
  * reference uses for its whole dstream module
  * (`org.apache.spark.streaming.pulsar`). Only this shim needs the
  * privileged package; the engine calls the public `register`/lookup
  * helpers below.
  */
class GraftLedgerMetricsSource private[source] () extends Source {
  override val sourceName: String = GraftLedgerMetricsSource.SourceName
  override val metricRegistry: MetricRegistry = new MetricRegistry
}

object GraftLedgerMetricsSource {

  /** One source name for the engine; gauges are namespaced by topic
    * (`<topic>.totalBacklog`, …) under it, mirroring how the reference
    * namespaces accumulator names per topic.
    */
  val SourceName = "graft.ledger"

  /** Metric-name-safe form of a topic path. */
  def sanitize(topic: String): String =
    topic.replaceAll("[^A-Za-z0-9._-]", "_").replaceAll("^_+", "")

  // one registration per (SparkEnv identity, topic): streams are
  // re-constructed per query (re)start, and while MetricsSystem tolerates
  // duplicate registrations (first wins), re-registering every restart
  // would leak Source objects into its source list
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register per-topic gauges with the driver's metrics system.
    * Idempotent per (SparkEnv, topic); returns false (and registers
    * nothing) when no SparkEnv is live — callers never fail on metrics.
    * Gauge thunks are driver-side reads of live stream state and must be
    * cheap and exception-safe themselves.
    */
  def register(topic: String, gauges: Map[String, () => Long]): Boolean = {
    val env = SparkEnv.get
    if (env == null) return false
    val key = System.identityHashCode(env) + ":" + sanitize(topic)
    if (!registered.add(key)) return true
    val src = new GraftLedgerMetricsSource()
    gauges.foreach { case (name, f) =>
      src.metricRegistry.register(
        MetricRegistry.name(sanitize(topic), name),
        new Gauge[Long] {
          override def getValue: Long =
            try f() catch { case _: Exception => -1L }
        })
    }
    env.metricsSystem.registerSource(src)
    true
  }

  /** Gauge names currently registered under [[SourceName]] for `topic` —
    * public-type lookup for specs and ops tooling (the `Source` trait
    * itself is private[spark] and must not escape this package).
    */
  def gaugeNames(topic: String): Seq[String] = {
    val env = SparkEnv.get
    if (env == null) return Seq.empty
    val prefix = sanitize(topic) + "."
    env.metricsSystem.getSourcesByName(SourceName).flatMap(
      _.metricRegistry.getGauges.keySet()
        .toArray(Array.empty[String]).toSeq.filter(_.startsWith(prefix)))
  }

  /** Current value of one gauge, or None if absent. */
  def gaugeValue(topic: String, name: String): Option[Long] = {
    val env = SparkEnv.get
    if (env == null) return None
    val full = MetricRegistry.name(sanitize(topic), name)
    env.metricsSystem.getSourcesByName(SourceName)
      .flatMap(s => Option(s.metricRegistry.getGauges.get(full)))
      .headOption.map(_.getValue.asInstanceOf[Long])
  }
}
