package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RateAllocator
import graft.sources.RateAllocator.PartitionConfig

/** Acceptance numbers pinned by the reference's own tests
  * (pulsar-spark-dstream .../PulsarHelperTest.scala:72-99): backlogs
  * {100, 0, 1000}, maxRate 20, minRate 1, avgMsgsPerEntry 1, 5 s batch.
  */
class RateAllocatorSpec extends AnyFunSuite {

  private val backlogs = Seq(100L, 0L, 1000L)
  private val conf = (_: Int) => PartitionConfig(maxRatePerSec = 20.0)

  test("estimated rate 10 → entries {5, 0, 46}") {
    assert(RateAllocator.maxEntriesPerPartition(Some(10L), backlogs, 5000, conf)
      == Seq(5L, 0L, 46L))
  }

  test("estimated rate 40 → entries {19, 0, 100}") {
    assert(RateAllocator.maxEntriesPerPartition(Some(40L), backlogs, 5000, conf)
      == Seq(19L, 0L, 100L))
  }

  test("no rate estimate → maxRate everywhere, capped by backlog {100, 0, 100}") {
    assert(RateAllocator.maxEntriesPerPartition(None, backlogs, 5000, conf)
      == Seq(100L, 0L, 100L))
  }

  test("zero estimate treated as absent") {
    assert(RateAllocator.maxEntriesPerPartition(Some(0L), backlogs, 5000, conf)
      == Seq(100L, 0L, 100L))
  }

  test("min rate floors starved partitions") {
    // huge skew: partition 0 gets ~0 share but minRate=1 floors it to
    // ceil(5·1)=5 entries (capped by its backlog of 3)
    val skewed = Seq(3L, 1000000L)
    val got = RateAllocator.maxEntriesPerPartition(Some(100L), skewed, 5000, conf)
    assert(got.head == 3L)
  }

  test("byte-rate cap binds before the message cap for large entries") {
    // 1 MiB entries against a 10 MiB/s byte cap → 10 entries/s even though
    // the message cap allows 1000/s (reference maxByteRatePerPartition)
    val bigEntries = (_: Int) => PartitionConfig(maxRatePerSec = 1000.0,
      maxByteRatePerSec = 10.0 * 1024 * 1024, avgBytesPerEntry = 1024.0 * 1024)
    val got = RateAllocator.maxEntriesPerPartition(
      None, Seq(1000000L), 1000, bigEntries)
    assert(got == Seq(10L), s"got $got")
    // small entries: byte cap is slack, message cap rules
    val smallEntries = (_: Int) => PartitionConfig(maxRatePerSec = 1000.0,
      maxByteRatePerSec = 10.0 * 1024 * 1024, avgBytesPerEntry = 100.0)
    assert(RateAllocator.maxEntriesPerPartition(
      None, Seq(1000000L), 1000, smallEntries) == Seq(1000L))
  }

  test("byte-rate cap clamps the backpressure share too") {
    val bigEntries = (_: Int) => PartitionConfig(maxRatePerSec = 1000.0,
      maxByteRatePerSec = 5.0 * 1024 * 1024, avgBytesPerEntry = 1024.0 * 1024)
    // share would be 500 entries/s; byte cap holds it to 5/s → 5 entries
    val got = RateAllocator.maxEntriesPerPartition(
      Some(500L), Seq(1000L), 1000, bigEntries)
    assert(got == Seq(5L), s"got $got")
  }

  test("partition pinning is stable and wraps the sorted host list") {
    import graft.sources.LedgerSource
    val hosts = Seq("exec-a", "exec-b", "exec-c")
    assert(LedgerSource.pinTo(hosts, 0).toSeq == Seq("exec-a"))
    assert(LedgerSource.pinTo(hosts, 4).toSeq == Seq("exec-b"))
    assert(LedgerSource.pinTo(hosts, 5).toSeq == Seq("exec-c"))
    assert(LedgerSource.pinTo(Nil, 3).isEmpty)
    // same partition → same host on every call (cache reuse across batches)
    assert(LedgerSource.pinTo(hosts, 7).toSeq == LedgerSource.pinTo(hosts, 7).toSeq)
  }
}
