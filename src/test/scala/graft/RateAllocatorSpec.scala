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
}
