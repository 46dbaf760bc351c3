package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns.
  *
  * All pure Column math (`zip_with` + `aggregate`) → whole-stage codegen,
  * no UDFs, no driver round-trips. Inputs are cast to double before
  * accumulation so results are stable regardless of the storage type.
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Dot product of two equal-length numeric arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0 || nb === 0, 0.0).otherwise(dot(a, b) / (na * nb))
  }

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Deterministic pseudo-random unit-ish hyperplane for LSH: component j of
    * plane p = hash-derived value in [-0.5, 0.5). Seeded by (p, j) only →
    * identical on every executor with zero data movement.
    */
  def hyperplaneComponent(p: Int, j: Int): Double = {
    var h = p.toLong * 0x9e3779b97f4a7c15L + j.toLong * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h = h ^ (h >>> 31)
    (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  /** Sign-random-projection LSH bucket of a vector: `nPlanes` sign bits
    * packed into a long. Pure function, fixed seeds.
    */
  def srpBucket(vec: Seq[Float], nPlanes: Int): Long = {
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var s = 0.0
      var j = 0
      while (j < vec.length) { s += vec(j) * hyperplaneComponent(p, j); j += 1 }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def srpBucketUdf(nPlanes: Int) = udf((v: Seq[Float]) => srpBucket(v, nPlanes))

  /** SRP bucket using planes [offset, offset+nPlanes) — independent hash
    * tables for OR-amplified LSH come from disjoint plane ranges.
    */
  def srpBucketAt(vec: Seq[Float], nPlanes: Int, offset: Int): Long = {
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var s = 0.0
      var j = 0
      while (j < vec.length) { s += vec(j) * hyperplaneComponent(offset + p, j); j += 1 }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def srpBucketAtUdf(nPlanes: Int, offset: Int) =
    udf((v: Seq[Float]) => srpBucketAt(v, nPlanes, offset))

  /** Deterministic small perturbation of a vector (hash-seeded, no RNG
    * state): component j gets `eps * h(seed, j)` added, h ∈ [-0.5, 0.5).
    * Used to plant near-duplicates for the dedup pipeline — cosine of
    * (v, perturb(v)) stays ≥ ~0.99 for eps ≪ component scale.
    */
  def perturb(vec: Seq[Float], seed: Long, eps: Double): Seq[Float] = {
    val out = new Array[Float](vec.length)
    var j = 0
    while (j < vec.length) {
      out(j) = (vec(j) + eps * hyperplaneComponent((seed % 100000).toInt + 7919, j)).toFloat
      j += 1
    }
    out.toSeq
  }

  def perturbUdf(eps: Double) =
    udf((v: Seq[Float], seed: Long) => perturb(v, seed, eps))
}
