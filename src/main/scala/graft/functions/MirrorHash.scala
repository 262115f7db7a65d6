package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The DuckDB-mirrorable hash family behind MinHash, SimHash, and LSH
  * banding: affine transforms `(a·fp + b) mod P` over the
  * [[TextFunctions.Fingerprint]] polynomial (P = 2³¹−1), with a
  * polynomial band combiner. Every value stays < 2⁶² so BIGINT
  * arithmetic never overflows in either engine — the whole family has
  * an exact SQL mirror ([[affineSql]]/[[bandCombineSql]]), which is
  * what lets the minhash/simhash/Jaccard-LSH queries be HASH-checked
  * against the DuckDB oracle instead of rows-only (the r3 verdict's
  * top ask). `hash`/`xxhash64` (murmur3/xx64) have no DuckDB
  * counterpart; this family trades a few bits of width for a provable
  * correctness gate.
  *
  * Statistical shape: `a` is drawn uniformly from [1, P−1] and `b`
  * from [0, P−1] via a splitmix64 stream — the classic universal
  * (Carter–Wegman) family over the fingerprint's 31-bit domain.
  * Pairwise independence is exactly what MinHash's Jaccard estimator
  * and SimHash's sign hashes require.
  */
object MirrorHash {

  /** 2³¹ − 1 (Mersenne prime) — the fingerprint modulus. */
  val P: Long = 2147483647L

  /** Band combiner multiplier (prime, ≈2²⁰: acc·M + mh < 2⁵² < 2⁶²). */
  val BandMult: Long = 1000003L

  /** splitmix64 finalizer — same deterministic stream as
    * [[graft.operators.Similarity]]'s hyperplanes, ONE definition
    * ([[SplitMix]]): no RNG state, every engine and the oracle
    * generator see identical constants.
    */
  private def mixed(seed: Long, k: Long): Long = SplitMix.mix(seed, k)

  /** Multiplier of the i-th affine transform: uniform in [1, P−1]. */
  def a(salt: Long, i: Int): Long = Math.floorMod(mixed(salt, 2L * i), P - 1) + 1

  /** Offset of the i-th affine transform: uniform in [0, P−1]. */
  def b(salt: Long, i: Int): Long = Math.floorMod(mixed(salt, 2L * i + 1), P)

  val MinHashSalt: Long = 0x4D696E4861736CL // "MinHasl"
  val SimHashSalt: Long = 0x53696D4861736CL // "SimHasl"
  val SampleSalt: Long = 0x53616D706C65L    // "Sample" — TrainingSet ranks
  val IvfSalt: Long = 0x49564661736CL       // "IVFasl" — k-means init order
  val CmsSalt: Long = 0x436D536B65746368L   // "CmSketch" — count-min rows

  /** `(a·fp + b) mod P` as a Column (fp must be a fingerprint in
    * [0, P): the product stays < 2⁶²).
    */
  def affine(fp: Column, aa: Long, bb: Long): Column =
    (fp * lit(aa) + lit(bb)) % lit(P)

  /** Exact DuckDB mirror of [[affine]]. */
  def affineSql(expr: String, aa: Long, bb: Long): String =
    s"((($expr) * $aa + $bb) % $P)"

  /** Polynomial combine of a band's minhash columns into one band key:
    * h ← (h·M + mh) mod P, left to right.
    */
  def bandCombine(cols: Seq[Column]): Column =
    cols.foldLeft(lit(0L))((acc, c) => (acc * lit(BandMult) + c) % lit(P))

  /** Exact DuckDB mirror of [[bandCombine]]. */
  def bandCombineSql(exprs: Seq[String]): String =
    exprs.foldLeft("CAST(0 AS BIGINT)")((acc, e) =>
      s"((($acc) * $BandMult + ($e)) % $P)")
}
