package graft.compress

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class GorillaSpec extends AnyFunSuite {

  private def roundTrip(pts: Seq[(Long, Double)]): Unit = {
    val decoded = Gorilla.decode(Gorilla.encode(pts))
    assert(decoded.length == pts.length)
    pts.zip(decoded).foreach { case ((t1, v1), (t2, v2)) =>
      assert(t1 == t2, s"ts mismatch $t1 vs $t2")
      assert(java.lang.Double.doubleToRawLongBits(v1) ==
        java.lang.Double.doubleToRawLongBits(v2), s"value mismatch $v1 vs $v2")
    }
  }

  test("empty and single-point series") {
    roundTrip(Seq.empty)
    roundTrip(Seq((1704067200000000L, 42.0)))
    roundTrip(Seq((0L, 0.0)))
    roundTrip(Seq((Long.MaxValue / 2, -1.5e300)))
  }

  test("constant values, regular cadence (best case)") {
    val pts = (0 until 1000).map(i => (1704067200000000L + i * 30000000L, 7.25))
    roundTrip(pts)
    val encoded = Gorilla.encode(pts)
    // dod==0 and xor==0 after the first two points → ~2 bits/point
    assert(encoded.length < pts.length * 2,
      s"compression too weak: ${encoded.length} bytes for ${pts.length} points")
  }

  test("irregular micros-jittered cadence, varying values") {
    val rng = new scala.util.Random(7)
    var ts = 1704067200000000L
    val pts = (0 until 500).map { _ =>
      ts += 1000000L + rng.nextInt(2000000)
      (ts, rng.nextGaussian() * 1e6)
    }
    roundTrip(pts)
  }

  test("sign flips, zeros, subnormals, extreme magnitudes") {
    val vals = Seq(0.0, -0.0, 1.0, -1.0, Double.MinPositiveValue,
      -Double.MinPositiveValue, 1e308, -1e308, 3.14159, -2.71828,
      Double.PositiveInfinity, Double.NegativeInfinity)
    val pts = vals.zipWithIndex.map { case (v, i) => (1000000L * i, v) }
    roundTrip(pts)
  }

  test("large delta-of-delta (hour-scale gaps in micros)") {
    val pts = Seq(
      (1704067200000000L, 1.0),
      (1704067260000000L, 2.0),   // +60 s
      (1704070860000000L, 3.0),   // +1 h  (dod ≈ 3.5e9 → 64-bit path)
      (1704070861000000L, 4.0),   // +1 s  (large negative dod)
      (1704157261000000L, 5.0))   // +1 d
    roundTrip(pts)
  }

  test("property: any sorted series round-trips bit-exact") {
    val deltaGen = Gen.chooseNum(0L, 7200000000L) // 0..2h in micros
    val valueGen = Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9),
      Gen.const(0.0),
      Gen.chooseNum(-50, 50).map(_.toDouble),
      Gen.chooseNum(Double.MinValue / 2, Double.MaxValue / 2))
    val seriesGen = for {
      n <- Gen.chooseNum(0, 300)
      deltas <- Gen.listOfN(n, deltaGen)
      values <- Gen.listOfN(n, valueGen)
      start <- Gen.chooseNum(0L, 2000000000000000L)
    } yield deltas.scanLeft(start)(_ + _).tail.zip(values)
    // drive scalacheck deterministically (scalatestplus bridge not cached)
    (0 until 200).foreach { i =>
      val pts = seriesGen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator failed at seed $i"))
      roundTrip(pts)
    }
  }

  test("size regression vs raw on realistic 30s-cadence metric") {
    val rng = new scala.util.Random(11)
    var ts = 1704067200000000L
    var v = 100.0
    val pts = (0 until 2000).map { _ =>
      ts += 30000000L
      v += (rng.nextInt(5) - 2) // small integer steps, Gorilla-friendly
      (ts, v)
    }
    val enc = Gorilla.encode(pts)
    val rawBytes = pts.length * 16
    assert(enc.length < rawBytes / 4,
      s"expected ≥4x compression, got ${rawBytes.toDouble / enc.length}x")
    roundTrip(pts)
  }
}
