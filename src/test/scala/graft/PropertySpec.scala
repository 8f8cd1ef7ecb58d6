package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ScoredId, TopKAgg}

/** Property tests for the pure determinism claims that the oracle
  * queries can only sample: bounded top-k selection must be
  * merge-order-invariant (the map-side partial aggregation contract),
  * including under NaN scores and duplicate (score, id) pairs.
  * (Plain ScalaCheck generators sampled in a loop with FIXED seeds —
  * the scalatest bridge artifact is not in the offline cache, and a
  * random per-run seed would make failures unreproducible.)
  */
class PropertySpec extends AnyFunSuite {

  private val agg = new TopKAgg(5)
  private val rnd = new scala.util.Random(42)

  private def viaReduce(xs: Seq[ScoredId]): Seq[ScoredId] =
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce))

  private val genScore: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(-10.0, 10.0),
    1 -> Gen.const(Double.NaN),
    1 -> Gen.oneOf(Double.PositiveInfinity, Double.NegativeInfinity, -0.0, 0.0))

  private val genItems: Gen[List[ScoredId]] = Gen.listOf(
    for {
      s <- genScore
      id <- Gen.chooseNum(0L, 30L) // small range forces score AND id ties
    } yield ScoredId(s, id))

  /** Deterministic draw: pureApply with a per-iteration seed (throws
    * rather than silently degrading to Nil on generator failure).
    */
  private def sample(i: Long): List[ScoredId] =
    genItems.pureApply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i))

  // NaN-aware comparison: bit patterns make NaN == NaN, -0.0 != 0.0
  private def bits(s: Seq[ScoredId]): Seq[(Long, Long)] =
    s.map(x => (java.lang.Double.doubleToLongBits(x.score), x.id))

  test("top-k is invariant to input order (map-side partial contract)") {
    (1 to 300).foreach { i =>
      val items = sample(i.toLong)
      val expected = viaReduce(items)
      assert(bits(expected) == bits(viaReduce(rnd.shuffle(items))))
      assert(bits(expected) == bits(viaReduce(items.reverse)))
    }
  }

  test("merge is commutative and agrees with single-pass reduce") {
    (1 to 300).foreach { i =>
      val (a, b) = (sample(1000L + i), sample(2000L + i))
      val pa = a.foldLeft(agg.zero)(agg.reduce)
      val pb = b.foldLeft(agg.zero)(agg.reduce)
      assert(bits(agg.finish(agg.merge(pa, pb))) ==
        bits(agg.finish(agg.merge(pb, pa))))
      assert(bits(agg.finish(agg.merge(pa, pb))) == bits(viaReduce(a ++ b)))
    }
  }

  test("k=0 returns empty for any input") {
    val zeroAgg = new TopKAgg(0)
    (1 to 100).foreach { i =>
      val items = sample(3000L + i)
      assert(zeroAgg.finish(items.foldLeft(zeroAgg.zero)(zeroAgg.reduce)).isEmpty)
    }
  }
}
