package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the deletion-vector codec: the deterministic
  * fixtures in DeletionVectorsSpec exercise the container kinds one at
  * a time; these sweep seeded random row-index sets across ALL the
  * format's regime boundaries at once (array↔bitmap container flips at
  * 4096, 16-bit key splits at 65536, 32-bit bitmap splits at 2^32,
  * z85's 4-byte grouping) — a serialize/deserialize asymmetry anywhere
  * on those edges corrupts which ROWS a reader drops, silently.
  */
class DeletionVectorsPropertySpec extends AnyFunSuite {

  private val seeds = org.scalacheck.rng.Seed(12L)

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate((g.pureApply(Gen.Parameters.default, seeds), seeds)) {
      case (_, s) =>
        val s2 = s.next
        (g.pureApply(Gen.Parameters.default, s2), s2)
    }.map(_._1).take(n).toSeq

  test("serialize/deserialize round-trips random index sets across container regimes") {
    val gen: Gen[Array[Long]] = for {
      // cluster sizes straddle the 4096 array→bitmap boundary
      nClusters <- Gen.chooseNum(1, 4)
      clusters <- Gen.listOfN(nClusters, for {
        base <- Gen.oneOf(
          Gen.chooseNum(0L, 1L << 20),            // low 32-bit space
          Gen.chooseNum((1L << 32) - 5000, (1L << 32) + 5000), // key boundary
          Gen.chooseNum(3L << 32, (3L << 32) + (1L << 18)))    // high key
        size <- Gen.oneOf(Gen.chooseNum(1, 100), Gen.chooseNum(4000, 6000))
        stride <- Gen.chooseNum(1, 7)
      } yield (0 until size).map(i => base + i.toLong * stride))
    } yield clusters.flatten.distinct.sorted.toArray
    sample(gen, 25).foreach { rows =>
      val back = DeletionVectors.deserialize(DeletionVectors.serialize(rows))
      assert(back.toSeq == rows.toSeq,
        s"round-trip diverged for ${rows.length} rows " +
          s"(head=${rows.headOption}, last=${rows.lastOption})")
    }
  }

  test("z85 round-trips arbitrary 4-byte-aligned byte strings") {
    val gen = Gen.chooseNum(1, 64).flatMap(g =>
      Gen.listOfN(g * 4, Gen.chooseNum(-128, 127).map(_.toByte)))
    sample(gen, 50).foreach { bytes =>
      val arr = bytes.toArray
      assert(DeletionVectors.z85Decode(DeletionVectors.z85Encode(arr)).toSeq ==
        arr.toSeq)
    }
  }
}
