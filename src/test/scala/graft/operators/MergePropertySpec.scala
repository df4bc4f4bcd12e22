package graft.operators

import java.nio.file.Files

import org.scalacheck.{Gen, rng}

import graft.SparkSpec

/** Randomized merge-layer properties: the partition-aligned rewrite must
  * be observationally identical to the plain insert-only merge, and both
  * must be idempotent, for arbitrary overlapping key sets.
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val seed0 = rng.Seed(42L)

  private def gen(seed: rng.Seed): (Seq[(Long, Int, String)], Seq[(Long, Int, String)]) = {
    // the partition-aligned contract requires key → partition to be a
    // function (like row_key embedding its year), so derive part from k
    val rowGen = for {
      k <- Gen.chooseNum(0L, 300L)
      v <- Gen.alphaStr.map(_.take(6))
    } yield (k, 2020 + (k % 6).toInt, v)
    val g = for {
      t <- Gen.listOfN(120, rowGen)
      s <- Gen.listOfN(80, rowGen)
    } yield (t.distinctBy(_._1), s.distinctBy(_._1))
    g.pureApply(Gen.Parameters.default, seed)
  }

  test("partition-aligned insert-only ≡ plain insert-only ≡ idempotent, on random data") {
    (0 until 3).foreach { trial =>
      val (targetRows, sourceRows) = gen(seed0.next(trial))
      val target = targetRows.toDF("k", "part", "v")
      val source = sourceRows.toDF("k", "part", "v")

      val plain = Merge.insertOnly(target, source, Seq("k"))
        .as[(Long, Int, String)].collect().sorted.toSeq

      val store = new TableStore(spark,
        Files.createTempDirectory(s"graft-mp$trial-").toString)
      store.overwrite("t", target, partitionBy = Seq("part"))
      Merge.insertOnlyPartitionAligned(store, "t", source, Seq("k"), "part")
      val aligned = store.read("t")
        .select($"k", $"part", $"v")
        .as[(Long, Int, String)].collect().sorted.toSeq
      assert(aligned == plain, s"trial $trial: aligned != plain")

      // idempotence
      Merge.insertOnlyPartitionAligned(store, "t", source, Seq("k"), "part")
      val again = store.read("t")
        .select($"k", $"part", $"v")
        .as[(Long, Int, String)].collect().sorted.toSeq
      assert(again == plain, s"trial $trial: rerun changed the table")
    }
  }

  private implicit class SeedOps(s: rng.Seed) {
    def next(n: Int): rng.Seed = (0 until n).foldLeft(s)((acc, _) => acc.next)
  }
}
