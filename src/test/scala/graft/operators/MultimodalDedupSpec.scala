package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Round9Ops1

/** Cross-modal dedup composition (`dedup_multimodal`): the sextet-chain
  * fixture makes each modality's edge set a DIFFERENT partial view of
  * the true cluster — these tests pin that (a) each single-modality
  * pass alone splits the sextet exactly as planted, and (b) only the
  * union of all three recovers the full component.
  */
class MultimodalDedupSpec extends SparkSpec {
  import spark.implicits._

  // 4 complete sextets — enough to show the structure, spec-fast
  private lazy val corpus =
    Round9Ops1.mmCorpus(spark, (0L until 24L).toDF("doc_id"))

  private def components(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("text edges alone find exactly the planted text pairs (0-1, 3-4 per sextet)") {
    val got = Round9Ops1.mmTextPairs(corpus).as[(Long, Long)].collect().toSet
    val want = (0L until 4L).flatMap(s =>
      Seq((6 * s, 6 * s + 1), (6 * s + 3, 6 * s + 4))).toSet
    assert(got === want)
  }

  test("image edges alone find exactly the planted raster pairs (1-2, 4-5 per sextet)") {
    val got = Round9Ops1.mmImagePairs(corpus).as[(Long, Long)].collect().toSet
    val want = (0L until 4L).flatMap(s =>
      Seq((6 * s + 1, 6 * s + 2), (6 * s + 4, 6 * s + 5))).toSet
    assert(got === want)
  }

  test("audio edges alone find exactly the planted fingerprint pairs (2-3 per sextet)") {
    val got = Round9Ops1.mmAudioPairs(corpus).as[(Long, Long)].collect().toSet
    val want = (0L until 4L).map(s => (6 * s + 2, 6 * s + 3)).toSet
    assert(got === want)
  }

  test("any single modality SPLITS the sextet; the union recovers it whole") {
    val text = Round9Ops1.mmTextPairs(corpus)
    val img = Round9Ops1.mmImagePairs(corpus)
    val aud = Round9Ops1.mmAudioPairs(corpus)
    // text-only: {0,1} and {3,4} — docs 2 and 5 unreached
    val tc = components(text)
    assert(tc(1L) === 0L && tc(4L) === 3L && !tc.contains(2L) && !tc.contains(5L))
    // image-only: {1,2} and {4,5}
    val ic = components(img)
    assert(ic(2L) === 1L && ic(5L) === 4L && !ic.contains(0L) && !ic.contains(3L))
    // audio-only: {2,3}
    val ac = components(aud)
    assert(ac(3L) === 2L && !ac.contains(0L) && !ac.contains(5L))
    // union: every doc of sextet s labels to 6s
    val uc = components(text.unionByName(img).unionByName(aud))
    for (d <- 0L until 24L)
      assert(uc(d) === 6 * (d / 6), s"doc $d in component ${uc(d)}")
  }

  test("partial tail sextets chain into prefix components (the oracle's formula)") {
    // 14 docs = 2 full sextets + tail {12, 13} (positions 0, 1 — text pair)
    val tail = Round9Ops1.mmCorpus(spark, (0L until 14L).toDF("doc_id"))
    val pairs = Round9Ops1.mmTextPairs(tail)
      .unionByName(Round9Ops1.mmImagePairs(tail))
      .unionByName(Round9Ops1.mmAudioPairs(tail))
    val uc = components(pairs)
    for (d <- 0L until 14L)
      assert(uc(d) === 6 * (d / 6), s"doc $d in component ${uc(d)}")
  }
}
