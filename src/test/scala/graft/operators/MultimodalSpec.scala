package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val media =
    Multimodal.syntheticMedia(Tables.load(spark, sf, "documents")).cache()

  test("synthetic media: payload round-trips the source text") {
    val roundTrip = media
      .select($"media_id", decode($"payload", "UTF-8").as("text2"))
      .join(Tables.load(spark, sf, "documents")
        .select($"doc_id".as("media_id"), $"text"), "media_id")
      .filter($"text" =!= $"text2")
    assert(roundTrip.count() == 0)
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }

  test("extractFeatures: mapPartitions batch keeps schema, drops payload, deterministic") {
    val feats = Multimodal.extractFeatures(media, k = 8)
    assert(!feats.columns.contains("payload"))
    assert(feats.columns.contains("features"))
    assert(feats.count() == media.count())
    // deterministic: same input -> same features
    val a = feats.select($"media_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Multimodal.extractFeatures(media, k = 8)
      .select($"media_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
    assert(a.values.forall(f => f.length == 8 && f.forall(x => x >= 0 && x <= 130)))
  }

  test("frameSample explodes only video rows, every 5th frame") {
    val frames = Multimodal.frameSample(media, everyNth = 5)
    val videos = media.filter($"modality" === "video")
      .select($"media_id", ($"meta.n_frames").as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(videos.nonEmpty)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == videos.keySet)
    videos.foreach { case (id, n) =>
      assert(counts(id) == (n + 4) / 5, s"media $id n_frames=$n")
    }
    assert(frames.filter($"frame_idx" % 5 =!= 0).count() == 0)
  }

  test("resizeMeta scales down to max dim, preserves aspect-ish, never upscales") {
    val resized = Multimodal.resizeMeta(media, maxDim = 256)
    val bad = resized.filter(
      $"meta.width" > 256 || $"meta.height" > 256 ||
        $"meta.width" < 1 || $"meta.height" < 1)
    assert(bad.count() == 0)
    // small assets unchanged
    val unchanged = media.filter($"meta.width" <= 256 && $"meta.height" <= 256)
      .select($"media_id", $"meta.width".as("w"), $"meta.height".as("h"))
    val after = resized.select($"media_id", $"meta.width".as("w2"), $"meta.height".as("h2"))
    assert(unchanged.join(after, "media_id")
      .filter($"w" =!= $"w2" || $"h" =!= $"h2").count() == 0)
  }
}
