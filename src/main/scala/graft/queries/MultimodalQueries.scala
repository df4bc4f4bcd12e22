package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column plumbing at the driver gate: binary payloads with
  * typed metadata derived deterministically from `documents`
  * (the container has no codecs — decode is stubbed; see
  * [[graft.operators.Multimodal]]).
  */
object MultimodalQueries {

  private def media(spark: SparkSession, dir: String): DataFrame =
    Multimodal.syntheticMedia(Tables.load(spark, dir, "documents"))

  /** Binary column handling: payload length, content hash, modality
    * dispatch, metadata resize transform — everything except the decode
    * itself, oracled byte-for-byte.
    */
  val mm_media_meta = OpQuery(
    "mm_media_meta",
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |  CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
      |  md5(text) AS payload_md5,
      |  CAST(doc_id % 640 + 1 AS INT) AS width,
      |  CAST(doc_id % 480 + 1 AS INT) AS height,
      |  CAST(CEIL((doc_id % 640 + 1) * LEAST(1.0, 256.0 / GREATEST(doc_id % 640 + 1, doc_id % 480 + 1))) AS INT) AS resized_width,
      |  CAST(CEIL((doc_id % 480 + 1) * LEAST(1.0, 256.0 / GREATEST(doc_id % 640 + 1, doc_id % 480 + 1))) AS INT) AS resized_height
      |FROM documents
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    val m = media(spark, dir)
    val resized = Multimodal.resizeMeta(m, maxDim = 256)
      .select(col("media_id"), col("meta.width").as("resized_width"),
        col("meta.height").as("resized_height"))
    m.select(
        col("media_id"), col("modality"),
        length(col("payload")).as("payload_bytes"),
        md5(col("payload")).as("payload_md5"),
        col("meta.width").as("width"),
        col("meta.height").as("height"))
      .join(resized, "media_id")
      .orderBy(col("media_id"))
  }

  /** Frame sampling: explode per-video frame indices, keep every 5th —
    * pure relational plumbing over the meta column.
    */
  val mm_frame_sample = OpQuery(
    "mm_frame_sample",
    """SELECT doc_id AS media_id, CAST(f.frame_idx AS INT) AS frame_idx
      |FROM documents, unnest(generate_series(0, CAST(doc_id % 50 AS INT))) AS f(frame_idx)
      |WHERE doc_id % 3 = 2 AND f.frame_idx % 5 = 0
      |ORDER BY media_id, frame_idx""".stripMargin) { (spark, dir) =>
    Multimodal.frameSample(media(spark, dir), everyNth = 5)
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Batched feature extraction through mapPartitions with the stubbed
    * decoder. The stub is md5-derived, so the oracle replicates it in
    * SQL (first md5 byte via hex cast) — the gate hash-checks the whole
    * mapPartitions/decode/schema path, not just row counts; the full
    * 8-feature vector stays pinned in MultimodalSpec.
    */
  val mm_features = OpQuery(
    "mm_features",
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |  CAST(ROUND((CAST(('0x' || substr(md5(text), 1, 2)) AS INT) * 31
      |       + octet_length(encode(text)) % 97) / 255.0, 6) AS DOUBLE) AS f0,
      |  CAST(8 AS INT) AS n_features
      |FROM documents
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    Multimodal.extractFeatures(media(spark, dir), k = 8)
      .select(col("media_id"), col("modality"),
        round(element_at(col("features"), 1), 6).as("f0"),
        size(col("features")).as("n_features"))
      .orderBy(col("media_id"))
  }

  val all: Seq[OpQuery] = Seq(mm_media_meta, mm_frame_sample, mm_features)
}
