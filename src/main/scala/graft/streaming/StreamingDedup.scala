package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.TextFunctions

/** MinHash-LSH near-duplicate detection ON INGEST — the streaming
  * counterpart of [[graft.operators.Dedup.minHashNearDups]] (one-shot
  * batch) and [[graft.operators.LshTextIndex]] (persisted index +
  * batch probes). Every arriving document is tokenized, signed, and
  * banded MAP-SIDE; the only shuffle keys each record by its (band,
  * bucket-hash) — never by a document pair — and a keyed stateful
  * processor holds the bucket's population, so a new document is
  * compared against exactly the documents that share one of its LSH
  * buckets, as they arrive, across micro-batch boundaries.
  *
  * Scale shape: per-record work is O(bands) state lookups of one
  * bucket each; state is the banded corpus (bands × (sig + toks) per
  * doc), partitioned by bucket hash — uniform by construction since
  * the bucket id IS a hash. For unbounded streams pass `ttl` so the
  * comparison window slides (RocksDB-backed state evicts expired
  * entries); the batch-equivalence spec runs without TTL.
  *
  * Semantics vs the batch operator: identical tokenize → sign → band →
  * estimate-prefilter → exact-jaccard verify chain, with one
  * deliberate refinement. Batch candidates are pairs whose band-slice
  * HASHES collide; here a pair is owned (and emitted exactly once) by
  * the first band whose slice VALUES are equal. Slice equality implies
  * hash equality, so the streamed pair set matches batch minus only
  * pairs whose every shared bucket was a 2^-32 hash accident — such a
  * pair still must pass exact-jaccard verification in batch, so a
  * divergence needs a hash collision AND a true near-dup that agrees
  * on no band, i.e. an LSH false negative batch found by luck.
  * The first-equal-band rule is what makes multi-band pairs emit ONCE
  * without a downstream distinct (a second stateful shuffle).
  */
object StreamingDedup {

  /** One (document, band) routing record. `bucket` packs
    * (band_idx << 32 | band_hash) so the shuffle key is a single long.
    */
  final case class BandedDoc(
      bucket: Long, band_idx: Int, doc_id: Long,
      sig: Array[Long], toks: Array[String])

  final case class NearDupPair(id1: Long, id2: Long, jaccard: Double)

  private[streaming] final case class BucketEntry(
      docId: Long, sig: Array[Long], toks: Array[String])

  /** Map-side prep shared with the batch semantics: sorted distinct
    * tokens (empties excluded exactly like `signatureFromUnits` — an
    * empty cohort would flood every bucket), MinHash signature via the
    * native scalar expression, one output row per band with the full
    * signature and token payload riding along.
    */
  private[streaming] def bandedDocs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int): Dataset[BandedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.expressions.MinHashAgg.register(spark)
    val rowsPerBand = numHashes / bands
    require(rowsPerBand * bands == numHashes, "bands must divide numHashes")
    val base = docs
      .select(
        col(idCol).cast("long").as("doc_id"),
        array_sort(TextFunctions.distinctTokens(col(textCol))).as("toks"))
      .filter(col("toks").isNotNull && size(array_remove(col("toks"), "")) > 0)
      .withColumn("sig",
        graft.expressions.MinHashAgg.minhashSigArr(col("toks"), numHashes))
    val bandCols = (0 until bands).map { b =>
      struct(
        lit(b).as("band_idx"),
        hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("band_hash"))
    }
    base
      .select(col("doc_id"), col("sig"), col("toks"),
        explode(array(bandCols: _*)).as("band"))
      .select(
        shiftleft(col("band.band_idx").cast("long"), 32)
          .bitwiseOR(col("band.band_hash").cast("long")
            .bitwiseAND(lit(0xFFFFFFFFL))).as("bucket"),
        col("band.band_idx").as("band_idx"),
        col("doc_id"), col("sig"), col("toks"))
      .as[BandedDoc]
  }

  /** Index of the first band (0-based) on which the two signatures are
    * slice-for-slice EQUAL, or -1. The bucket whose band_idx equals
    * this value owns the pair; every other shared bucket stays silent.
    */
  private[streaming] def firstEqualBand(
      a: Array[Long], b: Array[Long], rowsPerBand: Int, bands: Int): Int = {
    var band = 0
    while (band < bands) {
      var i = band * rowsPerBand
      val end = i + rowsPerBand
      while (i < end && a(i) == b(i)) i += 1
      if (i == end) return band
      band += 1
    }
    -1
  }

  private[streaming] def countEqual(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var n = 0
    while (i < a.length) { if (a(i) == b(i)) n += 1; i += 1 }
    n
  }

  /** Two-pointer intersection size over the sorted token arrays — the
    * in-JVM twin of the native `sorted_intersect_size` expression the
    * batch verify stage uses.
    */
  private[streaming] def sortedIntersectSize(
      a: Array[String], b: Array[String]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** Keyed per-bucket processor: compares each arriving doc against the
    * bucket population (estimate prefilter on signatures, then exact
    * jaccard on token sets), emits owned pairs, and appends the doc.
    * A doc_id already present in the bucket is NOT re-appended, so
    * replayed/duplicate ingest cannot double-emit its pairs.
    */
  class NearDupProcessor(
      numHashes: Int, bands: Int, threshold: Double, estMargin: Double,
      ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, BandedDoc, NearDupPair] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TTLConfig, TimerValues}

    @transient private var entries: ListState[BucketEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      entries = getHandle.getListState[BucketEntry](
        "entries", Encoders.product[BucketEntry],
        ttl.fold(TTLConfig.NONE)(d => TTLConfig(d)))
    }

    override def handleInputRows(
        bucket: Long, rows: Iterator[BandedDoc],
        timers: TimerValues): Iterator[NearDupPair] = {
      val rowsPerBand = numHashes / bands
      val minEqual = math.ceil(numHashes * (threshold - estMargin)).toInt
      val out = Seq.newBuilder[NearDupPair]
      // bucket population is bounded by docs colliding on THIS band
      // hash — the working set one bucket was designed to hold
      val pop = scala.collection.mutable.ArrayBuffer.empty[BucketEntry]
      entries.get().foreach(pop += _)
      val fresh = scala.collection.mutable.ArrayBuffer.empty[BucketEntry]
      rows.toSeq.sortBy(_.doc_id).foreach { r =>
        if (!pop.exists(_.docId == r.doc_id)) {
          pop.foreach { e =>
            if (firstEqualBand(r.sig, e.sig, rowsPerBand, bands) == r.band_idx &&
                countEqual(r.sig, e.sig) >= minEqual) {
              val inter = sortedIntersectSize(r.toks, e.toks)
              val j = inter.toDouble / (r.toks.length + e.toks.length - inter)
              if (j >= threshold)
                out += NearDupPair(
                  math.min(r.doc_id, e.docId), math.max(r.doc_id, e.docId), j)
            }
          }
          val entry = BucketEntry(r.doc_id, r.sig, r.toks)
          pop += entry
          fresh += entry
        }
      }
      fresh.foreach(entries.appendValue)
      out.result().iterator
    }
  }

  /** Near-dup pairs of a streaming document source, emitted as each
    * later document of a pair arrives. `docs` must be a streaming
    * DataFrame with `idCol` castable to long and `textCol` string.
    * Pass `ttl` to bound state on unbounded streams (entries older
    * than the window silently stop matching — a recall/state knob,
    * exactly like an index rebuild horizon).
    */
  def nearDupPairs(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 32, bands: Int = 16,
      threshold: Double = 0.9, estMargin: Double = 0.15,
      ttl: Option[java.time.Duration] = None): Dataset[NearDupPair] = {
    import org.apache.spark.sql.streaming.TimeMode
    val banded = bandedDocs(docs, idCol, textCol, numHashes, bands)
    import banded.sparkSession.implicits._
    val timeMode = ttl.fold(TimeMode.None())(_ => TimeMode.ProcessingTime())
    banded
      .groupByKey(_.bucket)
      .transformWithState(
        new NearDupProcessor(numHashes, bands, threshold, estMargin, ttl),
        timeMode, OutputMode.Append())
  }
}
