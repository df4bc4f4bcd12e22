package graft.operators

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Driver-side replay of a Delta `_delta_log` JSON history into the
  * live add-file set and the table's current protocol — the state a
  * log-appending WRITER ([[DeltaExport.appendDeletionVectors]],
  * [[DeltaReorg]]) must consult before committing (ADVICE r12: the old
  * writer consulted nothing, so re-deleting from a file that already
  * carried a deletion vector silently replaced the descriptor and
  * resurrected rows, and the protocol action silently dropped any
  * pre-existing table features).
  *
  * Scope: complete JSON histories only (version 0 upward, contiguous).
  * A checkpoint-floored log — early JSON cleaned up, state only
  * recoverable through the parquet checkpoint — REFUSES loudly: this is
  * metadata-sized driver work (jackson over a few thousand log lines),
  * and wiring the distributed checkpoint reader into the write path
  * would hide a Spark dependency inside a pure-JVM API. Read such
  * tables with [[DeltaImport]] (which does speak checkpoints) and
  * rewrite them into an owned table first.
  *
  * Path keying: `add.path` EXACTLY as recorded in the log (Delta paths
  * may be URL-encoded by other writers; this engine's own exports write
  * them verbatim) — callers pass the same strings they read from the
  * log or wrote themselves.
  */
private[operators] object DeltaLogReplay {

  final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  final case class LiveAdd(path: String, partitionValuesJson: String,
      size: Long, dv: Option[DvDescriptor])

  /** Latest protocol action seen in the replay (Delta default 1/2 when
    * a forged log carries none). The `*WithLegacy` views expand the
    * features a LEGACY version number implies (PROTOCOL.md's upgrade
    * rule: moving to table features must list them explicitly), so a
    * feature-writing commit can union instead of clobber.
    */
  final case class ProtocolState(minReaderVersion: Int, minWriterVersion: Int,
      readerFeatures: Seq[String], writerFeatures: Seq[String]) {
    def readerFeaturesWithLegacy: Seq[String] =
      if (minReaderVersion >= 3) readerFeatures
      else if (minReaderVersion >= 2) Seq("columnMapping")
      else Seq.empty
    def writerFeaturesWithLegacy: Seq[String] =
      if (minWriterVersion >= 7) writerFeatures
      else Seq(
        2 -> Seq("appendOnly", "invariants"),
        3 -> Seq("checkConstraints"),
        4 -> Seq("changeDataFeed", "generatedColumns"),
        5 -> Seq("columnMapping"),
        6 -> Seq("identityColumns"))
        .filter(_._1 <= minWriterVersion).flatMap(_._2)
  }

  private val JsonCommit = """(\d{20})\.json""".r

  /** (live adds by path, latest protocol, max commit version). */
  def replay(tableRoot: Path): (Map[String, LiveAdd], ProtocolState, Long) = {
    val logDir = tableRoot.resolve("_delta_log")
    require(Files.isDirectory(logDir), s"not a Delta table: $tableRoot")
    val listing = Files.list(logDir)
    val names = try listing.iterator().asScala
      .map(_.getFileName.toString).toSeq finally listing.close()
    val versions = names.collect { case JsonCommit(v) => v.toLong }.sorted
    require(versions.nonEmpty, s"empty _delta_log at $tableRoot")
    require(versions.head == 0L && versions == (versions.head to versions.last),
      s"JSON history at $tableRoot is not complete from version 0 " +
        s"(have ${versions.head}..${versions.last}, ${versions.size} commits) — " +
        "checkpoint-floored logs must be read through DeltaImport, not appended to")

    val mapper = new ObjectMapper
    val live = scala.collection.mutable.LinkedHashMap.empty[String, LiveAdd]
    var protocol = ProtocolState(1, 2, Seq.empty, Seq.empty)
    versions.foreach { v =>
      val lines = Files.readAllLines(logDir.resolve(f"$v%020d.json")).asScala
      lines.filter(_.trim.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        val add = node.get("add")
        val remove = node.get("remove")
        val proto = node.get("protocol")
        if (add != null) {
          val path = add.get("path").asText()
          val dv = Option(add.get("deletionVector")).map { d =>
            DvDescriptor(
              d.get("storageType").asText(),
              d.get("pathOrInlineDv").asText(),
              Option(d.get("offset")).map(_.asInt()),
              d.get("sizeInBytes").asInt(),
              d.get("cardinality").asLong())
          }
          val pv = Option(add.get("partitionValues"))
            .map(_.toString).getOrElse("{}")
          live(path) = LiveAdd(path, pv, add.get("size").asLong(), dv)
        } else if (remove != null) {
          live.remove(remove.get("path").asText())
        } else if (proto != null) {
          def strSeq(n: JsonNode): Seq[String] =
            if (n == null) Seq.empty
            else n.elements().asScala.map(_.asText()).toSeq
          protocol = ProtocolState(
            proto.get("minReaderVersion").asInt(),
            proto.get("minWriterVersion").asInt(),
            strSeq(proto.get("readerFeatures")),
            strSeq(proto.get("writerFeatures")))
        }
      }
    }
    (live.toMap, protocol, versions.last)
  }
}
