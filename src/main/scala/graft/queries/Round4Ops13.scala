package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 13: instruction-data assembly (SFT JSONL) and text
  * normalization.
  */
object Round4Ops13 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** SFT-pair assembly: render (prompt, completion) training rows as
    * compact JSON strings — the last step before an instruction-tuning
    * export. Both engines produce byte-identical compact JSON
    * (verified: same key order, same escaping), so the gate hash-pins
    * the exact serialized bytes a trainer would read.
    */
  val format_sft_pairs = OpQuery(
    "format_sft_pairs",
    """SELECT doc_id,
      |       json_object(
      |         'prompt', 'Identify the language: ' || substr(text, 1, 120),
      |         'completion', lang)::VARCHAR AS sft_row
      |FROM documents
      |WHERE coalesce(trim(text), '') <> ''
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    t(spark, dir, "documents")
      .filter(coalesce(trim(col("text")), lit("")) =!= "")
      .select(col("doc_id"),
        to_json(struct(
          concat(lit("Identify the language: "), substring(col("text"), 1, 120))
            .as("prompt"),
          col("lang").as("completion"))).as("sft_row"))
      .orderBy(col("doc_id"))
  }

  /** Text normalization: lowercase, punctuation strip, whitespace
    * collapse, stopword removal — the canonicalization pass before
    * fingerprinting/frequency work. Map-only (one codegen'd expression
    * chain, zero shuffles beyond the final ORDER BY).
    */
  val text_normalize = OpQuery(
    "text_normalize",
    """WITH n AS (
      |  SELECT doc_id,
      |         regexp_split_to_array(
      |           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
      |                ' +', ' ', 'g')), ' ') AS toks
      |  FROM documents WHERE coalesce(trim(text), '') <> ''
      |)
      |SELECT doc_id,
      |       CAST(len(toks) AS INT) AS n_tokens,
      |       CAST(len(list_filter(toks,
      |         t -> NOT list_contains(['the','a','an','and','or','of','to','in','is'], t)))
      |         AS INT) AS n_content_tokens,
      |       array_to_string(list_filter(toks,
      |         t -> NOT list_contains(['the','a','an','and','or','of','to','in','is'], t))[1:12],
      |         ' ') AS head_normalized
      |FROM n
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val stop = array(Seq("the", "a", "an", "and", "or", "of", "to", "in", "is")
      .map(lit): _*)
    val toks = split(
      trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " ")
    val content = filter(toks, tk => !array_contains(stop, tk))
    t(spark, dir, "documents")
      .filter(coalesce(trim(col("text")), lit("")) =!= "")
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        size(content).as("n_content_tokens"),
        array_join(slice(content, 1, 12), " ").as("head_normalized"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[OpQuery] = Seq(format_sft_pairs, text_normalize)
}
