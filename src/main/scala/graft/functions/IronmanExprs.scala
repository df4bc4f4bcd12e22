package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's derived-semantic operators (SURVEY.md §2.8 D1–D12) as
  * pure `Column => Column` functions — unit-testable without IO and fully
  * codegen'd (no UDFs anywhere).
  *
  * Each function cites the reference cell whose observable behavior it
  * reproduces; the implementations are written Spark-first against
  * `org.apache.spark.sql.functions`.
  */
object IronmanExprs {

  /** D1 — parse `H:MM:SS` to integer seconds.
    * NULL when the input is NULL **or** the parsed sum is 0 (the
    * reference treats `0:00:00` as missing).
    * Ref: 03_silver.ipynb:131-141 (cell-3).
    */
  def parseTimeToSeconds(time: Column): Column = {
    val parts = split(time, ":")
    // get() (not getItem) tolerates short arrays under ANSI mode — the
    // reference ran with pre-ANSI semantics where OOB index yields NULL.
    val seconds =
      coalesce(get(parts, lit(0)).cast("int"), lit(0)) * 3600 +
        coalesce(get(parts, lit(1)).cast("int"), lit(0)) * 60 +
        coalesce(get(parts, lit(2)).cast("int"), lit(0))
    when(time.isNull || seconds === 0, lit(null)).otherwise(seconds)
  }

  /** Inverse of D1 — the dashboard `H:MM:SS` formatter:
    * FLOOR(s/3600) ':' LPAD(mm) ':' LPAD(ss).
    * Ref: 05_dashboard_queries.ipynb:613-618 (vw_top_finishers).
    */
  def formatSeconds(secs: Column): Column =
    concat(
      floor(secs / 3600).cast("string"),
      lit(":"),
      lpad(floor((secs % 3600) / 60).cast("string"), 2, "0"),
      lit(":"),
      lpad((secs % 60).cast("string"), 2, "0"))

  /** Name normalization shared by D2/D3: lowercase, strip every
    * non-alphanumeric (note: strips non-ASCII letters too — `Løvseth` →
    * `lvseth`, a reference quirk we preserve).
    * Ref: 02_bronze.ipynb:211-212 (cell-5), 04a:133-136 (cell-4).
    */
  def cleanName(name: Column): Column =
    lower(regexp_replace(name, "[^a-zA-Z0-9]", ""))

  /** D2 — stable row id: `year_gender_cleanedname_dupRank`. The caller
    * supplies dupRank (a row_number over the dedup window, see
    * [[graft.pipeline.Bronze]]).
    * Ref: 02_bronze.ipynb:208-230 (cell-5).
    */
  def rowKey(year: Column, gender: Column, nameClean: Column, dupRank: Column): Column =
    concat(
      year.cast("string"), lit("_"),
      gender, lit("_"),
      nameClean, lit("_"),
      dupRank.cast("string"))

  /** D3 — athlete natural key: cleaned name `_` country (NULL country →
    * literal "UNKNOWN"). One shared definition (the reference duplicates
    * this verbatim in 04a and 04d).
    * Ref: 04a_gold_dim_athletes.ipynb:130-139 (cell-4), 04d:143-150 (cell-3).
    */
  def athleteNaturalKey(name: Column, country: Column): Column =
    lower(concat_ws("_",
      regexp_replace(name, "[^a-zA-Z0-9]", ""),
      coalesce(country, lit("UNKNOWN"))))

  /** D4 — surrogate keys: `abs(hash(...))`, Spark Murmur3 with default
    * seed 42. `abs(Int.MinValue)` stays negative — a documented edge we
    * preserve for key compatibility. NB the athlete hash input is keyed
    * differently from D3: NULL country contributes nothing to concat_ws
    * (no "UNKNOWN"), per 04a:189-195 (cell-6).
    * Ref: 04a:194, 04b:324, 04c:269, 04d:224.
    */
  def surrogateKey(cols: Column*): Column =
    abs(hash(cols: _*))

  def athleteSurrogateKey(name: Column, country: Column): Column =
    surrogateKey(concat_ws("_", name, country))

  /** D5 — status flags from designation: equality on UPPER, never NULL.
    * Ref: 03_silver.ipynb:257-260 (cell-6).
    */
  def statusFlag(designation: Column, value: String): Column =
    when(upper(designation) === value, lit(true)).otherwise(lit(false))

  /** D6 — calculated total: null-propagating sum of the five segments.
    * Ref: 03_silver.ipynb:261-271 (cell-6).
    */
  def calculatedTotalSeconds(
      swim: Column, t1: Column, bike: Column, t2: Column, run: Column): Column =
    swim + t1 + bike + t2 + run

  /** D8 — time-consistency delta: |finish - calculated|, NULL if either
    * side is NULL. Ref: 03_silver.ipynb:286-296 (cell-7).
    */
  def timeDifference(finish: Column, calculated: Column): Column =
    when(finish.isNull || calculated.isNull, lit(null))
      .otherwise(abs(finish - calculated))

  /** D9 — name split: first token; last token only when more than one.
    * Ref: 03_silver.ipynb:298-305 (cell-7).
    */
  def firstName(name: Column): Column = split(name, " ").getItem(0)

  def lastName(name: Column): Column = {
    val parts = split(name, " ")
    when(size(parts) > 1, element_at(parts, -1)).otherwise(lit(null))
  }

  /** D10 — division parsing. Ref: 04c_gold_dim_divisions.ipynb cells 4-6. */
  def divisionGender(division: Column): Column =
    when(division.startsWith("M"), "M")
      .when(division.startsWith("F"), "F")
      .otherwise("UNKNOWN")

  def isProfessional(division: Column): Column =
    when(division.contains("PRO"), lit(true)).otherwise(lit(false))

  private def ageRange(division: Column): Column =
    regexp_extract(division, "(\\d+\\-\\d+)", 1)

  def ageGroupStart(division: Column): Column =
    when(ageRange(division) =!= "",
      split(ageRange(division), "-").getItem(0).cast("integer"))
      .otherwise(lit(null))

  def ageGroupEnd(division: Column): Column =
    when(ageRange(division) =!= "",
      split(ageRange(division), "-").getItem(1).cast("integer"))
      .otherwise(lit(null))

  /** Human description with nested fallbacks: "Male Professional",
    * "Female Age 18 to 24", else the raw division.
    * Ref: 04c_gold_dim_divisions.ipynb:222-251 (cell-6).
    */
  def divisionDescription(
      division: Column, gender: Column, pro: Column,
      ageStart: Column, ageEnd: Column): Column = {
    val genderWord = when(gender === "M", lit("Male")).otherwise(lit("Female"))
    when(pro === true, concat(genderWord, lit(" Professional")))
      .when(ageStart.isNotNull,
        concat(genderWord, lit(" Age "), ageStart, lit(" to "), ageEnd))
      .otherwise(division)
  }

  /** D12 — gender display label. `vw_gender_distribution` maps only 'M'
    * (else passthrough); all other views map M/else-Female. Both provided.
    * Ref: 05_dashboard_queries.ipynb:222-226 vs :429.
    */
  def genderLabel(sourceGender: Column): Column =
    when(sourceGender === "M", "Male").otherwise("Female")

  def genderLabelPassthrough(sourceGender: Column): Column =
    when(sourceGender === "M", "Male").otherwise(sourceGender)
}
