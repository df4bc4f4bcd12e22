package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Round-4 batch 59: map_zip_with and malformed-JSON null semantics. */
object Round4Ops59 {

  /** map_zip_with: two per-user maps (views and purchases by weekday)
    * merged with a lambda into conversion ratios — the keyed-merge that
    * would otherwise need an explode + full outer join + re-collect.
    * Rendered through sorted keys as always.
    */
  val f_map_zip_with = OpQuery(
    "f_map_zip_with",
    """WITH counts AS (
      |  SELECT user_id, dayofweek(CAST(ts AS DATE)) AS dow,
      |         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
      |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS buys
      |  FROM events GROUP BY user_id, dayofweek(CAST(ts AS DATE)))
      |SELECT user_id,
      |       string_agg(concat(CAST(dow AS VARCHAR), ':',
      |                         CAST(buys AS VARCHAR), '/', CAST(views AS VARCHAR)),
      |                  ',' ORDER BY dow) AS conv_by_dow
      |FROM counts
      |WHERE views > 0 OR buys > 0
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_mzw_events")
    spark.sql(
      """WITH counts AS (
        |  SELECT user_id, dayofweek(CAST(ts AS DATE)) - 1 AS dow,
        |         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
        |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS buys
        |  FROM graft_mzw_events GROUP BY user_id, dayofweek(CAST(ts AS DATE)) - 1),
        |maps AS (
        |  SELECT user_id,
        |         map_from_entries(array_sort(collect_list(struct(dow, views)))) AS vm,
        |         map_from_entries(array_sort(collect_list(struct(dow, buys)))) AS bm
        |  FROM counts WHERE views > 0 OR buys > 0 GROUP BY user_id),
        |zipped AS (
        |  SELECT user_id,
        |         map_zip_with(vm, bm,
        |           (k, v, b) -> concat(CAST(coalesce(b, 0) AS STRING), '/',
        |                               CAST(coalesce(v, 0) AS STRING))) AS zm
        |  FROM maps)
        |SELECT user_id,
        |       array_join(transform(array_sort(map_keys(zm)),
        |                            k -> concat(CAST(k AS STRING), ':', zm[k])), ',') AS conv_by_dow
        |FROM zipped
        |ORDER BY user_id""".stripMargin)
  }

  /** Malformed-JSON semantics: from_json yields NULL for broken
    * documents instead of failing the scan (the PERMISSIVE contract on
    * the function surface); good rows parse fully. Bad rows are
    * constructed deterministically, so the oracle states exactly which
    * parse and which do not.
    */
  val p21_json_malformed = OpQuery(
    "p21_json_malformed",
    """SELECT doc_id,
      |       CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END AS parsed_lang,
      |       CAST(doc_id % 3 <> 0 AS BOOLEAN) AS parse_ok
      |FROM documents
      |WHERE doc_id % 7 = 0
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "documents").createOrReplaceTempView("graft_mal_docs")
    spark.sql(
      """WITH payloads AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0
        |              THEN concat('{"lang": ', lang)
        |              ELSE concat('{"lang": "', lang, '"}') END AS j
        |  FROM graft_mal_docs WHERE doc_id % 7 = 0),
        |parsed AS (
        |  SELECT doc_id, from_json(j, 'lang STRING') AS st FROM payloads)
        |SELECT doc_id,
        |       st.lang AS parsed_lang,
        |       CAST(st.lang IS NOT NULL AS BOOLEAN) AS parse_ok
        |FROM parsed
        |ORDER BY doc_id""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(f_map_zip_with, p21_json_malformed)
}
