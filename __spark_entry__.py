"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline (HTML-wrapped documents
→ boilerplate strip → byte-identical text). ``queries``/``oracle_sql``
pair each operator from SURVEY.md §2 with an independent DuckDB oracle
where SQL-expressible; UDF-backed operators are rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from open_semantic_etl_spark.plans import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_extract_pages(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_pages": Q.q_extract_pages,
        "emails": Q.q_emails,
        "phones": Q.q_phones,
        "hashtags": Q.q_hashtags,
        "iban": Q.q_iban,
        "law_clauses": Q.q_law_clauses,
        "money": Q.q_money,
        "path_facets": Q.q_path_facets,
        "clean_title": Q.q_clean_title,
        "content_type_group": Q.q_content_type_group,
        "analysis_text": Q.q_analysis_text,
        "file_modified_dt": Q.q_file_modified_dt,
        "mapping_id": Q.q_mapping_id,
        "pricing_summary": Q.q_pricing_summary,
        "top_customers_per_nation": Q.q_top_customers_per_nation,
        "event_sessionize": Q.q_event_sessionize,
    }


_EMAIL_RE = r"[\w.-]+@[\w.-]+"
_PHONE_RE = r"[+(]?[1-9][0-9 .\-()]{8,}[0-9]"
_IBAN_RE = (
    r"\b[a-zA-Z]{2}(?: ?)[0-9]{2}(?: ?)[a-zA-Z0-9]{4}(?: ?)[0-9]{7}"
    r"(?: ?)([a-zA-Z0-9]?){0,16}\b"
)
_LAW_RE = Q.X.LAW_CLAUSE_RE.replace("(?i)", "")  # RE2 takes 'i' as option arg
_MONEY_NUM = r"\d+(?:[.,]\d+)*"
_MONEY_CUR = r"(?:\$|€|dollars|dollar|EURO|USD|EUR)"

_RICH = f"WITH rich AS (SELECT doc_id, {Q._RICH_DUCK} AS rich FROM documents)"


def oracle_sql() -> dict[str, str]:
    return {
        "extract_pages": Q.SQL_EXTRACT_PAGES,
        "emails": f"""{_RICH}
SELECT doc_id,
  array_to_string(list_sort(list_distinct(regexp_extract_all(rich, '{_EMAIL_RE}'))), ',') AS email_ss,
  array_to_string(list_sort(list_distinct(list_transform(regexp_extract_all(rich, '{_EMAIL_RE}'), x -> string_split(x, '@')[2]))), ',') AS email_domain_ss,
  array_to_string(list_sort(list_distinct(regexp_extract_all(rich, 'From: (.* )?([\\w.-]+@[\\w.-]+)', 2, 'i'))), ',') AS message_from_ss
FROM rich""",
        "phones": f"""{_RICH}
SELECT doc_id,
  array_to_string(list_sort(list_distinct(regexp_extract_all(rich, '{_PHONE_RE}'))), ',') AS phone_ss,
  array_to_string(list_sort(list_distinct(list_transform(regexp_extract_all(rich, '{_PHONE_RE}'),
    x -> (CASE WHEN x LIKE '+%' THEN '+' ELSE '' END) || regexp_replace(x, '[^0-9]', '', 'g')))), ',') AS phone_normalized_ss
FROM rich""",
        "hashtags": f"""{_RICH}
SELECT doc_id,
  array_to_string(list_filter(string_split_regex(rich, '\\s+'), x -> x[1] = '#' AND length(x) > 3), ',') AS hashtag_ss
FROM rich""",
        "iban": f"""{_RICH}
SELECT doc_id,
  array_to_string(list_sort(list_distinct(regexp_extract_all(rich, '{_IBAN_RE}', 0, 'i'))), ',') AS iban_ss
FROM rich""",
        "law_clauses": f"""{_RICH}
SELECT doc_id,
  array_to_string(list_sort(list_distinct(list_transform(regexp_extract_all(rich, '{_LAW_RE}', 0, 'i'),
    x -> regexp_replace(regexp_replace(trim(x), '^§(\\S)', '§ \\1'), '\\s+$', '')))), ',') AS law_clause_ss
FROM rich""",
        "money": f"""{_RICH}
SELECT doc_id,
  array_to_string(list_sort(list_distinct(
    regexp_extract_all(rich, '{_MONEY_NUM}\\s?{_MONEY_CUR}', 0, 'i')
    || regexp_extract_all(rich, '{_MONEY_CUR}\\s?{_MONEY_NUM}', 0, 'i'))), ',') AS money_ss
FROM rich""",
        "path_facets": """
WITH d AS (
  SELECT doc_id,
         'https://www.example.org/' || source || '/sub' || (doc_id % 3) || '/file' || doc_id || '.PdF' AS url
  FROM documents
), p AS (
  SELECT doc_id, url,
         string_split(regexp_replace(replace(replace(regexp_replace(url, '^(file://|http://|https://)', ''), '\\', '/'), '#', '/'), '//+', '/', 'g'), '/') AS parts
  FROM d
)
SELECT doc_id, parts[1] AS path0_s, parts[2] AS path1_s, parts[3] AS path2_s,
       parts[len(parts)] AS path_basename_s,
       lower(regexp_extract(url, '\\.([^./\\\\]+)$', 1)) AS filename_extension_s
FROM p""",
        "clean_title": """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'T' || doc_id
       WHEN doc_id % 3 = 1 THEN 'S' || doc_id
       ELSE 'f' || doc_id || '.pdf' END AS title_txt
FROM documents""",
        "content_type_group": """
SELECT doc_id,
  coalesce(array_to_string(list_sort(list_distinct(list_filter([
    CASE WHEN doc_id % 5 = 0 THEN 'Text document'
         WHEN doc_id % 5 = 1 THEN 'Image'
         WHEN doc_id % 5 = 2 THEN 'Text document'
         WHEN doc_id % 5 = 3 THEN 'Spreadsheet' END,
    CASE WHEN doc_id % 7 = 0 THEN 'Spreadsheet' END
  ], x -> x IS NOT NULL))), ','), '') AS content_type_group_ss
FROM documents""",
        "analysis_text": """
SELECT doc_id,
  CASE WHEN text IS NULL OR text = '' THEN 'title ' || doc_id || chr(10)
       ELSE 'title ' || doc_id || chr(10) || text || chr(10) END AS text_analysis
FROM documents""",
        "file_modified_dt": """
SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS file_modified_dt
FROM events""",
        "mapping_id": """
WITH d AS (
  SELECT doc_id,
         '/' || source || (CASE WHEN doc_id % 4 = 0 THEN '/deep' ELSE '' END) || '/f' || doc_id AS path
  FROM documents
)
SELECT doc_id,
  CASE WHEN path LIKE '/src0/deep/%' THEN 'file:///mapped-deep/' || substr(path, 12)
       WHEN path LIKE '/src0/%' THEN 'file:///mapped-src0/' || substr(path, 7)
       WHEN path LIKE '/%' THEN 'file:///' || substr(path, 2)
       ELSE path END AS mapped_id
FROM d""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       (sum(l_quantity))::double AS sum_qty,
       round(sum((l_extendedprice * (1 - l_discount))::decimal(18,6)), 2)::decimal(18,2)::varchar AS revenue,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
        "top_customers_per_nation": """
WITH spend AS (
  SELECT o_custkey, round(sum((o_totalprice)::decimal(18,6)), 2)::decimal(18,2)::varchar AS spend
  FROM orders GROUP BY o_custkey
), j AS (
  SELECT n.n_name, c.c_custkey, s.spend,
         row_number() OVER (PARTITION BY n.n_name ORDER BY s.spend DESC, c.c_custkey ASC) AS rk
  FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name, c_custkey, spend, rk FROM j WHERE rk <= 3""",
        "event_sessionize": """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN floor(epoch(ts))::bigint - lag(floor(epoch(ts))::bigint) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, session_id::bigint AS session_id, count(*) AS n_events,
       round(sum((value)::decimal(18,6)), 2)::decimal(18,2)::varchar AS session_value
FROM s GROUP BY user_id, session_id""",
    }
