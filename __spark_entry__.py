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
from open_semantic_etl_spark.plans import queries_ext as QX

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_extract_pages(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """≤50 entries by contract: the correctness driver records at most
    50 rows, so same-grain single-operator queries are consolidated
    (scalar_extracts = emails+phones+hashtags+iban+law+money,
    doc_meta = clean_title+content_type_group+analysis_text,
    text_stats = text_quality+token_count+fingerprint+curation +
    the IN-ENGINE-TRAINED hashed-NB classifier (clf_trained_d) and
    bigram-LM perplexity (lm_ppl_d) — both models trained inside the
    query and re-derived by the DuckDB twin,
    path_mapping = path_facets+mapping_id,
    ann = brute+lsh+ivf+pq+ivfpq tagged by `method`,
    minhash_lsh = batch pairs + incremental index probe tagged by `kind`,
    host_cap = per-host cap + stratified sampling + DSIR weight columns,
    ner = span-model+stanford-token paths tagged by `method`,
    rss_new_items = rss indexed-skip + sparql bindings walk tagged by
    `kind`, pst_explode = member tree + RFC-822 parse of .eml children,
    with every third container a real [MS-PST] Unicode file decoded by
    the native operators/pst.py parser)
    — every operator's solo columns keep their names, so each stays
    pinned by the oracle hash."""
    return {
        "extract_pages": Q.q_extract_pages,
        "scalar_extracts": Q.q_scalar_extracts,
        "path_mapping": Q.q_path_mapping,
        "doc_meta": Q.q_doc_meta,
        "file_modified_dt": Q.q_file_modified_dt,
        "pricing_summary": Q.q_pricing_summary,
        "top_customers_per_nation": Q.q_top_customers_per_nation,
        "event_sessionize": Q.q_event_sessionize,
        # --- corpus-curation tier ---
        "dedup_exact": Q.q_dedup_exact,
        "dedup_jaccard": Q.q_dedup_jaccard,
        "dup_clusters": Q.q_dup_clusters,
        "minhash_lsh": Q.q_minhash_lsh,
        "simhash": Q.q_simhash,
        "ann": Q.q_ann,
        "paragraph_dedup": Q.q_paragraph_dedup,
        "text_stats": Q.q_text_stats,
        "language_detect": Q.q_language_detect,
        "sentences": Q.q_sentences,
        # --- container explodes, filters, joins, NER, RDF, OCR ---
        **QX.EXT_QUERIES,
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

# Gopher-verdict oracle tail appended to the text_stats signal SQL —
# the rule conditions come from the SAME dict the Spark side evaluates
# (operators/textstats.py CURATION_RULES), so the spec is single-sourced.
from open_semantic_etl_spark.operators.textstats import CURATION_RULES as _CR
from open_semantic_etl_spark.operators.textstats import (
    QUALITY_CLF_DIM as _CLF_DIM,
    quality_clf_weights as _clf_weights,
)

_CLF_W = ", ".join(repr(w) for w in _clf_weights())

_CURATION_CASES = ", ".join(
    f"CASE WHEN {cond} THEN '{name}' END" for name, cond in sorted(_CR.items())
)
_CURATION_TAIL = f""", verdict AS (
  SELECT *, list_filter([{_CURATION_CASES}], x -> x IS NOT NULL) AS _r FROM stats
)
SELECT * EXCLUDE (_r),
       coalesce(array_to_string(list_sort(_r), ','), '') AS drop_reasons_s,
       (len(_r) = 0)::int AS keep_i
FROM verdict"""


def oracle_sql() -> dict[str, str]:
    return {
        "extract_pages": Q.SQL_EXTRACT_PAGES,
        "scalar_extracts": f"""{_RICH}
SELECT doc_id,
  array_to_string(list_sort(list_distinct(regexp_extract_all(rich, '{_EMAIL_RE}'))), ',') AS email_ss,
  array_to_string(list_sort(list_distinct(list_transform(regexp_extract_all(rich, '{_EMAIL_RE}'), x -> string_split(x, '@')[2]))), ',') AS email_domain_ss,
  array_to_string(list_sort(list_distinct(regexp_extract_all(rich, 'From: (.* )?([\\w.-]+@[\\w.-]+)', 2, 'i'))), ',') AS message_from_ss,
  array_to_string(list_sort(list_distinct(regexp_extract_all(rich, '{_PHONE_RE}'))), ',') AS phone_ss,
  array_to_string(list_sort(list_distinct(list_transform(regexp_extract_all(rich, '{_PHONE_RE}'),
    x -> (CASE WHEN x LIKE '+%' THEN '+' ELSE '' END) || regexp_replace(x, '[^0-9]', '', 'g')))), ',') AS phone_normalized_ss,
  array_to_string(list_filter(string_split_regex(rich, '\\s+'), x -> x[1] = '#' AND length(x) > 3), ',') AS hashtag_ss,
  array_to_string(list_sort(list_distinct(regexp_extract_all(rich, '{_IBAN_RE}', 0, 'i'))), ',') AS iban_ss,
  array_to_string(list_sort(list_distinct(list_transform(regexp_extract_all(rich, '{_LAW_RE}', 0, 'i'),
    x -> regexp_replace(regexp_replace(trim(x), '^§(\\S)', '§ \\1'), '\\s+$', '')))), ',') AS law_clause_ss,
  array_to_string(list_sort(list_distinct(
    regexp_extract_all(rich, '{_MONEY_NUM}\\s?{_MONEY_CUR}', 0, 'i')
    || regexp_extract_all(rich, '{_MONEY_CUR}\\s?{_MONEY_NUM}', 0, 'i'))), ',') AS money_ss,
  regexp_replace(regexp_replace(regexp_replace(rich,
    '{_EMAIL_RE}', '<EMAIL>', 'g'),
    '{_IBAN_RE}', '<IBAN>', 'gi'),
    '{_PHONE_RE}', '<PHONE>', 'g') AS text_redacted_s
FROM rich""",
        "path_mapping": """
WITH d AS (
  SELECT doc_id,
         'https://www.example.org/' || source || '/sub' || (doc_id % 3) || '/file' || doc_id || '.PdF' AS url,
         '/' || source || (CASE WHEN doc_id % 4 = 0 THEN '/deep' ELSE '' END) || '/f' || doc_id AS path
  FROM documents
), p AS (
  SELECT doc_id, url, path,
         string_split(regexp_replace(replace(replace(regexp_replace(url, '^(file://|http://|https://)', ''), '\\', '/'), '#', '/'), '//+', '/', 'g'), '/') AS parts
  FROM d
)
SELECT doc_id, parts[1] AS path0_s, parts[2] AS path1_s, parts[3] AS path2_s,
       parts[len(parts)] AS path_basename_s,
       lower(regexp_extract(url, '\\.([^./\\\\]+)$', 1)) AS filename_extension_s,
       CASE WHEN path LIKE '/src0/deep/%' THEN 'file:///mapped-deep/' || substr(path, 12)
            WHEN path LIKE '/src0/%' THEN 'file:///mapped-src0/' || substr(path, 7)
            WHEN path LIKE '/%' THEN 'file:///' || substr(path, 2)
            ELSE path END AS mapped_id
FROM p""",
        "doc_meta": """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'T' || doc_id
       WHEN doc_id % 3 = 1 THEN 'S' || doc_id
       ELSE 'f' || doc_id || '.pdf' END AS title_txt,
  coalesce(array_to_string(list_sort(list_distinct(list_filter([
    CASE WHEN doc_id % 5 = 0 THEN 'Text document'
         WHEN doc_id % 5 = 1 THEN 'Image'
         WHEN doc_id % 5 = 2 THEN 'Text document'
         WHEN doc_id % 5 = 3 THEN 'Spreadsheet' END,
    CASE WHEN doc_id % 7 = 0 THEN 'Spreadsheet' END
  ], x -> x IS NOT NULL))), ','), '') AS content_type_group_ss,
  CASE WHEN text IS NULL OR text = '' THEN 'title ' || doc_id || chr(10)
       ELSE 'title ' || doc_id || chr(10) || text || chr(10) END AS text_analysis,
  text AS text_all,
  CASE WHEN lang = 'en' THEN text END AS text_txt_en,
  CASE WHEN lang = 'de' THEN text END AS text_txt_de,
  CASE WHEN lang = 'de' THEN text END AS text_txt_hunspell_de,
  text AS text_txt_fr,
  CASE doc_id % 4 WHEN 0 THEN 'text/html' WHEN 1 THEN 'application/pdf'
       WHEN 2 THEN 'image/png' ELSE 'application/zip' END AS content_type_magic_s,
  (CASE doc_id % 4
       WHEN 0 THEN 27 WHEN 1 THEN 10
       WHEN 2 THEN 9 ELSE 5 END + length(doc_id::varchar))::int AS file_size_i
FROM documents""",
        "file_modified_dt": """
SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS file_modified_dt
FROM events""",
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
        "dedup_exact": """
SELECT doc_id, md5(coalesce(text, '')) AS content_md5,
       CASE WHEN row_number() OVER (PARTITION BY md5(coalesce(text, '')) ORDER BY doc_id) > 1
            THEN 1 ELSE 0 END AS is_dup
FROM documents""",
        "dedup_jaccard": """
WITH sh AS (
  SELECT doc_id,
         (CASE WHEN len(w) >= 3
               THEN list_distinct(list_transform(range(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
               ELSE [w[1]] END) AS sh
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
        FROM documents WHERE doc_id < 60)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.sh, b.sh))::double /
             len(list_distinct(a.sh || b.sh)), 4) AS jaccard
FROM sh a, sh b
WHERE a.doc_id < b.doc_id
  AND round(len(list_intersect(a.sh, b.sh))::double / len(list_distinct(a.sh || b.sh)), 4) >= 0.10""",
        "dup_clusters": """
WITH RECURSIVE sh AS (
  SELECT doc_id,
         (CASE WHEN len(w) >= 3
               THEN list_distinct(list_transform(range(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
               ELSE [w[1]] END) AS sh
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
        FROM documents WHERE doc_id < 100)
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND round(len(list_intersect(a.sh, b.sh))::double / len(list_distinct(a.sh || b.sh)), 4) >= 0.015
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(id, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, reach.r FROM edges e JOIN reach ON reach.id = e.a
)
SELECT id AS doc_id, min(r) AS cluster_id,
       (min(r) = id)::int AS is_keeper
FROM reach GROUP BY id""",
        "ann": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS nbr_id,
         round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 4) AS cos
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
)
SELECT 'brute' AS method, query_id, nbr_id, cos, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id ASC) AS rk
  FROM scored
) WHERE rk <= 5
UNION ALL
SELECT 'lsh' AS method, query_id, nbr_id, cos, rk
FROM read_parquet('/root/repo/goldens/ann_lsh.parquet')
WHERE _key = (SELECT SUM(label) * 1000003 + COUNT(*) FROM embeddings)
UNION ALL
SELECT 'ivf' AS method, query_id, nbr_id, cos, rk
FROM read_parquet('/root/repo/goldens/ann_ivf.parquet')
WHERE _key = (SELECT SUM(label) * 1000003 + COUNT(*) FROM embeddings)
UNION ALL
SELECT 'pq' AS method, query_id, nbr_id, cos, rk
FROM read_parquet('/root/repo/goldens/ann_pq.parquet')
WHERE _key = (SELECT SUM(label) * 1000003 + COUNT(*) FROM embeddings)
UNION ALL
SELECT 'ivfpq' AS method, query_id, nbr_id, cos, rk
FROM read_parquet('/root/repo/goldens/ann_ivfpq.parquet')
WHERE _key = (SELECT SUM(label) * 1000003 + COUNT(*) FROM embeddings)""",
        "paragraph_dedup": """
WITH d AS (
  SELECT doc_id,
         'NAV-' || (doc_id % 7) || chr(10) || chr(10) || text ||
         chr(10) || chr(10) || 'FOOTER ' || (doc_id % 3) AS ptext
  FROM documents
), ph AS (
  SELECT DISTINCT doc_id, md5(trim(para)) AS h
  FROM (SELECT doc_id, unnest(string_split(ptext, chr(10)||chr(10))) AS para FROM d)
  WHERE trim(para) <> ''
), dup AS (
  SELECT h FROM ph GROUP BY h HAVING count(*) >= 2
), docdup AS (
  SELECT ph.doc_id, list(ph.h) AS dhs FROM ph JOIN dup USING (h) GROUP BY ph.doc_id
)
SELECT doc_id,
       array_to_string(kept, chr(10)||chr(10)) AS text_dedup,
       len(ne) AS n_paragraphs,
       len(ne) - len(list_filter(kept, x -> trim(x) <> '')) AS n_dropped
FROM (
  SELECT d.doc_id,
         list_filter(string_split(d.ptext, chr(10)||chr(10)),
                     x -> trim(x) = '' OR NOT list_contains(coalesce(dd.dhs, []), md5(trim(x)))) AS kept,
         list_filter(string_split(d.ptext, chr(10)||chr(10)), x -> trim(x) <> '') AS ne
  FROM d LEFT JOIN docdup dd USING (doc_id)
)""",
        "text_stats": f"""
WITH stats AS (
WITH clf_f AS (
  SELECT doc_id,
         lt || (CASE WHEN len(lt) >= 2
                THEN list_transform(range(1, len(lt)), i -> lt[i] || ' ' || lt[i+1])
                ELSE [] END) AS feats
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS lt
        FROM documents)
), clf AS (
  SELECT doc_id,
         CASE WHEN len(feats) > 0 THEN
           round(1.0 / (1.0 + exp(-(list_sum(list_transform(feats,
             x -> ([{_CLF_W}])[((('0x' || substr(md5(x), 1, 15))::UBIGINT % {_CLF_DIM})::int + 1)]
           )) / len(feats)))), 6)
         END AS clf_score
  FROM clf_f
), clf_tf AS (
  -- trained classifier: re-derive the hashed-NB log-odds weights from
  -- the same labeled table (the DSIR ln-ratio twin pattern). Float
  -- discipline note (same acceptance as dsir_weight_d since r4): the
  -- two engines compute ln() independently and sum per-doc terms in
  -- different orders, so agreement holds at the 4-dp round rather
  -- than bit-exactly; a knife-edge doc (mean log-odds within ~1 ulp
  -- of a .00005 boundary) COULD flip the last digit. Green at
  -- sf0.001/sf0.01 across rounds; if it ever flips, quantize the
  -- weights to 6 dp on both sides (the clf_score literal recipe)
  -- before scoring.
  SELECT doc_id, (doc_id % 10 = 0)::int AS t,
         ((('0x' || substr(md5(f), 1, 15))::UBIGINT % {_CLF_DIM})::int) AS b
  FROM clf_f, unnest(feats) AS u(f)
), cc AS (
  SELECT b, sum(t) AS np, count(*) AS nr FROM clf_tf GROUP BY b
), ctot AS (
  SELECT sum(np) + {_CLF_DIM} * 1.0 AS tp,
         sum(nr - np) + {_CLF_DIM} * 1.0 AS tn FROM cc
), cw AS (
  SELECT b, ln((np + 1.0) / (SELECT tp FROM ctot))
           - ln((nr - np + 1.0) / (SELECT tn FROM ctot)) AS w
  FROM cc
), clf_t AS (
  SELECT clf_tf.doc_id,
         round(1.0 / (1.0 + exp(-(sum(cw.w) / count(*)))), 4) AS clf_trained_d
  FROM clf_tf JOIN cw USING (b) GROUP BY clf_tf.doc_id
), lmt AS (
  -- hashed bigram LM perplexity (CCNet filter shape): model trained
  -- on the doc_id%10 reference slice, re-derived here from the same
  -- table — ln count tables + per-doc fold, like the NB trainer above
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS lt
  FROM documents
), lm_pairs AS (
  SELECT doc_id,
         ((('0x' || substr(md5(lt[i]), 1, 15))::UBIGINT % {_CLF_DIM})::int) AS c,
         ((('0x' || substr(md5(lt[i] || ' ' || lt[i+1]), 1, 15))::UBIGINT % {_CLF_DIM})::int) AS b
  FROM lmt, unnest(range(1, len(lt))) AS r(i)
  WHERE len(lt) >= 2
), lm_cb AS (
  SELECT b, count(*) AS n FROM lm_pairs WHERE doc_id % 10 = 0 GROUP BY b
), lm_cc AS (
  SELECT c, count(*) AS n FROM lm_pairs WHERE doc_id % 10 = 0 GROUP BY c
), lm AS (
  SELECT p.doc_id,
         round(exp(-(sum(ln(coalesce(cb.n, 0) + 1.0)
                        - ln(coalesce(cc.n, 0) + {_CLF_DIM} * 1.0))
                    / count(*))), 4) AS lm_ppl_d
  FROM lm_pairs p
  LEFT JOIN lm_cb cb USING (b)
  LEFT JOIN lm_cc cc USING (c)
  GROUP BY p.doc_id
), t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks,
         length(text) AS chars
  FROM documents
), s AS (
  SELECT doc_id, text, toks, chars, len(toks) AS n,
         len(list_filter(toks, x -> list_contains(
           ['the','of','and','to','in','a','is','that','it','was','for','on','are','with','as','at','be','this','have','from','or','had','by','but','what','some','we','can','out','other','were','all','there','when','up'],
           lower(x)))) AS n_stop,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         len(list_distinct(toks)) AS n_dist,
         len(list_filter(toks, x -> regexp_matches(x, '[A-Za-zÀ-ÿ]'))) AS n_alpha,
         len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '(\\.\\.\\.|…)')) AS n_symbols
  FROM t
), gop AS (
  SELECT doc_id,
         count(*) AS nl,
         count(*) FILTER (WHERE l[1] IN ('-', '*', '•', '●')) AS bullets,
         count(*) FILTER (WHERE l LIKE '%...' OR l LIKE '%…') AS ell
  FROM (SELECT doc_id, unnest(list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '')) AS l
        FROM t)
  GROUP BY doc_id
), line_u AS (
  SELECT doc_id, unnest(list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '')) AS l
  FROM t
), line_c AS (
  SELECT doc_id, l, count(*) AS c FROM line_u GROUP BY doc_id, l
), ls AS (
  SELECT doc_id, sum(c) AS n_lines, count(*) AS n_dist_lines,
         sum(c * length(l)) AS line_chars,
         sum(CASE WHEN c > 1 THEN c * length(l) ELSE 0 END) AS dup_line_chars
  FROM line_c GROUP BY doc_id
), g2_u AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 2 + 2),
                 i -> array_to_string(toks[i:i + 2 - 1], ' '))) AS g
  FROM t
), g2_c AS (
  SELECT doc_id, g, count(*) AS c FROM g2_u GROUP BY doc_id, g
), g2 AS (
  SELECT doc_id, max(c * length(g)) AS top,
         sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dup
  FROM g2_c GROUP BY doc_id
), g3_u AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3 + 2),
                 i -> array_to_string(toks[i:i + 3 - 1], ' '))) AS g
  FROM t
), g3_c AS (
  SELECT doc_id, g, count(*) AS c FROM g3_u GROUP BY doc_id, g
), g3 AS (
  SELECT doc_id, max(c * length(g)) AS top,
         sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dup
  FROM g3_c GROUP BY doc_id
), g4_u AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 4 + 2),
                 i -> array_to_string(toks[i:i + 4 - 1], ' '))) AS g
  FROM t
), g4_c AS (
  SELECT doc_id, g, count(*) AS c FROM g4_u GROUP BY doc_id, g
), g4 AS (
  SELECT doc_id, max(c * length(g)) AS top,
         sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dup
  FROM g4_c GROUP BY doc_id
), g5_u AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 5 + 2),
                 i -> array_to_string(toks[i:i + 5 - 1], ' '))) AS g
  FROM t
), g5_c AS (
  SELECT doc_id, g, count(*) AS c FROM g5_u GROUP BY doc_id, g
), g5 AS (
  SELECT doc_id, max(c * length(g)) AS top,
         sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dup
  FROM g5_c GROUP BY doc_id
), g10_u AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 10 + 2),
                 i -> array_to_string(toks[i:i + 10 - 1], ' '))) AS g
  FROM t
), g10_c AS (
  SELECT doc_id, g, count(*) AS c FROM g10_u GROUP BY doc_id, g
), g10 AS (
  SELECT doc_id, max(c * length(g)) AS top,
         sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dup
  FROM g10_c GROUP BY doc_id
)
SELECT doc_id, clf.clf_score, clf_t.clf_trained_d, lm.lm_ppl_d, n AS n_tokens,
       CASE WHEN n > 0 THEN round((chars - (n - 1))::double / n, 4) ELSE 0.0 END AS mean_word_len,
       CASE WHEN n > 0 THEN round(n_stop::double / n, 4) ELSE 0.0 END AS stopword_ratio,
       CASE WHEN chars > 0 THEN round(n_punct::double / chars, 4) ELSE 0.0 END AS punct_ratio,
       CASE WHEN chars > 0 THEN round(n_digit::double / chars, 4) ELSE 0.0 END AS digit_ratio,
       CASE WHEN n > 0 THEN round(1 - n_dist::double / n, 4) ELSE 0.0 END AS repetition_ratio,
       round(
         (CASE WHEN n BETWEEN 10 AND 100000 THEN 0.25 ELSE 0 END) +
         (CASE WHEN n > 0 AND (chars - (n - 1))::double / n BETWEEN 2.5 AND 12 THEN 0.25 ELSE 0 END) +
         (CASE WHEN n > 0 AND n_stop::double / n >= 0.05 THEN 0.25 ELSE 0 END) +
         (CASE WHEN (CASE WHEN chars > 0 THEN n_digit::double / chars ELSE 0 END) < 0.2
                AND (CASE WHEN n > 0 THEN 1 - n_dist::double / n ELSE 0 END) < 0.6 THEN 0.25 ELSE 0 END)
       , 2) AS quality_score,
       n AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-zÀ-ÿ0-9\\s]')) AS n_bpe_tokens,
       n_dist AS n_distinct_tokens,
       md5(array_to_string(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''), ' ')) AS fp_md5,
       coalesce(round(CASE WHEN ls.n_lines > 0 THEN 1 - ls.n_dist_lines::double / ls.n_lines END, 4), 0.0) AS dup_line_frac,
       coalesce(round(CASE WHEN ls.line_chars > 0 THEN ls.dup_line_chars::double / ls.line_chars END, 4), 0.0) AS dup_line_char_frac,
       coalesce(round(CASE WHEN chars > 0 THEN least(1.0, g2.top::double / chars) END, 4), 0.0) AS top2gram_char_frac,
       coalesce(round(CASE WHEN chars > 0 THEN least(1.0, g3.top::double / chars) END, 4), 0.0) AS top3gram_char_frac,
       coalesce(round(CASE WHEN chars > 0 THEN least(1.0, g4.top::double / chars) END, 4), 0.0) AS top4gram_char_frac,
       coalesce(round(CASE WHEN chars > 0 THEN least(1.0, g5.dup::double / chars) END, 4), 0.0) AS dup5gram_char_frac,
       coalesce(round(CASE WHEN chars > 0 THEN least(1.0, g10.dup::double / chars) END, 4), 0.0) AS dup10gram_char_frac,
       coalesce(round(CASE WHEN gop.nl > 0 THEN gop.bullets::double / gop.nl END, 4), 0.0) AS bullet_line_frac,
       coalesce(round(CASE WHEN gop.nl > 0 THEN gop.ell::double / gop.nl END, 4), 0.0) AS ellipsis_line_frac,
       CASE WHEN n > 0 THEN round(n_alpha::double / n, 4) ELSE 0.0 END AS alpha_word_frac,
       CASE WHEN n > 0 THEN round(n_symbols::double / n, 4) ELSE 0.0 END AS symbol_word_ratio
FROM s
LEFT JOIN ls USING (doc_id)
LEFT JOIN g2 USING (doc_id)
LEFT JOIN g3 USING (doc_id)
LEFT JOIN g4 USING (doc_id)
LEFT JOIN g5 USING (doc_id)
LEFT JOIN g10 USING (doc_id)
LEFT JOIN gop USING (doc_id)
LEFT JOIN clf USING (doc_id)
LEFT JOIN clf_t USING (doc_id)
LEFT JOIN lm USING (doc_id)
)""" + _CURATION_TAIL,
        "sentences": """
WITH d AS (
  SELECT 'd' || doc_id AS parent_id,
         ['First part ' || doc_id || '.', 'Second part ' || doc_id || '!', 'Third part ' || doc_id || '?'] AS sents
  FROM documents
), w AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
)
SELECT parent_id || '#sentence' || i AS url, i::int AS sentence_i,
       sents[i] AS sentence_txt, parent_id,
       'sentence' AS kind, NULL::int AS n_tokens_i
FROM d, unnest(range(1, 4)) AS t(i)
UNION ALL
SELECT 'd' || doc_id || '#chunk' || ((s - 1) // 24) AS url,
       ((s - 1) // 24)::int AS sentence_i,
       array_to_string(w[s : s + 31], ' ') AS sentence_txt,
       'd' || doc_id AS parent_id,
       'chunk' AS kind,
       least(32, len(w) - s + 1)::int AS n_tokens_i
FROM w, unnest(range(1,
         (CASE WHEN len(w) <= 32 THEN 0
               ELSE ((len(w) - 32 + 23) // 24) * 24 END) + 2,
         24)) AS t(s)
WHERE len(w) > 0""",
        # golden-file oracles for the seeded kernels DuckDB cannot
        # express (MinHash/SimHash families, random hyperplanes,
        # stopword profiles). Goldens are computed by an INDEPENDENT
        # pure-Python implementation (tools/gen_goldens.py — no imports
        # from the Spark operators) and keyed per sf dir by a content
        # checksum of the input table.
        "minhash_lsh": """
WITH g AS (
  SELECT id_a, id_b, est_jaccard
  FROM read_parquet('/root/repo/goldens/minhash_lsh.parquet')
  WHERE _key = (SELECT SUM(n_chars) FROM documents)
), m AS (
  -- incremental probe: even ids are the index, odd ids the new batch;
  -- a band collision is a property of the PAIR, so the cross-parity
  -- subset of the whole-corpus golden IS the probe result
  SELECT CASE WHEN id_a % 2 = 0 THEN id_a ELSE id_b END AS id_a,
         CASE WHEN id_a % 2 = 0 THEN id_b ELSE id_a END AS id_b,
         est_jaccard
  FROM g WHERE (id_a % 2) != (id_b % 2)
)
SELECT id_a, id_b, est_jaccard, 'batch' AS kind FROM g
UNION ALL
SELECT id_a, id_b, est_jaccard, 'probe' FROM m
UNION ALL
SELECT NULL, d.doc_id, NULL, 'novel'
FROM documents d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM m WHERE m.id_b = d.doc_id)""",
        "simhash": """
SELECT doc_id, simhash
FROM read_parquet('/root/repo/goldens/simhash.parquet')
WHERE _key = (SELECT SUM(n_chars) FROM documents)""",
        "language_detect": """
SELECT doc_id, language_s
FROM read_parquet('/root/repo/goldens/language_detect.parquet')
WHERE _key = (SELECT SUM(n_chars) FROM documents)""",
        **QX.EXT_ORACLES,
    }
