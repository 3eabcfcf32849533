"""The ETL stage chain: one declarative DataFrame pipeline.

Replaces the reference's interpreted per-document plugin fold
(``ETL.process``, etl.py:147-268): each plugin becomes a column stage;
plugin ordering (``sort_plugins``, etl.py:343-375 — OCR before language
detect, entities before multilingual) is the static order below;
per-plugin error capture (etl.py:214-220) becomes the ``extract_err``
column; content-type gating (etl.py:71-145) becomes conditional column
expressions rather than row filtering.

Stage order:
  1. extraction        (html → content/title/… — the Tika replacement)
  2. path/title/ctype  (enhance_path, clean_title, contenttype_group,
                        file mtime/size)
  3. analysis text     (get_text concat)
  4. language id       (enhance_detect_language)
  5. gazetteer NER     (enhance_entity_linking)
  6. regex extractors  (emails, phones, hashtags, IBAN, law, money)
  7. multilingual      (enhance_multilingual fan-out)

Scale notes: stages 1-7 are all map-side (zero shuffles end-to-end);
the only exchange in an incremental run is the checkpoint anti-join
(see plans/checkpoint.py), which ships only (url, content_hash) — the
html payload NEVER shuffles. Skew policy for the map-only stage:
parquet/Iceberg input splits are byte-uniform (maxPartitionBytes), so
per-task work is even regardless of host clustering in the file order —
a hash repartition is NOT needed and at 10^12 docs would shuffle the
entire corpus through the network (measured on this box: +40% wall at
32 cores, see BENCH/BASELINE.md §2). ``repartition=N`` stays available
for the one case that does need it: re-balancing after a selective
filter (e.g. backfill of a sparse needs_ocr subset) where surviving
rows cluster in few splits. Shuffling stages (groupBy/MERGE on url)
rely on AQE skew handling + the salted-agg helper (functions/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_semantic_etl_spark.functions import extract as X
from open_semantic_etl_spark.functions import path as P
from open_semantic_etl_spark.functions import textmeta as M
from open_semantic_etl_spark.operators.entity_linking import Gazetteer, with_entities
from open_semantic_etl_spark.operators.html_extract import with_extraction
from open_semantic_etl_spark.operators.langdetect import language_expr
from open_semantic_etl_spark.operators.law_money import with_law, with_money
from open_semantic_etl_spark.operators.numerize import numerize_en

PIPELINE_VERSION = "1"

#: stage names recorded in the checkpoint table's ``stages_done``
STAGES = (
    "extract",
    "path",
    "language",
    "entities",
    "regex_extractors",
    "multilingual",
)

DEFAULT_CURRENCY_LABELS = ("dollar", "dollars", "USD", "EUR", "EURO")


def content_hash(html_col: str = "html") -> F.Column:
    """64-bit content identity for checkpoint/resume and caches."""
    return F.xxhash64(F.col(html_col))


def enrich_pages(
    df: DataFrame,
    gazetteer: Gazetteer | None = None,
    currency_labels: tuple[str, ...] = DEFAULT_CURRENCY_LABELS,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    repartition: int | None = None,
    fused: bool = True,
) -> DataFrame:
    """pages(url, warc_ts, html, …) → fully enriched rows.

    ``fused=True`` (default, the scale path) runs ALL per-byte Python
    work — extraction, language id, gazetteer NER, numerization — in a
    single ``mapInPandas`` pass (operators/fused.py): html crosses the
    JVM↔Python boundary once, and only one Python worker pool runs per
    task. ``fused=False`` keeps the modular one-UDF-per-operator chain
    (same observable columns; tests assert equivalence).
    """
    if repartition:
        # explicit hash partitioning on url: even spread under sorted/
        # hot-host inputs (north rule; SURVEY.md §4 item 1)
        df = df.repartition(repartition, F.xxhash64("url"))

    if fused:
        return _enrich_after_python(
            _fused_python_stage(df, gazetteer), currency_labels, langs
        )

    # --- modular path -------------------------------------------------
    # 1. extraction
    df = with_extraction(df)
    df = df.withColumn("content_hash", content_hash())

    # 2. path/title/ctype scalar stages
    df = P.with_path_facets(df, id_col="url")
    df = df.withColumn(
        "title_txt", P.clean_title(F.col("title_txt"), None, F.col("url"))
    )
    df = df.withColumn(
        "content_type_group_ss",
        P.content_type_group(F.col("content_type"), F.col("url")),
    )
    df = df.withColumn("file_modified_dt", P.file_modified_dt(F.col("warc_ts")))
    df = df.withColumn("file_size_i", P.file_size_i(F.col("html")))

    # 3. analysis text (get_text contract: field order + trailing \n)
    df = M.with_analysis_text(df)

    # 4. language detect (consumes the same concat the reference does)
    df = df.withColumn("language_s", language_expr(F.col("text_analysis")))

    # 5. gazetteer NER
    if gazetteer is not None:
        df = with_entities(df, gazetteer)
    else:
        df = df.withColumn("entities", F.lit(None).cast(
            "array<struct<facet:string,name:string,uri:string,"
            "matchtexts:array<string>,taxonomy:array<string>>>"
        )).withColumn("entities", F.coalesce(F.col("entities"), F.array()))

    # 6. regex extractors over the analysis text
    text = F.col("text_analysis")
    df = (
        df.withColumn("email_ss", X.emails(text))
        .withColumn("email_domain_ss", X.email_domains(X.emails(text)))
        .withColumn("message_from_ss", X.message_from(text))
        .withColumn("message_to_ss", X.message_to(text))
        .withColumn("phone_ss", X.phones(text))
        .withColumn("phone_normalized_ss", X.phones_normalized(X.phones(text)))
        .withColumn("hashtag_ss", X.hashtags(text))
        .withColumn("iban_ss", X.iban(text))
    )
    df = with_law(df)
    _nz = F.pandas_udf(lambda s: s.map(numerize_en), T.StringType())
    df = df.withColumn("text_numerized", _nz(text))
    df = with_money(df, currency_labels, numerized_col="text_numerized")
    df = df.drop("text_numerized")

    # 7. multilingual fan-out
    df = M.with_multilingual(df, langs=langs)

    return df


def _fused_python_stage(df: DataFrame, gazetteer) -> DataFrame:
    """single-pass Python stage + hot-column aliases (fused path)."""
    from open_semantic_etl_spark.operators.fused import with_fused_extraction

    df = with_fused_extraction(df, gazetteer)
    return (
        df.withColumn("content_txt", F.col("content"))
        .withColumn("title_txt", F.col("title"))
        .withColumn("description_txt", F.col("description"))
        .withColumn("extract_ok", F.col("ok"))
        .withColumn("extract_err", F.col("err"))
        .withColumn("content_hash", content_hash())
    )


def _enrich_after_python(
    df: DataFrame,
    currency_labels: tuple[str, ...],
    langs: tuple[str, ...],
) -> DataFrame:
    """all remaining stages — pure JVM column algebra, no Python."""
    df = P.with_path_facets(df, id_col="url")
    df = df.withColumn(
        "title_txt", P.clean_title(F.col("title_txt"), None, F.col("url"))
    )
    df = df.withColumn(
        "content_type_group_ss",
        P.content_type_group(F.col("content_type"), F.col("url")),
    )
    df = df.withColumn("file_modified_dt", P.file_modified_dt(F.col("warc_ts")))
    df = df.withColumn("file_size_i", P.file_size_i(F.col("html")))

    text = F.col("text_analysis")
    df = (
        df.withColumn("email_ss", X.emails(text))
        .withColumn("email_domain_ss", X.email_domains(X.emails(text)))
        .withColumn("message_from_ss", X.message_from(text))
        .withColumn("message_to_ss", X.message_to(text))
        .withColumn("phone_ss", X.phones(text))
        .withColumn("phone_normalized_ss", X.phones_normalized(X.phones(text)))
        .withColumn("hashtag_ss", X.hashtags(text))
        .withColumn("iban_ss", X.iban(text))
    )
    df = with_law(df)
    df = with_money(df, currency_labels, numerized_col="text_numerized")
    df = df.drop("text_numerized")
    df = M.with_multilingual(df, langs=langs)
    return df
