"""Text-analysis operators for the training-data pipeline surface:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure built-in column expressions (whole-stage
codegen; no Python in the hot path), each with an exact DuckDB oracle.

Parity rules: token counts are computed arithmetically from space counts
(identical in both engines on the single-space-separated corpus); ratios
are emitted as exact double divisions of integers; fingerprints are md5
hex (identical function both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.catalog import load, register

# Tiny deterministic stopword lists for the language-ID heuristic.
_LANG_MARKERS = {
    "en": ("the", "a"),
    "de": ("der", "die"),
    "es": ("el", "la"),
    "fr": ("le", "un"),
}


def _n_tokens():
    """Token count = spaces + 1, computed arithmetically so both engines
    agree exactly (no regex dialect involved)."""
    return (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1)
    ).alias("n_tokens")


@register(
    "q40_text_stats",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars_calc,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INTEGER) AS n_tokens,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / (length(text) - length(replace(text, ' ', '')) + 1) AS avg_token_len,
       CAST(len(list_filter(string_split(text, ' '), t -> t = 'the')) AS INTEGER) AS n_stopword,
       CAST(len(list_filter(string_split(text, ' '), t -> t = 'the')) AS DOUBLE)
         / (length(text) - length(replace(text, ' ', '')) + 1) AS stopword_ratio
FROM documents
""",
    doc="Quality-scoring statistics per document (length, token count, "
    "stopword ratio) — all JVM-side expressions.",
)
def q40_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tok = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1)
    n_stop = F.size(F.filter(F.split("text", " "), lambda t: t == "the"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        (F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tok).alias(
            "avg_token_len"
        ),
        n_stop.alias("n_stopword"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
    )


@register(
    "q41_fingerprint",
    oracle="""
SELECT doc_id,
       md5(text) AS fp_raw,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         AS fp_tokenset
FROM documents
""",
    doc="Document fingerprinting: raw md5 + canonical token-set md5 "
    "(order-insensitive near-dup key).",
)
def q41_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp_raw"),
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(F.split("text", " "))), " "
            ).cast("binary")
        ).alias("fp_tokenset"),
    )


def _marker_score_sql(lang: str) -> str:
    toks = ", ".join(f"'{t}'" for t in _LANG_MARKERS[lang])
    return (
        f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({toks}))) "
        f"AS INTEGER)"
    )


@register(
    "q42_langid",
    oracle=f"""
SELECT doc_id, lang AS meta_lang,
       {_marker_score_sql('en')} AS score_en,
       {_marker_score_sql('de')} AS score_de,
       {_marker_score_sql('es')} AS score_es,
       {_marker_score_sql('fr')} AS score_fr,
       CASE WHEN {_marker_score_sql('en')} > 0 THEN 'en' ELSE 'und' END AS predicted_lang
FROM documents
""",
    doc="Language-ID n-gram/stopword heuristic (deterministic marker "
    "lists; a real deployment swaps in larger lists, same plan shape).",
)
def q42_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")

    def score(lang: str):
        markers = _LANG_MARKERS[lang]
        return F.size(F.filter(F.split("text", " "), lambda t: t.isin(*markers)))

    return d.select(
        "doc_id",
        F.col("lang").alias("meta_lang"),
        score("en").alias("score_en"),
        score("de").alias("score_de"),
        score("es").alias("score_es"),
        score("fr").alias("score_fr"),
        F.when(score("en") > 0, "en").otherwise("und").alias("predicted_lang"),
    )


@register(
    "q43_source_rollup",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY source
""",
    doc="Corpus rollup per source — the shape of a crawl-shard audit.",
)
def q43_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tok = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok.cast("long")).alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
