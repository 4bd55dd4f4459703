"""Text scrubbing operators: PII redaction and repetition profiling.
No counterpart in the reference (its pipeline is BI over candy orders);
these are the scrubbing passes a pretraining-data pipeline runs between
ingestion and dedup, expressed as single-scan JVM column expressions.

Scale notes:
- Redaction is a chain of ``regexp_replace`` calls — one scan, zero
  shuffles, whole-stage codegen keeps it JVM-side; regex cost is linear
  per row and embarrassingly parallel.
- Repetition profiling is explode → two map-side-combinable aggregates
  (per-(doc,word) count, then per-doc max/sum). The shuffle key is
  (doc_id, word), which is near-unique — no skew; output is integers
  only so cross-engine hashing is exact.
- Patterns stay inside the Java-regex ∩ RE2 common subset so the DuckDB
  oracles run the *same* pattern strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.catalog import load, register

# Java ∩ RE2 portable patterns (no lookbehind, no backrefs).
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_RE_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"

# The synthetic corpus carries no PII, so both engines synthesize the
# same PII-bearing text (emails/IP/phone derived from doc_id; every
# third doc gets a second email to prove global replacement).
_PII_TEXT_TMPL = (
    "text || ' reach doc' || CAST(doc_id AS {s}) || '@mail.example.com'"
    " || CASE WHEN doc_id % 3 = 0"
    "         THEN ' cc doc' || CAST(doc_id AS {s}) || '@alt.example.org'"
    "         ELSE '' END"
    " || ' from 10.0.' || CAST(doc_id % 200 AS {s}) || '.7"
    " call 555-867-5309'"
)
_PII_TEXT_SQL = _PII_TEXT_TMPL.format(s="VARCHAR")  # DuckDB oracle
_PII_TEXT_SPARK = _PII_TEXT_TMPL.format(s="STRING")  # Spark builder


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails, IPv4 addresses, and NNN-NNN-NNNN phone numbers
    with typed placeholder tokens, and count each kind (pre-redaction).
    Order matters: emails first, so the IP pattern never fires inside a
    dotted e-mail domain."""
    c = F.col(text_col)
    out = df.withColumn("n_emails", F.regexp_count(c, F.lit(_RE_EMAIL)).cast("long"))
    out = out.withColumn("n_ips", F.regexp_count(c, F.lit(_RE_IPV4)).cast("long"))
    out = out.withColumn("n_phones", F.regexp_count(c, F.lit(_RE_PHONE)).cast("long"))
    clean = F.regexp_replace(c, _RE_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, _RE_IPV4, "<IP>")
    clean = F.regexp_replace(clean, _RE_PHONE, "<PHONE>")
    return out.withColumn("clean_text", clean)


@register(
    "q78_pii_redaction",
    oracle=f"""
WITH pii AS (SELECT doc_id, {_PII_TEXT_SQL} AS text FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_RE_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_RE_IPV4}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{_RE_PHONE}')) AS BIGINT) AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{_RE_EMAIL}', '<EMAIL>', 'g'),
           '{_RE_IPV4}', '<IP>', 'g'),
         '{_RE_PHONE}', '<PHONE>', 'g') AS clean_text
FROM pii
""",
    doc="PII redaction: emails, IPv4s, and phone numbers replaced with "
    "typed placeholders, with per-kind counts. Single scan, pure JVM "
    "regexp chain (emails redacted before IPs so dotted domains can't "
    "half-match); the corpus is synthetic so both engines splice in "
    "identical deterministic PII first. Oracle runs the same patterns "
    "under RE2 with global replace.",
)
def q78_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_TEXT_SPARK).alias("text")
    )
    return redact_pii(d).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "clean_text"
    )


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document word-repetition metrics (the Gopher repetition
    rules' cheap core): total words, distinct words, and the count of
    the single most frequent word. Integer outputs only."""
    words = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    per_word = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("cnt"))
    return per_word.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
        F.max("cnt").cast("long").alias("top_word_count"),
    )


@register(
    "q79_repetition_profile",
    oracle="""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
c AS (SELECT doc_id, word, COUNT(*) AS cnt FROM w GROUP BY doc_id, word)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
       CAST(MAX(cnt) AS BIGINT) AS top_word_count,
       CAST(CASE WHEN MAX(cnt) * 5 > SUM(cnt) THEN 1 ELSE 0 END
            AS INTEGER) AS repetitive
FROM c GROUP BY doc_id
""",
    doc="Word-repetition profile per document: total/distinct word "
    "counts, the most-frequent word's count, and a 'repetitive' flag "
    "when one word exceeds 20% of the doc (integer cross-multiply, no "
    "float ratio). Explode + two map-side-combinable aggregates on a "
    "near-unique (doc, word) key — linear, skew-free, the repetition "
    "half of the Gopher quality rules (q59 covers the length/alpha "
    "half).",
)
def q79_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    prof = repetition_profile(load(spark, sf_dir, "documents"))
    return prof.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        "top_word_count",
        (F.col("top_word_count") * 5 > F.col("n_words"))
        .cast("int")
        .alias("repetitive"),
    )


# Content-addressed deletion list: docs whose portable 8-bit content
# hash falls under the threshold play the incoming forget requests
# (~4.7% of the corpus). Same md5-hex-digit arithmetic as the q56
# sampler so both engines flag identical rows.
_FORGET_H256 = 12
_FORGET_HEXPOS = "instr('0123456789abcdef', substr(md5(text), {i}, 1)) - 1"
_FORGET_H256_SQL = (
    f"(({_FORGET_HEXPOS.format(i=1)}) * 16 + ({_FORGET_HEXPOS.format(i=2)}))"
)


def _forget_h256():
    md5 = F.md5(F.col("text").cast("binary"))
    return (
        (F.instr(F.lit("0123456789abcdef"), F.substring(md5, 1, 1)) - 1) * 16
        + (F.instr(F.lit("0123456789abcdef"), F.substring(md5, 2, 1)) - 1)
    )


@register(
    "q194_forget_propagation",
    oracle=f"""
WITH flagged AS (
  SELECT source, md5(text) AS digest,
         CASE WHEN {_FORGET_H256_SQL} < {_FORGET_H256} THEN 1 ELSE 0 END
           AS is_del
  FROM documents
),
del_digests AS (SELECT DISTINCT digest FROM flagged WHERE is_del = 1),
marked AS (
  SELECT f.source, f.is_del,
         CASE WHEN EXISTS (SELECT 1 FROM del_digests d
                           WHERE d.digest = f.digest)
              THEN 1 ELSE 0 END AS has_del_digest
  FROM flagged f
)
SELECT source,
       CAST(SUM(is_del) AS BIGINT) AS n_requested,
       CAST(SUM(CASE WHEN is_del = 0 AND has_del_digest = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_residual,
       CAST(SUM(CASE WHEN is_del = 0 AND has_del_digest = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM marked GROUP BY source
""",
    doc="Right-to-be-forgotten propagation audit: a content-addressed "
    "deletion list (the portable md5-derived hash under a threshold "
    "plays the incoming requests) is propagated through exact-duplicate "
    "closure — a surviving doc whose content digest matches any deleted "
    "doc is a RESIDUAL COPY that must also be purged for the deletion "
    "to be real, the gap naive per-row deletes leave in a deduplicated "
    "corpus. Output per source: requested deletes, residual copies "
    "exposed, clean survivors. Plan: one corpus scan computes both the "
    "flag and the digest; the deletion-digest list is small by nature "
    "(bounded by the request volume) so the survivor probe is a "
    "broadcast join, and the rollup is one map-side-combinable agg — "
    "no corpus self-join at any size. Downstream, a real purge "
    "invalidates the derived-relation memos/materializations "
    "(operators/memo.py, operators/materialize.py) — exercised in "
    "tests/test_retrieval_governance.py.",
)
def q194_forget_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    flagged = d.select(
        "source",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        (_forget_h256() < _FORGET_H256).cast("int").alias("is_del"),
    )
    del_digests = (
        flagged.filter(F.col("is_del") == 1).select("digest").distinct()
    )
    marked = flagged.join(
        F.broadcast(del_digests.withColumn("hit", F.lit(1))),
        "digest",
        "left",
    ).select(
        "source",
        "is_del",
        F.coalesce("hit", F.lit(0)).alias("has_del_digest"),
    )
    return marked.groupBy("source").agg(
        F.sum("is_del").cast("long").alias("n_requested"),
        F.sum(
            ((F.col("is_del") == 0) & (F.col("has_del_digest") == 1)).cast(
                "int"
            )
        )
        .cast("long")
        .alias("n_residual"),
        F.sum(
            ((F.col("is_del") == 0) & (F.col("has_del_digest") == 0)).cast(
                "int"
            )
        )
        .cast("long")
        .alias("n_clean"),
    )


# --------------------------------------------------------------------------
# q201 — license clearance through near-duplicate clusters: the licensing
# twin of q194's right-to-be-forgotten propagation. A document's usable
# license is the STRICTEST license anywhere in its duplicate cluster —
# a permissively-sourced copy of restricted content is still restricted.
# --------------------------------------------------------------------------
#: source → license-strictness rank (0 permissive, 1 attribution,
#: 2 restricted): a deterministic dim derived from the source number —
#: the synthetic corpus carries no license column, so both engines
#: synthesize the same one (same trick as the q78 PII text).
_LIC_RANK_SQL = "CAST(substr(source, 4) AS INTEGER) % 3"


def _license_clearance_sql() -> str:
    from etl_pipeline_candy_store_spark.operators.dedup import _CLUSTERS_SQL

    return f"""
WITH clusters AS ({_CLUSTERS_SQL}),
lic AS (
  SELECT c.doc_id, c.cluster_id, d.source,
         {_LIC_RANK_SQL} AS lic_rank
  FROM clusters c JOIN documents d USING (doc_id)
),
cl AS (SELECT cluster_id, MAX(lic_rank) AS cluster_rank
       FROM lic GROUP BY cluster_id)
SELECT l.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN l.lic_rank = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_restricted_own,
       CAST(SUM(CASE WHEN l.lic_rank < 2 AND c.cluster_rank = 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked_by_copy,
       CAST(SUM(CASE WHEN c.cluster_rank < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cleared
FROM lic l JOIN cl c USING (cluster_id)
GROUP BY l.source
"""


@register(
    "q201_license_clearance",
    oracle=_license_clearance_sql(),
    doc="License clearance propagated through near-duplicate clusters: "
    "each document's effective license is the strictest rank in its "
    "q54/q125 duplicate cluster (restricted content stays restricted "
    "through every copy — the licensing twin of q194's deletion "
    "propagation, over NEAR-dup closure instead of exact digests). "
    "Per-source audit: docs restricted by their own license vs docs "
    "BLOCKED BY A COPY (permissively sourced, but a cluster-mate is "
    "restricted — the rows a naive per-row license filter wrongly "
    "keeps) vs cleared. Plan: reuses the session-memoized cluster "
    "labels (one build per corpus version), cluster_rank is a "
    "cluster_id-partitioned window max (ONE exchange, no self-join), "
    "then a 20-group map-side-combinable rollup.",
)
def q201_license_clearance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_candy_store_spark.operators.dedup import (
        dedup_clusters_checkpointed,
    )

    labels = dedup_clusters_checkpointed(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_LIC_RANK_SQL).alias("lic_rank")
    )
    return license_rollup(with_cluster_rank(labels.join(docs, "doc_id")))


def with_cluster_rank(lic: DataFrame, rank_col: str = "lic_rank") -> DataFrame:
    """Strictest license rank per duplicate cluster, carried onto every
    member row: cluster_id-partitioned window max over a
    (doc_id, cluster_id, source, lic_rank) frame — one exchange, no
    self-join. Reused by the curation pipeline's governance report,
    which maxes over an EFFECTIVE per-doc rank (``rank_col``) that
    already folds in exact-duplicate copies dropped upstream."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("cluster_id")
    return lic.withColumn("cluster_rank", F.max(rank_col).over(w))


def license_rollup(marked: DataFrame) -> DataFrame:
    """q201's per-source audit over any frame carrying (source,
    lic_rank, cluster_rank) rows."""
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("lic_rank") == 2).cast("int"))
        .cast("long")
        .alias("n_restricted_own"),
        F.sum(
            ((F.col("lic_rank") < 2) & (F.col("cluster_rank") == 2)).cast(
                "int"
            )
        )
        .cast("long")
        .alias("n_blocked_by_copy"),
        F.sum((F.col("cluster_rank") < 2).cast("int"))
        .cast("long")
        .alias("n_cleared"),
    )


_K_ANON = 3  # minimum group size a quasi-identifier combination may have


@register(
    "q227_k_anonymity_audit",
    oracle=f"""
WITH cells AS (
  SELECT lang, source, n_chars // 200 AS len_band, COUNT(*) AS n
  FROM documents
  GROUP BY 1, 2, 3
)
SELECT lang, source, CAST(len_band AS BIGINT) AS len_band,
       CAST(n AS BIGINT) AS n
FROM cells WHERE n < {_K_ANON}
""",
    doc="k-anonymity audit over the document metadata (quasi-"
    "identifiers lang x source x 200-char length band): every "
    "combination cell with fewer than k=3 members is a re-"
    "identification risk — releasing per-cell statistics (or the docs "
    "themselves keyed by these attributes) lets an adversary who "
    "knows a subject's quasi-identifiers single them out. The "
    "governance sibling of the RTBF family (q194): forget handles "
    "deletion obligations, this one measures exposure BEFORE a "
    "release. Scale posture: one combinable groupBy over three narrow "
    "columns — no text, no joins; the risk report is cell-count-"
    "sized. The integer length band (n_chars div 200) keeps both "
    "engines' bucketing bit-identical.",
)
def q227_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "lang",
            "source",
            F.expr("n_chars div 200").cast("long").alias("len_band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") < _K_ANON)
    )
