"""Dead-letter VARIANT ingestion: parse arriving raw JSON once, route
malformed payloads to a quarantine relation instead of failing the
stream or silently dropping rows.

The ingestion contract a 100 TB crawl pipeline needs: payloads are
parsed ONCE into Spark 4's binary VARIANT encoding
(``try_parse_json`` — malformed input yields a NULL variant, never an
executor exception), typed fields shred out via ``try_variant_get``
path walks (q192's access pattern), and rows that failed to parse land
in a quarantine target WITH their raw payload and batch id, so they
are re-processable after an upstream fix — the row that kills a naive
job is precisely the row you need to keep.

Exactly-once posture: both routes write batch-scoped ``batch=N``
partition overwrites (the curation-stream protocol) — a replayed batch
rewrites its own partitions byte-identically, so redelivery is
idempotent with no ledger needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def apply_variant_ingest_batch(
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
    *,
    text_col: str = "props",
    fields: dict[str, tuple[str, str]] | None = None,
) -> None:
    """Route one micro-batch: parse ``text_col``, shred ``fields``
    (name -> (variant path, target type)) onto the good route, send
    unparseable rows (raw payload + reason) to quarantine. A row whose
    JSON parses but lacks a path keeps a NULL field on the good route
    (absence is data; malformation is an ingest failure)."""
    fields = fields or {}
    parsed = batch.withColumn("_v", F.try_parse_json(F.col(text_col)))
    # a NULL payload is ABSENCE, not malformation: it passes to the good
    # route with NULL shredded fields (try_parse_json(NULL) is NULL, so
    # filtering on _v alone would quarantine rows that never had a
    # payload and could never be "re-processed after an upstream fix")
    good = parsed.filter(
        F.col("_v").isNotNull() | F.col(text_col).isNull()
    ).select(
        *[c for c in batch.columns if c != text_col],
        *[
            F.try_variant_get("_v", path, typ).alias(name)
            for name, (path, typ) in fields.items()
        ],
    )
    bad = parsed.filter(
        F.col("_v").isNull() & F.col(text_col).isNotNull()
    ).select(
        *[c for c in batch.columns if c != text_col],
        F.col(text_col).alias("raw_payload"),
        F.lit("unparseable_json").alias("reason"),
    )
    good.write.mode("overwrite").parquet(f"{state_dir}/good/batch={batch_id}")
    bad.write.mode("overwrite").parquet(
        f"{state_dir}/quarantine/batch={batch_id}"
    )


def stream_variant_ingest(
    doc_stream: DataFrame,
    state_dir: str,
    *,
    text_col: str = "props",
    fields: dict[str, tuple[str, str]] | None = None,
):
    """Attach the dead-letter ingest sink; returns the (unstarted)
    ``DataStreamWriter``."""

    def _apply(b: DataFrame, batch_id: int) -> None:
        apply_variant_ingest_batch(
            b, state_dir, batch_id, text_col=text_col, fields=fields
        )

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_route(spark: SparkSession, state_dir: str, route: str) -> DataFrame:
    """Accumulated rows of one route ('good' or 'quarantine')."""
    return spark.read.parquet(f"{state_dir}/{route}").drop("batch")
