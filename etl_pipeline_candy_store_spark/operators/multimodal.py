"""Multimodal column convention + processing plumbing.

Convention (SURVEY §2.12): media travels as an opaque ``binary`` payload
column plus a typed metadata struct —

    payload: binary
    media: struct<media_type:string, mime:string, width:int, height:int,
                  duration_ms:int>

Processing (decode → feature-extract → resize / frame-sample) runs as
Arrow-batched ``mapInPandas`` so payloads stream through executors in
bounded batches (never collected, never a row-at-a-time UDF). The actual
codecs (Pillow/ffmpeg/torchaudio) are NOT in this container, so the
decode step is pluggable: ``decoder="real"`` raises NotImplementedError
where the codec call belongs; ``decoder="fake"`` is a deterministic
stand-in (sha256-seeded) that keeps every Spark-side contract — schema,
batch iteration, partitioning — real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("digest", StringType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)

EMBED_DIM = 16


def attach_media_columns(df: DataFrame, payload_col: str, media_type: str) -> DataFrame:
    """Wrap an existing binary column into the engine's media convention."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    ).withColumnRenamed(payload_col, "payload")


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec+encoder: sha256-seeded unit
    vector. Replaces e.g. PIL.Image.open(...)+CLIP at deploy time."""
    h = hashlib.sha256(payload).digest()
    # '<u2' pins little-endian as the contract (q67's oracle re-derives
    # these uint16s from the hex digest), independent of host byte order
    raw = np.frombuffer(h[: EMBED_DIM * 2], dtype="<u2").astype(np.float32)
    v = (raw / 65535.0) - 0.5
    return v / np.linalg.norm(v)


def extract_media_features(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    decoder: str = "fake",
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode/feature-extract each payload via mapInPandas.

    ``df`` must carry (id_col, payload: binary, media: MEDIA_META).
    Returns MEDIA_FEATURES. Partitioning is preserved — repartition
    upstream by size if payloads are skewed (a 4 GB video next to 4 KB
    thumbnails) so executor memory stays bounded.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "real":
                raise NotImplementedError(
                    "real media codecs are not available in this environment; "
                    "plug the codec call into _fake_decode's slot"
                )
            out_rows = {
                "media_id": pdf[id_col].astype("int64"),
                "media_type": pdf["media"].map(lambda m: m["media_type"]),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "digest": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
                "embedding": pdf["payload"].map(
                    lambda b: _fake_decode(bytes(b)).tolist()
                ),
            }
            yield pd.DataFrame(out_rows)

    return df.mapInPandas(_batches, schema=MEDIA_FEATURES)


from etl_pipeline_candy_store_spark.plans.catalog import load, register


@register(
    "q67_multimodal_features",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS media_id,
       'image' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS digest,
       array_to_string(
         list_transform(range(0, 16), j ->
           ('0x' || substr(sha256(text), 4*j+3, 2)
                 || substr(sha256(text), 4*j+1, 2))::int),
         ',') AS emb_fingerprint
FROM documents
""",
    doc="Multimodal feature extraction end-to-end on driver-visible "
    "data: documents.text bytes as the opaque binary payload, wrapped "
    "in the media-column convention, streamed through the Arrow "
    "mapInPandas extractor (deterministic fake decoder standing in for "
    "the absent codecs). Fully hash-exact against DuckDB: the float "
    "embedding's entire information content is the 16 little-endian "
    "uint16 words of the payload's sha256 digest (see _fake_decode), so "
    "the catalog projection re-derives those words JVM-side from the "
    "digest hex via conv() as emb_fingerprint — which the oracle "
    "reproduces with hex-literal casts — and drops only the redundant "
    "float rescaling (unit-normalization of the same words; its numpy "
    "float32 arithmetic has no cross-engine-stable text form). "
    "tests/test_multimodal.py pins fingerprint == the embedding's "
    "pre-normalization words, closing the loop.",
)
def q67_multimodal_features(spark, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    feats = extract_media_features(attach_media_columns(d, "payload", "image"))
    # uint16 word j of the digest = bytes 2j (lo) + 2j+1 (hi), i.e. hex
    # chars [4j+2,4j+4) || [4j,4j+2) read as one 4-hex-digit number —
    # pure JVM string/conv arithmetic over the already-computed digest
    fp = F.concat_ws(
        ",",
        F.transform(
            F.sequence(F.lit(0), F.lit(EMBED_DIM - 1)),
            lambda j: F.conv(
                F.concat(
                    F.substring("digest", j * 4 + 3, 2),
                    F.substring("digest", j * 4 + 1, 2),
                ),
                16,
                10,
            ).cast("int"),
        ),
    )
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        "digest",
        fp.alias("emb_fingerprint"),
    )


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling *plan*: one output row per (media, frame_ts) —
    the explode happens relationally (sequence + explode, pruned before
    decode) so only sampled frames ever reach the decoder."""
    return df.select(
        F.col(id_col),
        "payload",
        "media",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("media.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


@register(
    "q95_payload_manifest",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       CAST((octet_length(encode(text)) + 63) // 64 AS BIGINT) AS n_chunks
FROM documents
""",
    doc="Binary payload manifest, fully JVM-side and oracle-exact: byte "
    "length, md5 digest, and 64-byte chunk count over the opaque binary "
    "column (the codec-free half of multimodal processing — what a "
    "shard writer or transfer planner reads). Spark computes on the "
    "binary payload (length/md5 of bytes); the oracle computes the "
    "identical values from the utf8 source text. Only the decode step "
    "(q67's embedding) needs the pluggable codec; everything up to it "
    "is exact, distributed column arithmetic — no Python, no collect.",
)
def q95_payload_manifest(spark, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return d.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        F.expr("(length(payload) + 63) div 64").cast("long").alias("n_chunks"),
    )


# --- Python UDTF surface (Spark 4): imperative cursor parsing ---------
#
# The one API in SURVEY §2.10 the engine had not exercised. Stance
# unchanged — UDTFs are the slow path (row-at-a-time Python, no
# codegen): this exists for the genuinely imperative case, a cursor
# parse that walks a payload emitting a variable number of typed
# records. When the fan-out rule is pure arithmetic (fixed-size
# chunking), the declarative explode (q49) or frame-count expression
# (q95) is strictly better and stays JVM-side; the catalog entry
# documents the boundary by computing the SAME frame table both ways.


def payload_frames_udtf():
    """Build the frame-parsing UDTF class (lazily, so importing this
    module never requires the UDTF runtime)."""
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(returnType="frame_idx int, off bigint, n_bytes bigint, frame_md5 string")
    class PayloadFrames:
        def eval(self, payload, frame_size: int):
            if payload is None:
                return
            off = 0
            idx = 0
            data = bytes(payload)
            while off < len(data):
                chunk = data[off : off + frame_size]
                yield idx, off, len(chunk), hashlib.md5(chunk).hexdigest()
                idx += 1
                off += frame_size

    return PayloadFrames


@register(
    "q161_payload_frames_udtf",
    oracle="""
SELECT d.doc_id,
       CAST(u.i AS INTEGER) AS frame_idx,
       CAST(u.i * 64 AS BIGINT) AS off,
       CAST(least(64, length(d.text) - u.i * 64) AS BIGINT) AS n_bytes,
       md5(substr(d.text, CAST(u.i * 64 + 1 AS BIGINT), 64)) AS frame_md5
FROM documents d,
     unnest(range(0, (length(d.text) + 63) // 64)) AS u(i)
WHERE length(d.text) > 0
""",
    doc="Python UDTF surface (Spark 4 `@udtf` + SQL LATERAL): an "
    "imperative cursor walks each binary payload emitting one typed "
    "row per 64-byte frame (index, offset, length, frame digest) — "
    "the variable-fan-out parse shape (container demuxing, record "
    "splitting) that genuinely needs per-row Python. The oracle "
    "derives the identical frame table declaratively (range + substr "
    "arithmetic), which doubles as the documentation of the boundary: "
    "when the frame rule IS arithmetic, prefer the JVM-side explode "
    "(q49/q95); reach for a UDTF only when it is not. ASCII payloads "
    "make byte and character offsets coincide (same assumption q95's "
    "digest parity already relies on).",
)
def q161_payload_frames_udtf(spark, sf_dir: str) -> DataFrame:
    spark.udtf.register("payload_frames", payload_frames_udtf())
    load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    ).createOrReplaceTempView("q161_payloads")
    return spark.sql(
        """
        SELECT p.doc_id, f.frame_idx, f.off, f.n_bytes, f.frame_md5
        FROM q161_payloads p,
             LATERAL payload_frames(p.payload, 64) f
        """
    )
