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


# --- Perceptual-hash media NEAR-dup (byte-profile dHash + banded ------
# Hamming join). Exact digest dedup (q95) catches byte-identical
# copies; re-encoded / lightly-edited media needs a PERCEPTUAL
# signature. The production signature is a dHash over decoded pixels —
# codec-gated like q67's embedding — so the engine-testable form
# computes the same dHash SHAPE over the raw byte profile: average
# byte value per contiguous segment, one bit per adjacent-segment
# comparison. Localized same-length edits (the byte-domain analogue of
# a small patch edit) perturb 1-2 segments and flip <= a couple bits,
# while unrelated payloads sit far apart (measured >= 12 bits on the
# synthetic corpus, variants <= 6) — the separation the banded join
# thresholds on.

_PHASH_SEGMENTS = 64  # 63 comparison bits: bit 63 would be the BIGINT
#                       sign bit (DuckDB's range-checked shift rejects
#                       1<<63; Spark would wrap silently) — 63 bits
#                       keeps the signature engine-exact
_PHASH_BANDS = 7
_PHASH_BAND_BITS = 9  # 7 x 9 = 63
_PHASH_HAMMING_MAX = 6  # exact for radius <= bands-1 (pigeonhole)


def media_phash(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """63-bit byte-profile dHash per media payload: split the payload
    into 64 contiguous segments, average the byte values, set bit j
    iff avg(segment j+1) > avg(segment j) — compared by integer
    cross-multiplication (s2*c1 > s1*c2), so the signature is exact
    integer arithmetic end-to-end (no float averages to drift across
    engines). Payloads shorter than 64 bytes are dropped (no full
    profile exists; a thumbnail that small is cheaper to byte-compare).

    ASCII payload assumption (byte == character, q95/q161's
    discipline) lets both engines read byte values with split('') +
    ascii(). Plan: one linear byte explode, a (media_id, seg) map-side
    combinable agg, a 64-row-per-media window for the adjacent
    comparison, one final media-keyed agg — all media-keyed shuffles,
    no pair space."""
    from pyspark.sql.window import Window

    ch = F.split(F.col(payload_col).cast("string"), "")
    base = df.select(
        F.col(id_col).alias("media_id"), ch.alias("ch")
    ).filter(F.size("ch") >= _PHASH_SEGMENTS)
    by = (
        base.select(
            "media_id",
            F.size("ch").cast("long").alias("n"),
            F.posexplode("ch").alias("i0", "c"),
        )
        .select(
            "media_id",
            F.expr(f"(i0 * {_PHASH_SEGMENTS}) div n").alias("seg"),
            F.ascii("c").cast("long").alias("b"),
        )
    )
    segs = by.groupBy("media_id", "seg").agg(
        F.sum("b").alias("s"), F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("media_id").orderBy("seg")
    bits = (
        segs.select(
            "media_id",
            "seg",
            "s",
            "c",
            F.lead("s").over(w).alias("s2"),
            F.lead("c").over(w).alias("c2"),
        )
        .where(F.col("seg") < _PHASH_SEGMENTS - 1)
        .select(
            "media_id",
            F.when(
                F.col("s2") * F.col("c") > F.col("s") * F.col("c2"),
                F.expr("shiftleft(1L, cast(seg as int))"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("bit"),
        )
    )
    return bits.groupBy("media_id").agg(
        F.sum("bit").cast("long").alias("phash")
    )


def phash_bands(ph: DataFrame) -> DataFrame:
    """(media_id, phash) → one row per LSH band: (media_id, phash,
    band_idx, band_val). The shared banding of the batch near-dup
    (q205) and the streaming ingest twin — the band table IS the
    streaming state shape."""
    return ph.select(
        "media_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(_PHASH_BANDS - 1))).alias(
            "band_idx"
        ),
    ).withColumn(
        "band_val",
        F.expr(
            f"(phash >> (band_idx * {_PHASH_BAND_BITS}))"
            f" & {(1 << _PHASH_BAND_BITS) - 1}"
        ),
    )


def verify_banded_candidates(
    cand: DataFrame, *, hamming_max: int = _PHASH_HAMMING_MAX
) -> DataFrame:
    """Collapse band-join candidate rows (media_a, pa, media_b, pb,
    band_idx — one row PER agreeing band) to verified pairs without a
    distinct(): the first-agreeing-band index is a pure function of
    pa ^ pb, so keeping only the row whose band_idx equals it emits
    each pair exactly once (q68's trick), then the Hamming radius
    verifies."""
    mask = (1 << _PHASH_BAND_BITS) - 1
    first_band = F.expr(
        "case "
        + " ".join(
            f"when (((pa ^ pb) >> {k * _PHASH_BAND_BITS}) & {mask}) = 0"
            f" then {k}"
            for k in range(_PHASH_BANDS - 1)
        )
        + f" else {_PHASH_BANDS - 1} end"
    )
    return (
        cand.filter(F.col("band_idx") == first_band)
        .withColumn("hamming", F.expr("bit_count(pa ^ pb)").cast("int"))
        .filter(F.col("hamming") <= hamming_max)
        .select("media_a", "media_b", "hamming")
    )


def phash_neardup_pairs(
    ph: DataFrame, *, hamming_max: int = _PHASH_HAMMING_MAX
) -> DataFrame:
    """Banded Hamming near-dup over (media_id, phash) — the q68
    machinery re-used for the 63-bit media signature: 7 bands x 9
    bits; any pair within ``hamming_max`` <= 6 (< #bands) must agree
    on a full band (pigeonhole), so the band-bucket equi-join finds
    EVERY qualifying pair without materializing the pair space.
    Per-row first-agreeing-band filter instead of distinct() — no
    extra pair shuffle (q68's trick)."""
    bands = phash_bands(ph)
    a = bands.select(
        F.col("media_id").alias("media_a"),
        F.col("phash").alias("pa"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("media_id").alias("media_b"),
        F.col("phash").alias("pb"),
        "band_idx",
        "band_val",
    )
    return verify_banded_candidates(
        a.join(b, ["band_idx", "band_val"]).filter(
            F.col("media_a") < F.col("media_b")
        ),
        hamming_max=hamming_max,
    )


#: Deterministic "re-encoded variant" payloads: every 10th document
#: re-appears under media_id + 1e6 with a same-length localized edit
#: (chars 11-20 overwritten) — the byte-domain stand-in for a lightly
#: re-encoded image, constructed IDENTICALLY in both engines so the
#: near-dup oracle is non-vacuous (raw synthetic docs are white noise:
#: no two sit within hamming 12).
_PHASH_VARIANT_OFFSET = 1_000_000
_PHASH_VARIANT_MOD = 10

_PHASH_MEDIA_SQL = f"""
media AS (
  SELECT doc_id AS media_id, text AS payload_text FROM documents
  UNION ALL
  SELECT doc_id + {_PHASH_VARIANT_OFFSET},
         substr(text, 1, 10) || repeat('X', 10) || substr(text, 21)
  FROM documents WHERE doc_id % {_PHASH_VARIANT_MOD} = 0
)"""

_PHASH_SQL = f"""
pbase AS (
  SELECT media_id, string_split(payload_text, '') AS ch FROM media
  WHERE len(string_split(payload_text, '')) >= {_PHASH_SEGMENTS}
),
pbytes AS (
  SELECT t.media_id, ((u.i - 1) * {_PHASH_SEGMENTS}) // len(t.ch) AS seg,
         ord(t.ch[CAST(u.i AS BIGINT)]) AS b
  FROM pbase t, unnest(range(1, len(t.ch) + 1)) AS u(i)
),
psegs AS (
  SELECT media_id, seg, SUM(b) AS s, COUNT(*) AS c
  FROM pbytes GROUP BY 1, 2
),
pbits AS (
  SELECT a.media_id,
         CASE WHEN b.s * a.c > a.s * b.c
              THEN (1::BIGINT << CAST(a.seg AS INTEGER)) ELSE 0 END AS bit
  FROM psegs a JOIN psegs b
       ON b.media_id = a.media_id AND b.seg = a.seg + 1
  WHERE a.seg < {_PHASH_SEGMENTS - 1}
),
ph AS (
  SELECT media_id, CAST(SUM(bit) AS BIGINT) AS phash
  FROM pbits GROUP BY media_id
)"""


@register(
    "q205_media_phash_neardup",
    oracle=f"""
WITH {_PHASH_MEDIA_SQL},
{_PHASH_SQL},
bands AS (
  SELECT media_id, phash, u.band_idx,
         (phash >> (u.band_idx * {_PHASH_BAND_BITS}))
           & {(1 << _PHASH_BAND_BITS) - 1} AS band_val
  FROM ph, unnest(range(0, {_PHASH_BANDS})) AS u(band_idx)
),
cand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
         a.phash AS pa, b.phash AS pb
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.media_id < b.media_id
)
SELECT media_a, media_b,
       CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(pa, pb)) <= {_PHASH_HAMMING_MAX}
""",
    doc="Perceptual-hash media NEAR-dup — the image-dedup story every "
    "training pipeline runs, which digest dedup (q95) cannot: a "
    "63-bit byte-profile dHash per payload (64 contiguous segments, "
    "average byte value, one bit per adjacent-segment comparison via "
    "integer cross-multiplication — exact in both engines; bit 63 is "
    "excluded because DuckDB's range-checked shift rejects 1<<63 "
    "where Spark would silently wrap the sign bit), then the q68 "
    "banded-Hamming machinery: 7 bands x 9 bits, pigeonhole-EXACT "
    "for radius <= 6, candidates only from band-bucket equi-joins — "
    "the pair space never materializes. The media relation unions "
    "every 10th document back in as a same-length locally-edited "
    "variant (re-encoded-copy stand-in), built identically in both "
    "engines, because the raw synthetic docs are byte-level white "
    "noise (closest unrelated pair: hamming 12) — variants land at "
    "hamming 0-6, unrelated pairs never qualify, so the result is "
    "exactly the parent-variant matches the banding must recover. "
    "Production swaps the byte profile for the decoded-pixel dHash "
    "(media_phash_pixels: PIL-gated decode, numpy P6 fallback, "
    "tested upscale-invariant); every Spark-side stage (banding, "
    "first-band dedup filter, radius verify) is SHARED with it.",
)
def q205_media_phash_neardup(spark, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    variants = d.filter(
        F.col("doc_id") % _PHASH_VARIANT_MOD == 0
    ).select(
        (F.col("doc_id") + _PHASH_VARIANT_OFFSET).alias("media_id"),
        F.concat(
            F.substring("text", 1, 10),
            F.lit("X" * 10),
            F.expr("substring(text, 21)"),
        ).alias("payload_text"),
    )
    media = d.select(
        F.col("doc_id").alias("media_id"), F.col("text").alias("payload_text")
    ).unionByName(variants)
    ph = media_phash(
        media.select(
            "media_id", F.col("payload_text").cast("binary").alias("payload")
        )
    )
    return phash_neardup_pairs(ph)


# --- Decoded-pixel dHash (the production swap q205's doc promises) -------
#
# q205's byte-profile signature is the oracle-checkable stand-in; real
# image near-dup hashes DECODED PIXELS so that re-encodes (different
# bytes, same picture) still collide. The decode is import-gated: PIL
# when available (any format), else a pure-numpy raw P6 PPM parser (the
# format this sandbox can exercise end-to-end — PIL closes with egress).
# Everything downstream of the per-media signature — banding, the
# first-agreeing-band dedup filter, the Hamming-radius verify — is the
# SAME code as q205 (phash_bands / verify_banded_candidates /
# phash_neardup_pairs), so swapping the signature never touches the
# Spark plan shape.

_DHASH_ROWS = 8
_DHASH_COLS = 9  # 8x8 adjacent comparisons = 64 bits; bit 63 dropped to
#                 keep the 63-bit engine-exact convention of media_phash


def _decode_ppm_p6(payload: bytes) -> np.ndarray:
    """Raw (binary) P6 PPM -> (h, w, 3) uint8, numpy only. Tolerates
    comments and arbitrary whitespace in the header, as the spec
    allows; raises ValueError for anything that is not an 8-bit P6."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    vals: list[int] = []
    i = 2
    n = len(payload)
    while len(vals) < 3 and i < n:
        c = payload[i]
        if c in b" \t\r\n":
            i += 1
        elif c == ord("#"):
            while i < n and payload[i] not in b"\r\n":
                i += 1
        elif chr(c).isdigit():
            j = i
            while j < n and chr(payload[j]).isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            raise ValueError("malformed PPM header")
    if len(vals) < 3 or i >= n:
        raise ValueError("truncated PPM header")
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    i += 1  # the single whitespace byte after maxval
    data = np.frombuffer(payload, dtype=np.uint8, offset=i, count=h * w * 3)
    if data.size != h * w * 3:
        raise ValueError("truncated PPM data")
    return data.reshape(h, w, 3)


def _decode_rgb(payload: bytes) -> np.ndarray:
    """Import-gated decode: PIL for arbitrary formats when installed,
    else the numpy P6 parser. ValueError marks an undecodable payload
    (callers skip it, mirroring how a production pipeline quarantines
    corrupt media)."""
    try:
        import io

        from PIL import Image  # noqa: PLC0415 — the import IS the gate

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        return _decode_ppm_p6(payload)


def _dhash_from_rgb(arr: np.ndarray) -> int:
    """Classic dHash over an (h, w, 3) integer array: integer grayscale
    (channel sum), box-average pooling to an 8x9 grid, one bit per
    row-adjacent comparison — means compared by cross-multiplication,
    so the hash is exact integer arithmetic end-to-end and invariant
    under pixel-replicating upscales (tested)."""
    g = arr.astype(np.int64).sum(axis=2)
    h, w = g.shape
    if h < _DHASH_ROWS or w < _DHASH_COLS:
        raise ValueError("image smaller than the dHash grid")
    row_idx = (np.arange(h) * _DHASH_ROWS) // h
    col_idx = (np.arange(w) * _DHASH_COLS) // w
    rb = np.add.reduceat(
        g, np.searchsorted(row_idx, np.arange(_DHASH_ROWS)), axis=0
    )
    s = np.add.reduceat(
        rb, np.searchsorted(col_idx, np.arange(_DHASH_COLS)), axis=1
    )
    cnt = np.outer(
        np.bincount(row_idx, minlength=_DHASH_ROWS),
        np.bincount(col_idx, minlength=_DHASH_COLS),
    ).astype(np.int64)
    bits = 0
    for r in range(_DHASH_ROWS):
        for c in range(_DHASH_COLS - 1):
            k = r * (_DHASH_COLS - 1) + c
            if k >= _PHASH_SEGMENTS - 1:
                break
            if s[r, c + 1] * cnt[r, c] > s[r, c] * cnt[r, c + 1]:
                bits |= 1 << k
    return bits


def media_phash_pixels(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, phash) from DECODED pixels via Arrow-batched
    ``mapInPandas`` — the production signature for
    :func:`phash_neardup_pairs` (same 63-bit domain, same banding, same
    verify as the byte-profile q205 path). Undecodable or sub-grid
    payloads are skipped, not scored."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            phs: list[int] = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    arr = _decode_rgb(bytes(payload))
                    ph = _dhash_from_rgb(arr)
                except ValueError:
                    continue
                ids.append(int(mid))
                phs.append(ph)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(phs, dtype="int64"),
                }
            )

    return df.mapInPandas(_batches, schema="media_id long, phash long")
