"""Decoded-pixel dHash (q205's production swap): numpy P6 decode,
upscale invariance, near-dup recovery through the SHARED banding
machinery, and the PIL import gate."""

from __future__ import annotations

import sys
import types

import numpy as np
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.multimodal import (
    _decode_ppm_p6,
    _decode_rgb,
    _dhash_from_rgb,
    media_phash_pixels,
    phash_neardup_pairs,
)


def _ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + arr.astype(
        np.uint8
    ).tobytes()


def _image(seed: int, h: int = 64, w: int = 72) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_and_header_tolerance():
    img = _image(1)
    back = _decode_ppm_p6(_ppm(img))
    assert (back == img).all()
    # comments + odd whitespace in the header are legal P6
    raw = b"P6 # c\n#another\n\t72\r\n64  255\n" + img.tobytes()
    assert (_decode_ppm_p6(raw) == img).all()
    for bad in (b"P5\n1 1\n255\n\x00", b"P6\n2 2\n255\n\x00\x01"):
        try:
            _decode_ppm_p6(bad)
        except ValueError:
            pass
        else:
            raise AssertionError("malformed PPM must raise")


def test_dhash_upscale_invariance_and_range():
    img = _image(2)
    ph = _dhash_from_rgb(img)
    assert 0 <= ph < (1 << 63)
    up = img.repeat(2, axis=0).repeat(2, axis=1)  # pixel-replicating 2x
    assert _dhash_from_rgb(up) == ph
    up3 = img.repeat(3, axis=0).repeat(3, axis=1)
    assert _dhash_from_rgb(up3) == ph


def test_pixel_neardup_recovers_variants(spark):
    """Local edits land within the Hamming radius; unrelated images do
    not collide — through the exact phash_neardup_pairs machinery q205
    uses (banding, first-band dedup, radius verify unchanged)."""
    rows = []
    truth = set()
    for i in range(12):
        img = _image(100 + i)
        rows.append((i, bytearray(_ppm(img))))
        if i % 3 == 0:
            v = img.copy()
            v[:2, :2] = 255 - v[:2, :2]  # small local edit
            rows.append((1000 + i, bytearray(_ppm(v))))
            truth.add((i, 1000 + i))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    ph = media_phash_pixels(df)
    assert ph.count() == len(rows)  # every payload decodable
    pairs = {
        (r["media_a"], r["media_b"])
        for r in phash_neardup_pairs(ph).collect()
    }
    assert truth <= pairs, f"missed variants: {truth - pairs}"
    # no unrelated base-image pair qualifies
    assert not [p for p in pairs if p[0] < 1000 and p[1] < 1000]


def test_undecodable_payloads_are_skipped(spark):
    rows = [
        (1, bytearray(_ppm(_image(7)))),
        (2, bytearray(b"JFIF not really decodable here")),
        (3, bytearray(b"P6\n4 4\n255\n\x00")),  # truncated
        (4, bytearray(_ppm(_image(8, h=4, w=4)))),  # below the grid
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"] for r in media_phash_pixels(df).collect()}
    assert got == {1}


def test_pil_gate_branch(monkeypatch):
    """When PIL is importable, _decode_rgb routes through it (closes
    for free with egress); the fake decodes our PPM so both branches
    must agree bit-for-bit."""
    img = _image(9)
    payload = _ppm(img)

    class _FakeImg:
        def __init__(self, data):
            self._arr = _decode_ppm_p6(bytes(data))

        def convert(self, mode):
            assert mode == "RGB"
            return self._arr

    fake_image_mod = types.SimpleNamespace(
        open=lambda buf: _FakeImg(buf.getvalue())
    )
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(
        sys.modules, "PIL.Image", fake_image_mod
    )
    via_pil = _dhash_from_rgb(_decode_rgb(payload))
    monkeypatch.delitem(sys.modules, "PIL")
    monkeypatch.delitem(sys.modules, "PIL.Image")
    via_ppm = _dhash_from_rgb(_decode_rgb(payload))
    assert via_pil == via_ppm
