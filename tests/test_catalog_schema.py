"""Schema-drift canary: load every catalog table and pin post-load dtypes.

The driver regenerates /root/testdata between rounds and has already
changed physical parquet layouts once (events.ts: INT64-nanos →
timestamp[us]), silently breaking every events-based query. This test
makes the next regeneration fail one obvious assertion instead of 17
queries, 9 tests, and the bench.

The contract asserted here is the *post-load* dtype surface that every
downstream operator relies on — not the on-disk physical type, which
``catalog.load`` is explicitly allowed to normalize.
"""

from __future__ import annotations

import os

import pytest

from etl_pipeline_candy_store_spark.plans.catalog import load

SF_DIR = os.environ.get("SPARK_GRAFT_CANARY_SF", "/root/testdata/sf0.001")

# table -> {column: expected post-load dtype}. Only load-bearing columns
# are pinned (keys, timestamps, measures); ancillary strings are spot
# checked by presence.
EXPECTED: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_nationkey": "int", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int"},
    "part": {"p_partkey": "bigint", "p_retailprice": "double"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # canonical: catalog.load normalizes all variants
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "bigint", "text": "string", "source": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason=f"no testdata at {SF_DIR}")
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_post_load_dtypes(spark, table):
    df = load(spark, SF_DIR, table)
    dtypes = dict(df.dtypes)
    for col, want in EXPECTED[table].items():
        assert col in dtypes, f"{table}.{col} missing; have {sorted(dtypes)}"
        got = dtypes[col]
        assert got == want, (
            f"{table}.{col}: post-load dtype {got!r} != pinned {want!r} — "
            "testdata physical layout drifted; update catalog.load to "
            "normalize the new variant (see its docstring)"
        )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason=f"no testdata at {SF_DIR}")
def test_events_ts_values_sane(spark):
    """Beyond the dtype: the normalized instants must land in a plausible
    epoch range (a unit mix-up like nanos-read-as-micros lands in 1970)."""
    from pyspark.sql import functions as F

    df = load(spark, SF_DIR, "events")
    row = df.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    assert row["n"] > 0
    assert row["lo"].year >= 2000, f"events.ts min {row['lo']} — unit mix-up?"
    assert row["hi"].year <= 2100, f"events.ts max {row['hi']} — unit mix-up?"


def test_events_loader_normalizes_all_physical_layouts(spark, tmp_path):
    """The same instants written as INT64-nanos, timestamp[us] (NTZ), and
    timestamp[us, UTC] must load to identical TimestampType values — the
    mixed-writer reality of a 100 TB events table, and the exact drift
    that broke round 3."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["a", "b"], pa.string()),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"], pa.string()),
    }
    layouts = {
        "nanos_int64": pa.array([m * 1000 for m in micros], pa.int64()),
        "micros_ntz": pa.array(micros, pa.timestamp("us")),
        "micros_utc": pa.array(micros, pa.timestamp("us", tz="UTC")),
    }
    got = {}
    for name, ts_arr in layouts.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table({"event_id": base["event_id"], "ts": ts_arr, **{
                k: v for k, v in base.items() if k != "event_id"}}),
            str(d / "events.parquet"),
        )
        df = load(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", name
        got[name] = sorted(
            (r["event_id"], r["ts"].isoformat()) for r in df.select("event_id", "ts").collect()
        )
    assert got["nanos_int64"] == got["micros_ntz"] == got["micros_utc"], got


@pytest.mark.slow
def test_catalog_outputs_are_scalar_typed(spark):
    """No catalog query may emit an array/struct/map column: the
    correctness harness hash-compares stringified cells, and non-scalar
    cells stringify differently between Arrow-backed toPandas (numpy,
    '[1 2 3]') and plain toPandas ('[1, 2, 3]') — a result that flips
    with session config is not a stable contract. Found live on q82
    (postings, now a comma-joined string); this canary keeps the whole
    catalog scalar forever."""
    from etl_pipeline_candy_store_spark.plans import catalog

    catalog._ensure_loaded()
    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, ent in catalog.REGISTRY.items():
        df = ent.builder(spark, sf)
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t.startswith(("array", "struct", "map")):
                offenders.append((name, f.name, t))
    assert not offenders, offenders
