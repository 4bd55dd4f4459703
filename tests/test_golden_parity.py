"""Golden-output parity against the reference's dataset_22
(/root/reference/data — read-only input data, not code).

Scope per SURVEY §5.2: orders.csv + order_line_items.csv are consistent
with dataset_22 under golden semantics (skip rule active) for days 1-8;
days 9-10 drift because the golden run consumed Mongo natural order,
which is unknowable from the JSON files. So: exact row parity for days
1-8, set/count parity overall. daily_summary/forecast golden files are
stale (different dataset) and are NOT oracles.
"""

from __future__ import annotations

import csv
import glob
import os

import pytest

REF = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference dataset not present"
)


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    from etl_pipeline_candy_store_spark.plans.candy_pipeline import (
        CandyConfig,
        CandyPipeline,
    )

    pipe = CandyPipeline(
        spark,
        CandyConfig(
            products_csv=f"{REF}/dataset_22/products.csv",
            customers_csv=f"{REF}/dataset_22/customers.csv",
            transactions_paths=sorted(
                glob.glob(f"{REF}/dataset_22/transactions_*.json")
            ),
            output_dir=str(tmp_path_factory.mktemp("golden_out")),
            skip_empty_orders=True,  # golden-run semantics (SURVEY §5.2)
        ),
    )
    paths = pipe.save_outputs()
    return paths


def _read(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def test_orders_counts_and_ids(outputs):
    ours = _read(outputs["orders"])
    golden = _read(f"{REF}/output/orders.csv")
    assert len(golden) == 9845
    assert len(ours) == len(golden)
    assert {r["order_id"] for r in ours} == {r["order_id"] for r in golden}


def test_orders_exact_days_1_to_8(outputs):
    ours = {r["order_id"]: r for r in _read(outputs["orders"])}
    golden = [r for r in _read(f"{REF}/output/orders.csv")
              if r["order_datetime"] < "2024-02-09"]
    assert len(golden) > 7000
    mismatches = [
        (g, ours[g["order_id"]]) for g in golden if ours[g["order_id"]] != g
    ]
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[:2]}"


def test_line_items_counts(outputs):
    ours = _read(outputs["order_line_items"])
    golden = _read(f"{REF}/output/order_line_items.csv")
    assert len(golden) == 27903
    assert len(ours) == len(golden)


def test_line_items_exact_days_1_to_8(outputs):
    day8_orders = {
        r["order_id"]
        for r in _read(f"{REF}/output/orders.csv")
        if r["order_datetime"] < "2024-02-09"
    }
    key = lambda r: (r["order_id"], r["product_id"])
    ours = {key(r): r for r in _read(outputs["order_line_items"])
            if r["order_id"] in day8_orders}
    mismatches = []
    golden_rows = [r for r in _read(f"{REF}/output/order_line_items.csv")
                   if r["order_id"] in day8_orders]
    for g in golden_rows:
        if ours.get(key(g)) != g:
            mismatches.append((g, ours.get(key(g))))
    assert not mismatches, f"{len(mismatches)}/{len(golden_rows)}; first: {mismatches[:2]}"


def test_head_semantics_emits_all_transactions(spark, tmp_path_factory):
    """HEAD semantics (skip rule commented out, src/data_processor.py:
    454-456): every one of the 10,000 transactions emits an order, the
    155 all-invalid ones with num_items=0."""
    from etl_pipeline_candy_store_spark.plans.candy_pipeline import (
        CandyConfig,
        CandyPipeline,
    )
    from pyspark.sql import functions as F

    pipe = CandyPipeline(
        spark,
        CandyConfig(
            products_csv=f"{REF}/dataset_22/products.csv",
            customers_csv=f"{REF}/dataset_22/customers.csv",
            transactions_paths=sorted(
                glob.glob(f"{REF}/dataset_22/transactions_*.json")
            ),
            output_dir=str(tmp_path_factory.mktemp("head_out")),
            skip_empty_orders=False,
        ),
    )
    orders = pipe.order_aggregates()
    assert orders.count() == 10000
    # num_items==0 covers BOTH all-invalid transactions (155 — no line
    # rows at all) and orders whose valid lines were all cancelled by
    # allocation (have line rows with quantity=0)
    zero_item = orders.filter(F.col("num_items") == 0)
    assert zero_item.count() >= 155
    lines = pipe.allocated_lines().select("order_id").distinct()
    no_lines = orders.join(lines, "order_id", "left_anti")
    assert no_lines.count() == 155
