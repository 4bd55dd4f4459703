"""DAG runner: checkpointed tasks must produce the same outputs as the
monolithic save_outputs(), without recomputing allocation."""

from __future__ import annotations

import csv
import glob
import os

import pytest

from etl_pipeline_candy_store_spark.plans.candy_pipeline import (
    CandyConfig,
    CandyPipeline,
)
from etl_pipeline_candy_store_spark.plans.orchestration import run_dag
from tests.candy_fixtures import write_fixture


def test_dag_matches_monolithic(spark, tmp_path):
    root = str(tmp_path / "fix")
    write_fixture(root)
    base = dict(
        products_csv=os.path.join(root, "products.csv"),
        customers_csv=os.path.join(root, "customers.csv"),
        transactions_paths=sorted(glob.glob(os.path.join(root, "transactions_*.json"))),
    )
    mono_cfg = CandyConfig(**base, output_dir=str(tmp_path / "mono"))
    dag_cfg = CandyConfig(**base, output_dir=str(tmp_path / "dag"))

    CandyPipeline(spark, mono_cfg).save_outputs()
    done = run_dag(spark, dag_cfg, str(tmp_path / "ckpt"))
    assert done == ["load_data", "process_data", "generate_forecast", "cleanup"]

    for fname in ["orders.csv", "order_line_items.csv", "daily_summary.csv",
                  "products_updated.csv", "sales_profit_forecast.csv"]:
        with open(os.path.join(mono_cfg.output_dir, fname)) as f:
            mono = sorted(f.readlines())
        with open(os.path.join(dag_cfg.output_dir, fname)) as f:
            dag = sorted(f.readlines())
        assert mono == dag, fname

    # checkpoints exist and are date-partitioned
    parts = os.listdir(str(tmp_path / "ckpt" / "allocated_lines"))
    assert any(p.startswith("business_date=") for p in parts)
