from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from etl_pipeline_candy_store_spark.session import (
        get_spark,
        rocksdb_state_conf,
    )

    conf = {"spark.sql.shuffle.partitions": "8", "spark.ui.enabled": "false"}
    # SPARK_GRAFT_STATESTORE=rocksdb runs the WHOLE suite (notably every
    # stream≡batch equality) under the RocksDB state store provider — the
    # provider a 100 TB deployment actually uses. Default runs keep the
    # HDFS-backed provider; tests/test_rocksdb_state_store.py always
    # exercises RocksDB regardless of this switch.
    if os.environ.get("SPARK_GRAFT_STATESTORE", "").lower() == "rocksdb":
        conf.update(rocksdb_state_conf())
    spark = get_spark("tests", master="local[4]", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
