"""Contract test for the Mongo connector passthrough (S3).

No Mongo server or connector jar exists in this container, so the read
path can't execute; what CAN be locked down is the exact reader contract
``read_mongo`` hands to Spark — format name and option keys the
mongo-spark connector documents. The semantically-equivalent native path
(per-day JSON, golden-verified) is covered by the pipeline tests."""

from __future__ import annotations

from etl_pipeline_candy_store_spark.sources.readers import read_mongo


class _RecorderReader:
    def __init__(self):
        self.fmt = None
        self.opts = {}
        self.loaded = False

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        self.loaded = True
        return self


class _FakeSpark:
    def __init__(self, reader):
        self._reader = reader

    @property
    def read(self):
        return self._reader


def test_read_mongo_reader_contract():
    rec = _RecorderReader()
    out = read_mongo(
        _FakeSpark(rec),
        "mongodb://host:27017",
        "candy_store",
        "transactions_20240101",
    )
    assert out is rec and rec.loaded
    # mongo-spark v10 contract: format name + connection/database/collection
    assert rec.fmt == "mongodb"
    assert rec.opts == {
        "connection.uri": "mongodb://host:27017",
        "database": "candy_store",
        "collection": "transactions_20240101",
    }
