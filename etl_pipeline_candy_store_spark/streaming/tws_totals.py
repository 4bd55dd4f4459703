"""Running per-source corpus totals via ``transformWithStateInPandas``
— Spark 4's arbitrary-stateful-processing API (the successor to
``applyInPandasWithState``, which the allocation stream uses;
this module covers the NEW surface so both stateful APIs are exercised).

The operator keeps one ValueState row per source (doc count, token
count) and emits the updated running totals every micro-batch — the
always-current "how much of each source have we ingested" gauge that
feeds mixture monitoring (q81/q141) without any batch recomputation.
State size is O(n_sources), the theoretical minimum.

Requires the RocksDB state store provider (Spark's bundled JNI build);
:func:`stream_source_totals` sets it on the session before wiring the
stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

_STATE_SCHEMA = "n_docs LONG, n_tokens LONG"
_OUTPUT_SCHEMA = "source STRING, n_docs LONG, n_tokens LONG"


class SourceTotalsProcessor(StatefulProcessor):
    """Fold (doc count, token count) per source key across batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n_docs = 0
        n_tokens = 0
        for pdf in rows:
            n_docs += len(pdf)
            n_tokens += int(pdf["n_toks"].sum())
        prev = self._totals.get()
        if prev is not None:
            n_docs += int(prev[0])
            n_tokens += int(prev[1])
        self._totals.update((n_docs, n_tokens))
        yield pd.DataFrame(
            {"source": [key[0]], "n_docs": [n_docs], "n_tokens": [n_tokens]}
        )

    def close(self) -> None:
        pass


def stream_source_totals(doc_stream: DataFrame) -> DataFrame:
    """Wire a (source, text, ...) stream into running per-source totals.

    Returns the transformed streaming DataFrame (one updated row per
    source per batch in Update mode). Totals are monotone, so the
    latest emission per source IS the running total — a downstream
    sink can upsert on the source key.
    """
    spark = doc_stream.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    toks = doc_stream.select(
        "source", F.size(F.split("text", " ")).cast("long").alias("n_toks")
    )
    return toks.groupBy("source").transformWithStateInPandas(
        SourceTotalsProcessor(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
