"""Example: continuous ingest monitoring — the quality-gate and
source-drift state twins running side by side over a micro-batched
document feed.

Both monitors store only mergeable integer counts (per-(source, score)
for the gate, per-(source, token) for drift) behind the shared
max-applied ledger, so the states are arrival-order independent and
replay-safe; the VERDICTS (per-source gate thresholds, per-source TVD
vs rest-of-corpus) are derived on read and equal the batch queries
q232 / q231 exactly at any point where the stream has covered a corpus.

At 100 TB this is the shape that keeps crawl-health dashboards fresh
without re-scanning the corpus: each arriving batch merges counts
bounded by (sources x score-domain) and (sources x vocab); a scheduled
read derives the report.

    python examples/run_ingest_monitors.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.session import get_spark
from etl_pipeline_candy_store_spark.streaming.drift_stream import (
    read_divergence,
    stream_token_counts,
)
from etl_pipeline_candy_store_spark.streaming.quality_gate_stream import (
    read_gated,
    stream_quality_histogram,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ingest-monitors", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="monitors_")
    src = os.path.join(work, "feed")

    docs = load(spark, sf_dir, "documents")
    docs.repartition(4).write.parquet(src)  # 4 micro-batches

    for name, attach in (
        ("gate", lambda s: stream_quality_histogram(
            s, target_path=os.path.join(work, "gate_state"),
            checkpoint_path=os.path.join(work, "gate_ckpt"))),
        ("drift", lambda s: stream_token_counts(
            s, target_path=os.path.join(work, "drift_state"),
            checkpoint_path=os.path.join(work, "drift_ckpt"))),
    ):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = attach(stream).trigger(availableNow=True).start()
        q.awaitTermination(180)
        print(f"{name}: state merged over 4 micro-batches")

    kept = read_gated(
        spark,
        os.path.join(work, "gate_state"),
        docs.select("doc_id", "source", "text"),
    )
    print(f"gate: {kept.count()} / {docs.count()} docs pass the "
          "per-source bottom-quartile histogram gate")

    report = read_divergence(spark, os.path.join(work, "drift_state"))
    top = report.orderBy(report.tvd_ppm.desc()).limit(3).collect()
    for r in top:
        print(f"drift: {r['source']} tvd_ppm={r['tvd_ppm']}")

    spark.stop()


if __name__ == "__main__":
    main()
