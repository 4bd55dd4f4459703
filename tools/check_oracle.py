"""Local replica of the driver's correctness harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet dir, then compares row count, column names, and an
order-insensitive value hash. Use while iterating:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        nulls = col.isna()
        if col.dtype.kind == "f":
            df[c] = col.map(lambda v: repr(float(v)))
        else:
            df[c] = col.astype(str)
        # normalize None/NaT/nan renderings across engines
        df.loc[nulls, c] = "<null>"
    rows = sorted(",".join(r) for r in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--json PATH] [--plain] "
                  "[SF_DIR [QUERY...]]", file=sys.stderr)
            return 2
        json_path = argv[i + 1]
        del argv[i : i + 2]
    plain = "--plain" in argv
    if plain:
        argv.remove("--plain")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as e

    if plain:
        # driver-conditions mode: a bare SparkSession with NONE of the
        # engine's confs (no Arrow, no shuffle-partition tuning, default
        # timestamp behavior) — catches conf-dependent bugs the tuned
        # session hides, matching how the external driver runs queries()
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-plain")
            .getOrCreate()
        )
    else:
        from etl_pipeline_candy_store_spark.session import get_spark

        spark = get_spark("oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    results: dict[str, dict] = {}
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            results[name] = {"status": "spark_error", "err": str(ex)[:500]}
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            results[name] = {
                "status": "rows_only",
                "spark_rows": len(sdf),
                "sec": round(time.time() - t0, 2),
            }
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            results[name] = {"status": "duckdb_error", "err": str(ex)[:500]}
            continue
        issues = []
        if len(sdf) != len(odf):
            issues.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            issues.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif canon(sdf) != canon(odf):
            issues.append("value-hash mismatch")
        if issues:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(issues)}  ({time.time()-t0:.1f}s)")
            results[name] = {"status": "mismatch", "issues": issues}
            if "value-hash mismatch" in issues and len(sdf) == len(odf):
                s = sdf[sorted(sdf.columns)].astype(str).apply("|".join, axis=1)
                o = odf[sorted(odf.columns)].astype(str).apply("|".join, axis=1)
                ss, oo = set(s), set(o)
                print("    spark-only:", list(ss - oo)[:3])
                print("    duck-only: ", list(oo - ss)[:3])
        else:
            print(f"PASS  {name}  ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            results[name] = {
                "status": "pass",
                "rows": len(sdf),
                "sec": round(time.time() - t0, 2),
            }
    print(f"\n{failures} failures / {len(only) if only else len(qs)} checked")
    if json_path:
        import json

        # stamp the exact commit the artifact describes, plus whether the
        # tree was dirty — round 6 shipped an artifact generated BEFORE
        # the fix the same snapshot commit contained, and the stamp makes
        # that class of staleness self-evident
        import subprocess

        try:
            git_sha = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True
            ).stdout.strip()
            # -uno: tracked modifications are the staleness signal; an
            # UNTRACKED file can't make the code differ from git_sha —
            # and the ritual itself writes the tuned artifact before the
            # plain sweep runs, which used to stamp the second artifact
            # dirty=True about a perfectly clean tree. PROGRESS.jsonl is
            # excluded the same way: the build driver appends telemetry
            # to it every ~15 min, so a long sweep would otherwise stamp
            # dirty=True about a file that cannot change the code.
            status = subprocess.run(
                ["git", "status", "--porcelain", "--untracked-files=no"],
                capture_output=True,
                text=True,
            ).stdout
            # exact repo-root path match (porcelain is `XY <path>`):
            # a suffix match would also excuse subdir/PROGRESS.jsonl or
            # MYPROGRESS.jsonl — real code-adjacent modifications
            dirty = bool(
                [
                    ln
                    for ln in status.splitlines()
                    if ln.strip() and ln[3:] != "PROGRESS.jsonl"
                ]
            )
        except Exception:
            git_sha, dirty = None, None
        summary = {
            "sf_dir": sf_dir,
            "git_sha": git_sha,
            "git_dirty": dirty,
            "session": "plain" if plain else "tuned",
            "checked": len(results),
            "failures": failures,
            "pass": sum(1 for r in results.values() if r["status"] == "pass"),
            "rows_only": sum(
                1 for r in results.values() if r["status"] == "rows_only"
            ),
            "queries": results,
        }
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
