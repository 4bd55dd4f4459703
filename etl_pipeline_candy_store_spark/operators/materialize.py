"""Durable, fingerprint-invalidated materialization of derived relations.

:mod:`.memo` keeps expensive derived relations (near-dup pairs, cluster
labels, PageRank scores) alive *within* a session via ``localCheckpoint``
— the right tool while one driver composes many queries, and explicitly
non-resilient (executor loss drops blocks; a new session rebuilds).

This module is the cross-session/cross-job half of that story: the
"materialize once per corpus version" pattern a 100 TB pipeline actually
runs. A derived relation is written ONCE as parquet under a content
fingerprint of its source tables; every later job — any session, any
driver, after any restart — resolves the same fingerprint and reads the
parquet instead of re-paying the multi-exchange build. When the corpus
changes (new crawl lands, a file is rewritten), the fingerprint changes
and the next consumer rebuilds against the new sources; stale versions
stay addressable until pruned, so concurrent readers of the old corpus
version never observe a half-written swap.

Layout (one directory per relation, one subdirectory per corpus version)::

    {store}/{name}/fp={fingerprint}/          <- plain parquet
    {store}/{name}/fp={fingerprint}/_MANIFEST.json

Write protocol: build -> write parquet to a hidden sibling temp dir ->
atomic ``os.rename`` onto the final path. Losing a creation race is
benign — the loser discards its temp dir and reads the winner (both
built from byte-identical sources). ``rename`` is atomic on POSIX within
a filesystem; on object stores swap the rename for a manifest-commit
(write data, then atomically PUT the manifest the readers resolve).

Fingerprint = md5 over the sorted (relative path, size, mtime_ns) of
every file under the named source tables, plus a caller ``version``
token so a *code* change to the build can force rebuilds even when the
sources are unchanged. Size+mtime (not content hashes) is the standard
cheap fingerprint: re-hashing 100 TB of source to decide whether to skip
a build would cost more than the build.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_MANIFEST.json"


def default_store_dir() -> str:
    """Resolve the store root: ``$SPARK_GRAFT_DERIVED_DIR`` if set, else
    ``derived_relations/`` under the process working directory (tests and
    pipelines normally pass an explicit ``store_dir``)."""
    return os.environ.get(
        "SPARK_GRAFT_DERIVED_DIR", os.path.join(os.getcwd(), "derived_relations")
    )


def _iter_source_files(root: str):
    if os.path.isfile(root):
        yield root, ""
        return
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            full = os.path.join(dirpath, fn)
            yield full, os.path.relpath(full, root)


def source_fingerprint(
    sf_dir: str, tables: Sequence[str], version: str = "1"
) -> str:
    """Cheap content fingerprint of the named source tables under
    ``sf_dir``: md5 over sorted (table, relpath, size, mtime_ns) triples
    plus the ``version`` token. Any file added, removed, resized, or
    rewritten under a named table changes the fingerprint."""
    h = hashlib.md5()
    h.update(f"v={version}".encode())
    for table in sorted(tables):
        root = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(root):
            # streaming state relations (entity_stream, curate_stream)
            # live under bare batch-partitioned dirs, no .parquet suffix
            root = os.path.join(sf_dir, table)
        if not os.path.exists(root):
            raise FileNotFoundError(f"source table not found: {root}")
        entries = sorted(
            (rel, st.st_size, st.st_mtime_ns)
            for full, rel in _iter_source_files(root)
            for st in (os.stat(full),)
        )
        h.update(table.encode())
        for rel, size, mtime in entries:
            h.update(f"|{rel}:{size}:{mtime}".encode())
    return h.hexdigest()


def materialized_relation(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
    tables: Sequence[str],
    store_dir: str | None = None,
    version: str = "1",
) -> DataFrame:
    """Return ``name`` built from ``sf_dir``'s ``tables``, materialized
    once per source fingerprint.

    On a fingerprint hit the relation is a plain parquet scan — column
    pruning and predicate pushdown apply to downstream consumers exactly
    as for any other table (unlike an in-memory checkpoint, which pins
    the full width). On a miss, ``build()`` runs once and its result is
    parquet-written under the fingerprint before being read back.
    """
    store = store_dir or default_store_dir()
    fp = source_fingerprint(sf_dir, tables, version)
    final = os.path.join(store, name, f"fp={fp}")
    if not os.path.isdir(final):
        tmp = os.path.join(
            store, name, f".tmp-{fp}-{os.getpid()}-{time.monotonic_ns()}"
        )
        os.makedirs(os.path.dirname(tmp), exist_ok=True)
        try:
            build().write.mode("overwrite").parquet(tmp)
        except BaseException:
            # a failed build must not strand corpus-scale parquet under
            # the store (prune_materialized only sweeps fp=* dirs)
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        with open(os.path.join(tmp, _MANIFEST), "w") as f:
            json.dump(
                {
                    "name": name,
                    "fingerprint": fp,
                    "sf_dir": os.path.abspath(sf_dir),
                    "tables": sorted(tables),
                    "version": version,
                    "built_at_unix": time.time(),
                },
                f,
                indent=2,
            )
        try:
            os.rename(tmp, final)
        except OSError:
            # Lost a concurrent-creation race: the winner's output is
            # equivalent (same fingerprint => byte-identical sources).
            if os.path.isdir(final):
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                raise
    return spark.read.parquet(final)


def materialized_versions(name: str, store_dir: str | None = None) -> list[str]:
    """Fingerprints currently stored for ``name`` (all corpus versions)."""
    root = os.path.join(store_dir or default_store_dir(), name)
    if not os.path.isdir(root):
        return []
    return sorted(
        d[len("fp=") :] for d in os.listdir(root) if d.startswith("fp=")
    )


def prune_materialized(
    name: str, keep: int = 1, store_dir: str | None = None
) -> list[str]:
    """Drop all but the ``keep`` most recently BUILT versions of ``name``
    (by manifest build time; versions without a readable manifest rank
    oldest). Returns the removed fingerprints. Run this only once no
    reader can still be pinned to an old corpus version — on a shared
    store that means after the pipeline's version cutover, not mid-run."""
    root = os.path.join(store_dir or default_store_dir(), name)
    if not os.path.isdir(root):
        return []

    def built_at(fp: str) -> float:
        try:
            with open(os.path.join(root, f"fp={fp}", _MANIFEST)) as f:
                return float(json.load(f)["built_at_unix"])
        except (OSError, ValueError, KeyError):
            return 0.0

    versions = sorted(materialized_versions(name, store_dir), key=built_at)
    removed = versions[: max(len(versions) - keep, 0)]
    for fp in removed:
        shutil.rmtree(os.path.join(root, f"fp={fp}"), ignore_errors=True)
    return removed
