"""Skew-handling primitives (SURVEY §4.3 / 100 TB posture).

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); these
helpers cover the two shapes AQE cannot fix:

- a *hot aggregation key* (one key dominating a groupBy): two-phase
  salted aggregation — partial agg on (key, salt), final agg on key.
  Legal for any algebraic aggregate (sum/count/min/max); the engine's
  decimal-routed sums stay exact because decimal addition is associative.
- a *hot join key* against a medium dimension too big to broadcast:
  salt the fact side, explode the dimension side across the salt range.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    n_salts: int,
    col_name: str = "_salt",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Uniform salt in [0, n_salts) derived from deterministic row CONTENT
    (hash of ``salt_cols``, default: every column). Content-derived salts
    are stable across task retries and speculative re-execution — a
    recomputed map task re-salts each row identically, so downstream
    shuffle routing never drops or double-counts rows under failure
    recovery. (``monotonically_increasing_id``/``rand`` would not be:
    both depend on partition layout / RNG state at recompute time.)

    Identical rows share a salt; that only matters if a hot key's rows are
    also byte-identical, in which case pass ``salt_cols`` naming a column
    that varies within the key (a sequence number, timestamp, ...)."""
    cols = list(salt_cols) if salt_cols is not None else df.columns
    return df.withColumn(col_name, F.pmod(F.hash(*cols), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
    partial_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``partial_aggs`` run per (keys, salt); ``aggs`` combine the partials
    per keys. Caller names partial outputs so the final stage can
    reference them, e.g.::

        salted_agg(df, ["k"],
                   aggs=[F.sum("part_sum").alias("total")],
                   partial_aggs=[F.sum("x").alias("part_sum")])
    """
    keys = list(keys)
    partial = with_salt(df, n_salts).groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: fact rows get a random salt; every dim row is
    replicated across all salts; the join key becomes (key, salt), so a
    hot key's rows spread over ``n_salts`` tasks instead of one.

    Use when the dim is too large to broadcast and a fact key is hot
    enough to defeat AQE's split (which only splits the probe side of a
    sort-merge join partition).

    ``how`` is restricted to {'inner', 'left', 'left_semi'}: the dim side
    is replicated across all ``n_salts`` salts, so right/full outer joins
    would emit every unmatched dim row once per salt (duplicate
    null-padded rows) — flip the inputs or de-salt manually for those."""
    if how not in ("inner", "left", "left_outer", "left_semi", "semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: the "
            "salt-replicated dim side would duplicate unmatched rows under "
            "right/full outer semantics"
        )
    f = with_salt(fact, n_salts)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")
