"""Input-size guards for labeled quadratic baselines.

Two catalog queries are deliberate O(n²) recall baselines (q61
all-pairs embedding cosine, q96 unblocked sparse cosine). They exist so
the bounded production paths (q64/q65 LSH-IVF, q98 rare-token blocking)
have an exact reference to measure recall against — but an unguarded
quadratic operator in a 100 TB engine is a foot-gun: someone points it
at a real corpus and it runs for a week. The guard makes the failure
mode a loud, immediate error naming the scale path instead.

The cap is enforced with one cheap count over the already-pruned input
relation (ids only; at baseline-legal sizes this is milliseconds, and
at illegal sizes it is the cost of discovering the job must not run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Above this, an all-pairs plan is >1.25e9 candidate pairs — not a
# baseline any more. The bounded variants handle every larger input.
ALL_PAIRS_MAX_ROWS = 50_000


class AllPairsGuardError(ValueError):
    """Raised when a quadratic recall baseline is given production-scale
    input. Carries the bounded alternative's query name."""


def guard_all_pairs(df: DataFrame, what: str, alternative: str) -> None:
    """Raise unless ``df`` is small enough for an all-pairs baseline."""
    n = df.count()
    if n > ALL_PAIRS_MAX_ROWS:
        raise AllPairsGuardError(
            f"{what}: {n} input rows exceeds the all-pairs baseline cap of "
            f"{ALL_PAIRS_MAX_ROWS}. This query is a recall baseline, not a "
            f"scale path — use {alternative} for production-size inputs."
        )
