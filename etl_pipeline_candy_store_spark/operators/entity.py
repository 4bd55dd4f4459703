"""Entity resolution over structured records (record linkage).

The text dedup family (q50-q55, q169) resolves duplicate DOCUMENTS;
this is the sibling every warehouse runs over dimension tables:
multiple registrations of the same real-world entity (typo'd names,
re-registrations) must resolve to one entity id. The classic three
stages, each already a verified primitive in this engine:

1. **Blocking** — candidate pairs only within (nationkey, name-suffix)
   blocks, never the O(n²) pair space (q169's prefix-blocking
   discipline applied to structured attributes). The block key is
   chosen from fields the corruption model does not touch, so true
   matches never cross blocks; block sizes are bounded by the key's
   cardinality, which is the knob a 100 TB deployment tunes.
2. **Pairwise verify** — ``levenshtein(name_a, name_b) <= 1`` within a
   block (identical builtin in Spark and DuckDB, unit costs).
3. **Entity ids** — connected components over the match pairs
   (q54's operator): a registration with two distance-1 variants that
   sit at distance 2 from EACH OTHER still resolves to one entity
   through transitivity — the reason pairs alone are not an answer.

The synthetic customer names are unique, so the relation unions
deterministic dirty re-registrations built IDENTICALLY in both engines
(the q205 variant convention): every 20th customer re-appears with one
mid-digit corrupted (edit distance 1, reg_id + 1e6), and every 60th
ALSO re-appears with a different digit corrupted (reg_id + 2e6) —
those two variants are distance 2 apart, so the 3-record entity exists
only because components propagate through the parent. Corrupted
positions (12, 13) sit outside the blocking suffix (chars 15-18), so
the corruption model respects the block key.

Reference anchor: the reference has no entity resolution (its customer
join is declared but never implemented — SURVEY §2 J2); this extends
the dedup family to the structured-record domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import connected_components
from etl_pipeline_candy_store_spark.plans.catalog import load, register

_ER_V1_OFFSET = 1_000_000
_ER_V2_OFFSET = 2_000_000
_ER_V1_MOD = 20
_ER_V2_MOD = 60
_ER_MAX_DIST = 1

_ER_REGS_SQL = f"""
regs AS (
  SELECT c_custkey AS reg_id, c_name AS name, c_nationkey AS nk
  FROM customer
  UNION ALL
  SELECT c_custkey + {_ER_V1_OFFSET},
         substr(c_name, 1, 11) || 'Z' || substr(c_name, 13), c_nationkey
  FROM customer WHERE c_custkey % {_ER_V1_MOD} = 0
  UNION ALL
  SELECT c_custkey + {_ER_V2_OFFSET},
         substr(c_name, 1, 12) || 'Q' || substr(c_name, 14), c_nationkey
  FROM customer WHERE c_custkey % {_ER_V2_MOD} = 0
)"""


def registrations(customers: DataFrame) -> DataFrame:
    """The customer table plus its deterministic dirty
    re-registrations: (reg_id, name, nk)."""
    base = customers.select(
        F.col("c_custkey").alias("reg_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    v1 = customers.filter(F.col("c_custkey") % _ER_V1_MOD == 0).select(
        (F.col("c_custkey") + _ER_V1_OFFSET).alias("reg_id"),
        F.concat(
            F.substring("c_name", 1, 11),
            F.lit("Z"),
            F.expr("substring(c_name, 13)"),
        ).alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    v2 = customers.filter(F.col("c_custkey") % _ER_V2_MOD == 0).select(
        (F.col("c_custkey") + _ER_V2_OFFSET).alias("reg_id"),
        F.concat(
            F.substring("c_name", 1, 12),
            F.lit("Q"),
            F.expr("substring(c_name, 14)"),
        ).alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    return base.unionByName(v1).unionByName(v2)


def match_pairs(regs: DataFrame, max_dist: int = _ER_MAX_DIST) -> DataFrame:
    """Blocked pairwise matching: candidates share (nk, name chars
    15-18), verified by edit distance — one block-keyed equi-join,
    never a cross product."""
    blocked = regs.select(
        "reg_id", "name", "nk", F.substring("name", 15, 4).alias("blk")
    )
    a = blocked.select(
        F.col("reg_id").alias("ra"), F.col("name").alias("na"), "nk", "blk"
    )
    b = blocked.select(
        F.col("reg_id").alias("rb"), F.col("name").alias("nb"), "nk", "blk"
    )
    return (
        a.join(b, ["nk", "blk"])
        .filter(F.col("ra") < F.col("rb"))
        .filter(F.levenshtein("na", "nb") <= max_dist)
        .select("ra", "rb")
    )


@register(
    "q213_entity_resolution",
    oracle=f"""
WITH RECURSIVE {_ER_REGS_SQL},
blocked AS (
  SELECT reg_id, name, nk, substr(name, 15, 4) AS blk FROM regs
),
pairs AS (
  SELECT a.reg_id AS ra, b.reg_id AS rb
  FROM blocked a
  JOIN blocked b ON a.nk = b.nk AND a.blk = b.blk AND a.reg_id < b.reg_id
  WHERE levenshtein(a.name, b.name) <= {_ER_MAX_DIST}
),
edges AS (
  SELECT ra AS src, rb AS dst FROM pairs
  UNION
  SELECT rb, ra FROM pairs
),
reach(node, lab) AS (
  SELECT reg_id, reg_id FROM regs
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS reg_id, CAST(MIN(lab) AS BIGINT) AS entity_id
FROM reach GROUP BY node
""",
    doc="Entity resolution over structured records: the customer table "
    "plus deterministic dirty re-registrations (one corrupted digit; "
    "every 60th customer gets TWO variants that are distance 2 from "
    "each other) resolves to per-entity ids via blocking on "
    "(nationkey, name-suffix) -> levenshtein<=1 verify within blocks "
    "-> connected components over match pairs. The 3-record entities "
    "exist only through transitive closure (the two variants never "
    "match each other directly) — pairs alone under-merge. One "
    "block-keyed equi-join builds candidates (never O(n²)); component "
    "label rounds are diameter-bounded (<= 2 here). Singletons "
    "resolve to themselves.",
)
def q213_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    regs = registrations(load(spark, sf_dir, "customer")).localCheckpoint(
        eager=True
    )
    cc = connected_components(match_pairs(regs), "ra", "rb")
    return regs.join(cc, regs["reg_id"] == cc["node"], "left").select(
        F.col("reg_id").cast("long").alias("reg_id"),
        F.coalesce(F.col("label"), F.col("reg_id"))
        .cast("long")
        .alias("entity_id"),
    )


@register(
    "q214_blocking_quality",
    oracle=f"""
WITH {_ER_REGS_SQL},
blocked AS (
  SELECT reg_id, name, nk, substr(name, 15, 4) AS blk FROM regs
),
cand AS (
  SELECT a.reg_id AS ra, b.reg_id AS rb
  FROM blocked a
  JOIN blocked b ON a.nk = b.nk AND a.blk = b.blk AND a.reg_id < b.reg_id
),
truth AS (
  SELECT c_custkey AS ra, c_custkey + {_ER_V1_OFFSET} AS rb
  FROM customer WHERE c_custkey % {_ER_V1_MOD} = 0
  UNION ALL
  SELECT c_custkey, c_custkey + {_ER_V2_OFFSET}
  FROM customer WHERE c_custkey % {_ER_V2_MOD} = 0
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_regs FROM regs),
counts AS (
  SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
      JOIN cand c ON c.ra = t.ra AND c.rb = t.rb) AS n_true_covered,
    n.n_regs
  FROM n
)
SELECT n_regs, n_candidates, n_true, n_true_covered,
       CAST(n_true_covered * 1000000 // n_true AS BIGINT)
         AS pair_completeness_ppm,
       CAST(1000000 - (CAST(n_candidates AS HUGEINT) * 2000000)
            // (CAST(n_regs AS HUGEINT) * (n_regs - 1)) AS BIGINT)
         AS reduction_ratio_ppm
FROM counts
""",
    doc="Blocking-scheme quality report for the q213 resolver — the two "
    "numbers every record-linkage textbook demands before trusting a "
    "blocking key: PAIR COMPLETENESS (fraction of true matches whose "
    "pair survives blocking — the variant construction IS the ground "
    "truth, so this is exact, and 1.0 here because corruption "
    "respects the block key) and REDUCTION RATIO (fraction of the "
    "O(n²) pair space the blocks never generate). Both integer ppm. "
    "One block-keyed candidate count + a broadcast-sized truth join; "
    "at 100 TB this is the cheap pre-flight that says whether the "
    "expensive verify stage gets 10^6 or 10^12 candidates.",
)
def q214_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    regs = registrations(c).localCheckpoint(eager=True)
    blocked = regs.select(
        "reg_id", "nk", F.substring("name", 15, 4).alias("blk")
    )
    cand = (
        blocked.select(F.col("reg_id").alias("ra"), "nk", "blk")
        .join(blocked.select(F.col("reg_id").alias("rb"), "nk", "blk"), ["nk", "blk"])
        .filter(F.col("ra") < F.col("rb"))
        .select("ra", "rb")
    )
    v1 = c.filter(F.col("c_custkey") % _ER_V1_MOD == 0).select(
        F.col("c_custkey").alias("ra"),
        (F.col("c_custkey") + _ER_V1_OFFSET).alias("rb"),
    )
    v2 = c.filter(F.col("c_custkey") % _ER_V2_MOD == 0).select(
        F.col("c_custkey").alias("ra"),
        (F.col("c_custkey") + _ER_V2_OFFSET).alias("rb"),
    )
    truth = v1.unionByName(v2)
    covered = truth.join(cand, ["ra", "rb"], "left_semi")
    stats = (
        regs.agg(F.count(F.lit(1)).cast("long").alias("n_regs"))
        .crossJoin(
            F.broadcast(
                cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
            )
        )
        .crossJoin(
            F.broadcast(truth.agg(F.count(F.lit(1)).cast("long").alias("n_true")))
        )
        .crossJoin(
            F.broadcast(
                covered.agg(
                    F.count(F.lit(1)).cast("long").alias("n_true_covered")
                )
            )
        )
    )
    return stats.select(
        "n_regs",
        "n_candidates",
        "n_true",
        "n_true_covered",
        F.expr("CAST(n_true_covered * 1000000 div n_true AS BIGINT)").alias(
            "pair_completeness_ppm"
        ),
        # DECIMAL(38,0) staging: at the 100 TB pre-flight (~3e9
        # registrations) n_regs*(n_regs-1) and n_candidates*2000000 both
        # blow past int64; Spark's IntegralDivide on decimals stays exact
        # (HUGEINT on the DuckDB side)
        F.expr(
            "CAST(1000000 - (CAST(n_candidates AS DECIMAL(38,0)) * 2000000)"
            " div (CAST(n_regs AS DECIMAL(38,0)) * (n_regs - 1)) AS BIGINT)"
        ).alias("reduction_ratio_ppm"),
    )


@register(
    "q215_resolution_quality",
    oracle=f"""
WITH RECURSIVE {_ER_REGS_SQL},
blocked AS (
  SELECT reg_id, name, nk, substr(name, 15, 4) AS blk FROM regs
),
pairs AS (
  SELECT a.reg_id AS ra, b.reg_id AS rb
  FROM blocked a
  JOIN blocked b ON a.nk = b.nk AND a.blk = b.blk AND a.reg_id < b.reg_id
  WHERE levenshtein(a.name, b.name) <= {_ER_MAX_DIST}
),
edges AS (
  SELECT ra AS src, rb AS dst FROM pairs
  UNION
  SELECT rb, ra FROM pairs
),
reach(node, lab) AS (
  SELECT reg_id, reg_id FROM regs
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
),
resolved AS MATERIALIZED (
  SELECT node AS reg_id, CAST(MIN(lab) AS BIGINT) AS entity_id
  FROM reach GROUP BY node
),
implied AS MATERIALIZED (
  SELECT a.reg_id AS ra, b.reg_id AS rb
  FROM resolved a JOIN resolved b
    ON a.entity_id = b.entity_id AND a.reg_id < b.reg_id
),
truth AS MATERIALIZED (
  SELECT c_custkey AS ra, c_custkey + {_ER_V1_OFFSET} AS rb
  FROM customer WHERE c_custkey % {_ER_V1_MOD} = 0
  UNION ALL
  SELECT c_custkey, c_custkey + {_ER_V2_OFFSET}
  FROM customer WHERE c_custkey % {_ER_V2_MOD} = 0
  UNION ALL
  SELECT c_custkey + {_ER_V1_OFFSET}, c_custkey + {_ER_V2_OFFSET}
  FROM customer WHERE c_custkey % {_ER_V2_MOD} = 0
),
counts AS (
  SELECT
    (SELECT CAST(COUNT(DISTINCT entity_id) AS BIGINT) FROM resolved)
      AS n_entities,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM implied) AS n_implied_pairs,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true_pairs,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
      JOIN implied i ON i.ra = t.ra AND i.rb = t.rb) AS n_hit
)
SELECT n_entities, n_implied_pairs, n_true_pairs, n_hit,
       CAST(n_hit * 1000000 // n_implied_pairs AS BIGINT)
         AS pair_precision_ppm,
       CAST(n_hit * 1000000 // n_true_pairs AS BIGINT) AS pair_recall_ppm
FROM counts
""",
    doc="Resolution-quality audit for the q213 resolver — pairwise "
    "precision/recall at the ENTITY level, the standard ER evaluation "
    "(q214 audits the blocking stage; this audits the end result). "
    "Implied pairs = all same-entity registration pairs AFTER closure; "
    "truth = all same-TRUE-entity pairs, INCLUDING the variant-variant "
    "pairs that no direct match produces — so recall measures exactly "
    "what transitive closure buys, and precision exposes any distance-1 "
    "block collisions the resolver over-merges. Integer ppm. Implied "
    "pairs are one entity-keyed self-join whose fan-out is bounded by "
    "entity size (<= 3 here; a real deployment caps or samples "
    "mega-entities first — the q135 skew-probe discipline).",
)
def q215_resolution_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    resolved = q213_entity_resolution(spark, sf_dir).localCheckpoint(
        eager=True
    )
    a = resolved.select(F.col("reg_id").alias("ra"), "entity_id")
    b = resolved.select(F.col("reg_id").alias("rb"), "entity_id")
    implied = a.join(b, "entity_id").filter(F.col("ra") < F.col("rb")).select(
        "ra", "rb"
    )
    v1 = c.filter(F.col("c_custkey") % _ER_V1_MOD == 0).select(
        F.col("c_custkey").alias("ra"),
        (F.col("c_custkey") + _ER_V1_OFFSET).alias("rb"),
    )
    v2 = c.filter(F.col("c_custkey") % _ER_V2_MOD == 0).select(
        F.col("c_custkey").alias("ra"),
        (F.col("c_custkey") + _ER_V2_OFFSET).alias("rb"),
    )
    vv = c.filter(F.col("c_custkey") % _ER_V2_MOD == 0).select(
        (F.col("c_custkey") + _ER_V1_OFFSET).alias("ra"),
        (F.col("c_custkey") + _ER_V2_OFFSET).alias("rb"),
    )
    truth = v1.unionByName(v2).unionByName(vv).localCheckpoint(eager=True)
    hit = truth.join(implied, ["ra", "rb"], "left_semi")
    return (
        resolved.agg(
            F.countDistinct("entity_id").cast("long").alias("n_entities")
        )
        .crossJoin(
            F.broadcast(
                implied.agg(
                    F.count(F.lit(1)).cast("long").alias("n_implied_pairs")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                truth.agg(F.count(F.lit(1)).cast("long").alias("n_true_pairs"))
            )
        )
        .crossJoin(
            F.broadcast(hit.agg(F.count(F.lit(1)).cast("long").alias("n_hit")))
        )
        .select(
            "n_entities",
            "n_implied_pairs",
            "n_true_pairs",
            "n_hit",
            F.expr(
                "CAST(n_hit * 1000000 div n_implied_pairs AS BIGINT)"
            ).alias("pair_precision_ppm"),
            F.expr("CAST(n_hit * 1000000 div n_true_pairs AS BIGINT)").alias(
                "pair_recall_ppm"
            ),
        )
    )
