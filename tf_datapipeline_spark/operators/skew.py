"""Skew mitigation: salted joins.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; salting is the explicit, planner-independent form for the
pathological case — one join key holding a double-digit percentage of a
100 TB fact table, where a single reducer would otherwise own the whole
hot key. The fact side gets a deterministic salt in [0, n); the dim side
is replicated n times (dims are small — that's why they're dims); the
join key becomes (key, salt), spreading the hot key over n reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on `key`, salted n_salts ways.

    salt_source: any fact-side column expression with per-row variety
    (defaults to a hash of the whole row via monotonically varying
    xxhash64 of the key + a uniform spread column). The salt must NOT be
    derived from the join key alone on the dim side — the dim is
    replicated across ALL salts so every fact row finds its match.
    """
    if salt_source is None:
        salt_source = F.xxhash64(*fact.columns)
    salted_fact = fact.withColumn("_salt", F.pmod(salt_source, F.lit(n_salts)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")
