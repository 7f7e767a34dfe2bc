"""Dense-id dictionaries over tiny key domains, without WindowExec.

The natural spelling — ``row_number().over(Window.orderBy(key))`` on the
distinct keys — plans an unpartitioned WindowExec, which (a) serializes
onto one partition and (b) spams the "No Partition Defined" warning into
every bench log, hiding real single-partition regressions. For a BOUNDED
key domain (class names, langs, labels: ≤ tens of values) the idiomatic
warning-free form is a global aggregate: collect the distinct keys into
one sorted array (map-side partials, one tiny final group) and
posexplode it back to (id, key) rows. Same dense-rank semantics as the
reference's ``dict(zip(sorted(class_names), range(...)))``
(make_tf_record.py:151); do NOT use for unbounded domains — the array
lives in one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_id_dict(df: DataFrame, key: str, id_name: str) -> DataFrame:
    """Distinct values of ``df[key]`` -> (key, ``id_name``) with ids
    0..n-1 assigned in sorted-key order. ``id_name`` is an INT column
    (cast at the call site if a wider type is declared)."""
    return (
        df.agg(F.sort_array(F.collect_set(key)).alias("_keys"))
        .select(F.posexplode("_keys").alias(id_name, key))
        .select(key, id_name)
    )
