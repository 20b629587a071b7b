"""Skew-mitigation helpers — the salting pattern for hot keys.

AQE's skew-join/partition splitting handles most skew automatically
(enabled in the session factory). Salting is the manual lever for
aggregations where ONE key dominates (the classic 100 TB failure:
one user/null-key holds 10% of all rows, one reducer runs for hours).

``salted_agg_sum`` demonstrates the two-phase shape:
  1. group by (key, hash(row)%buckets) — the hot key's rows spread
     over `buckets` reducers, each producing a partial sum;
  2. group by key — merge the ≤`buckets` partials.
Associative aggregates (sum/count/min/max) compose exactly; results
are identical to the direct groupBy (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    buckets: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase salted ``sum(value) group by keys`` with identical
    results to the direct aggregation.

    ``salt_on`` controls only which partial-reducer a row lands on —
    any expression works without affecting results (the merge phase is
    associative). The default is a per-row id rather than a hash of
    the data: hashing a data column degenerates to ONE bucket exactly
    when the hot key's values are constant or NULL — the very case
    salting exists for.
    """
    salt = (
        F.pmod(
            F.xxhash64(salt_on) if salt_on is not None
            else F.monotonically_increasing_id(),
            buckets,
        )
    ).alias("_salt")
    partial = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(value_col).alias("_psum"),
            F.count("*").alias("_pcnt"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_psum").alias(f"sum_{value_col}"),
        F.sum("_pcnt").alias("cnt"),
    )
