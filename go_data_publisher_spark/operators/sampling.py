"""Deterministic sampling / mixture curation for training-data pipelines.

Curating a 100 TB corpus needs *reproducible* subsetting: the same row set
must come back on every run, on any cluster layout, after any repartition —
so `df.sample()` (seeded per-partition RNG, layout-dependent) is the wrong
tool.  Both operators key off a content hash of a stable id instead:

- `deterministic_sample`: keep a row iff the hex md5 of its id falls below
  the fraction threshold.  Pure map-side filter — no shuffle, pushes through
  any plan.  Same-salt samples NEST rather than multiply: the thresholds
  compose as min(), so a 10% sample of a 50% sample is exactly the 10%
  sample (a strict subset of the 50% — useful for consistent down-scaling).
  For independent samples that compose multiplicatively, use distinct salts.
- `quota_per_group`: at most N rows per group (per lang/source mixture
  caps), picked in hash order so the winners are stable.  One partitioned
  window — shuffle on the group key only; skewed groups cost one task, which
  is exactly the per-group cap's working set.

md5 (not xxhash64) so the very same predicate runs in any engine —
the DuckDB oracles in __spark_entry__.py execute it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_hex(col, salt: str = ""):
    """Lowercase hex md5 of the stringified id (+ optional salt) — identical
    bytes in Spark and DuckDB, so lexicographic comparison is portable."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.concat(c.cast("string"), F.lit(salt)) if salt else c.cast("string")
    return F.md5(s)


def deterministic_sample(df: DataFrame, fraction: float, key_col: str,
                         salt: str = "") -> DataFrame:
    """Stable ~``fraction`` sample keyed on ``key_col``.

    The first 8 hex chars of md5(key) are uniform over [0, 16^8); a row is
    kept iff they compare below floor(fraction·16^8) rendered as zero-padded
    hex.  ``salt`` decorrelates independent samples over the same keys.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold_int = int(fraction * (1 << 32))
    if threshold_int >= (1 << 32):
        # fraction == 1.0 would render a 9-char threshold ("100000000") that
        # breaks the 8-char lexicographic comparison — keep-everything is free
        return df
    threshold = format(threshold_int, "08x")
    return df.where(F.substring(_hash_hex(key_col, salt), 1, 8) < F.lit(threshold))


def quota_per_group(df: DataFrame, group_cols, quota: int, key_col: str,
                    salt: str = "") -> DataFrame:
    """At most ``quota`` rows per group, selected in md5(key) order.

    The mixture-balancing primitive: cap over-represented sources/languages
    while keeping the selection reproducible.  md5 per-key is collision-free
    for practical id spaces, so the ordering has no ties and the result is
    a deterministic set.
    """
    if quota < 0:
        raise ValueError("quota must be >= 0")
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(_hash_hex(key_col, salt))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )
