"""Skew-aware joins (SURVEY.md §2.7 — the reference has no general join
operator; these are the join primitives our engine adds, with the
north_rule's explicit salted repartition for hot-conversation skew).

AQE's skew-join handles most cases automatically (enabled in session.py);
`salted_join` is the explicit form for when the skew is known a priori
(e.g. joining the change stream to a per-conversation dimension where 1% of
conv_ids carry 50% of rows) or when AQE is unavailable (streaming
microbatches disable AQE re-planning in some Spark versions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big side to a small side without a hot reducer.

    The big side gets a pseudo-random salt in [0, n_salts); the small side is
    replicated n_salts times (explode over the salt range).  The join key
    becomes (on, salt), so a hot key's rows spread over ``n_salts`` reducers
    instead of one.  Result is row-identical to ``big.join(small, on, how)``
    for inner/left joins.

    Shuffle math: big side shuffles once (same as unsalted); small side
    shuffles n_salts× its (small) size — the classic trade.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side must be replicable)")
    # any uniform salt assignment is valid (the join result is independent of
    # which salt a row gets); a cheap id-based spread avoids hashing payloads
    salted_big = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(replicated_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "left") -> DataFrame:
    """Standard small-dimension join: force broadcast so the fact side never
    shuffles (the merge's survivor path uses the same shape)."""
    return fact.join(F.broadcast(dim), on=on, how=how)
