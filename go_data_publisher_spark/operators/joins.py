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
    discriminator: str | None = None,
) -> DataFrame:
    """Equi-join a skewed big side to a small side without a hot reducer.

    The big side gets a pseudo-random salt in [0, n_salts); the small side is
    replicated n_salts times (explode over the salt range).  The join key
    becomes (on, salt), so a hot key's rows spread over ``n_salts`` reducers
    instead of one.  Result is row-identical to ``big.join(small, on, how)``
    for inner/left joins.

    Shuffle math: big side shuffles once (same as unsalted); small side
    shuffles n_salts× its (small) size — the classic trade.

    LIMITATION of the default content-hash salt: rows with identical content
    all hash to ONE salt, so a skew caused by exact-duplicate rows is not
    spread.  When the big side has (or may have) duplicate rows, pass a
    ``discriminator`` column that varies across those duplicates — a STORED
    stable column only (an offset, an lsn, a source-assigned row id), never
    one computed at runtime like ``monotonically_increasing_id()``, whose
    values change when map tasks are recomputed and would reintroduce the
    exact zero-or-twice corruption the deterministic salt prevents.  It is
    mixed into the salt hash, restoring the spread while keeping the salt
    deterministic under task retry.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side must be replicable)")
    # any uniform salt assignment is valid (the join result is independent of
    # which salt a row gets), but it must be DETERMINISTIC under recomputation:
    # a stage retry that re-runs map tasks must assign the same salt to the
    # same row, or reducers consuming mixed old/new map output see rows zero
    # or two times.  Hash the full row content — NOT F.rand(), whose
    # per-partition stream changes when map output is recomputed.
    salt_cols = [F.col(discriminator)] if discriminator is not None \
        else [F.col(c) for c in big.columns]
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int"),
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


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols,
    ts_col: str,
    dim_cols,
    strict: bool = False,
) -> DataFrame:
    """As-of (temporal) join: each fact row gets the dim row with the
    greatest ``dim.ts_col`` <= ``fact.ts_col`` per key (the enrichment join
    streams/CDC pipelines need; Spark has no native ASOF JOIN).

    Physical shape — union-tag + one partitioned window, NOT a range join:
    dim and fact rows are unioned with a tag, sorted per key by
    (ts, tag) so a dim row at time t precedes facts at the same t (``strict``
    flips the tiebreak to dim-after-fact, i.e. a strict ``<``), and the dim
    attributes are carried forward with ``last(ignorenulls)`` over the
    preceding-rows frame.  Dim attributes ride in ONE struct so every output
    column comes from the SAME dim row (per-column fills could mix rows when
    some dim attributes are null).  One shuffle on the key, scales with key
    cardinality; facts with no preceding dim row get nulls (left semantics).
    """
    from pyspark.sql import Window

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    dim_cols = [dim_cols] if isinstance(dim_cols, str) else list(dim_cols)
    fact_cols = facts.columns

    # SQL join semantics: a NULL key never matches — but partitionBy groups
    # nulls together, so null-keyed dim rows must not enter the window (a
    # null-keyed fact then sits in a dim-less partition and gets nulls).
    # Likewise a NULL dim timestamp can never satisfy dim.ts <= fact.ts, yet
    # ASC ordering puts nulls FIRST, where last(ignorenulls) would carry the
    # row into every early fact — drop those too.
    for kc in key_cols:
        dim = dim.where(F.col(kc).isNotNull())
    dim = dim.where(F.col(ts_col).isNotNull())

    d = dim.select(
        *key_cols,
        F.col(ts_col),
        F.struct(*[F.col(c) for c in dim_cols]).alias("__dim"),
        F.lit(0 if not strict else 1).alias("__tag"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(f"__f_{c}")
          for c in fact_cols if c not in key_cols and c != ts_col],
    )
    f = facts.select(
        *key_cols,
        F.col(ts_col),
        F.lit(None).cast(d.schema["__dim"].dataType).alias("__dim"),
        F.lit(1 if not strict else 0).alias("__tag"),
        *[F.col(c).alias(f"__f_{c}")
          for c in fact_cols if c not in key_cols and c != ts_col],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fact_tag = 1 if not strict else 0
    filled = (
        d.unionByName(f)
        .withColumn("__dim_asof", F.last("__dim", ignorenulls=True).over(w))
        .where(F.col("__tag") == fact_tag)
    )
    out_cols = [F.col(c) for c in key_cols] + [F.col(ts_col)]
    out_cols += [F.col(f"__f_{c}").alias(c)
                 for c in fact_cols if c not in key_cols and c != ts_col]
    out_cols += [F.col("__dim_asof")[c].alias(c) for c in dim_cols]
    return filled.select(*out_cols)
