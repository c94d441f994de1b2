"""Sequencing / range / watermark operators — SURVEY.md §2.4 (Q1-Q9).

The reference navigates an append-only log by a persisted cursor plus a list
of processed [from,to] intervals per epoch; these are the DataFrame forms of
that vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def next_range(df: DataFrame, lsn_col: str, cursor: int, head: int | None = None) -> DataFrame:
    """Q1+Q2: the unprocessed slice (cursor, head] of the log.

    Reference: calculateTickRange skips gaps and clamps to the source
    watermark (transactions-producer/domain/processor.go:194-210,
    tick-data-publisher/sync/tick_data_processor.go:99).  The between-filter
    pushes down to the parquet/lake scan (min/max row-group pruning), so at
    100 TB this reads only the tail files.
    """
    out = df.where(F.col(lsn_col) > cursor)
    if head is not None:
        out = out.where(F.col(lsn_col) <= head)
    return out


def unprocessed_suffix(df: DataFrame, epoch_col: str, cursor_epoch: int) -> DataFrame:
    """Q5/F6: only groups strictly after the cursor (closed epochs only)."""
    return df.where(F.col(epoch_col) > cursor_epoch)


def epoch_for_lsn(events: DataFrame, intervals: DataFrame, lsn_col="lsn",
                  lo_col="from_lsn", hi_col="to_lsn") -> DataFrame:
    """Q3: range-containment lookup of each event's epoch.

    The intervals dimension is tiny (one row per epoch) → broadcast, so the
    range join is a broadcast-nested-loop that never shuffles the event side.
    """
    return events.join(
        F.broadcast(intervals),
        (events[lsn_col] >= intervals[lo_col]) & (events[lsn_col] <= intervals[hi_col]),
        "left",
    )


def range_join_chunked(events: DataFrame, intervals: DataFrame, lsn_col="lsn",
                       lo_col="from_lsn", hi_col="to_lsn", chunk: int = 1 << 16,
                       how: str = "inner") -> DataFrame:
    """Q3 at web scale: range-containment join WITHOUT broadcasting.

    `epoch_for_lsn` broadcasts the interval side — right for the reference's
    one-row-per-epoch dimension, wrong once intervals grow with key
    cardinality (per-user/per-conversation ranges): a broadcast nested-loop
    over a large build side is O(events × intervals) per task and the
    broadcast itself stops fitting.  Here both sides map into coarse chunks
    of the sequence space — an interval [lo, hi] explodes to the
    ``span/chunk + 1`` chunk ids it overlaps, an event maps to exactly one —
    and the join becomes a plain shuffled equi-join on chunk id plus the
    exact containment filter.  Partition-parallel, no broadcast, no nested
    loop; per-interval fan-out is bounded by ``span/chunk + 1``, so pick
    ``chunk`` near the typical interval span.

    ``how``: "inner" or "left".  Left semantics survive the chunk mapping
    because only the *interval* side is exploded — an event carries a single
    chunk id, so an event matching no interval yields exactly one
    null-extended row.

    Reference parity: same containment semantics as epoch_for_lsn
    (status-service epoch lookup); the chunking is the standard
    bin/overlap-range-join decomposition Spark lacks natively.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")

    def _chunk_of(col):
        return F.floor(col / F.lit(int(chunk))).cast("long")

    iv = (
        intervals.where(F.col(lo_col) <= F.col(hi_col))
        .withColumn(
            "__i_chunk",
            F.explode(F.sequence(_chunk_of(F.col(lo_col)), _chunk_of(F.col(hi_col)))),
        )
    )
    ev = events.withColumn("__e_chunk", _chunk_of(F.col(lsn_col)))
    cond = (
        (ev["__e_chunk"] == iv["__i_chunk"])
        & (ev[lsn_col] >= iv[lo_col])
        & (ev[lsn_col] <= iv[hi_col])
    )
    return ev.join(iv, cond, how).drop("__e_chunk", "__i_chunk")


def interval_contain_count_sorted(events: DataFrame, intervals: DataFrame,
                                  lsn_col: str = "lsn",
                                  lo_col: str = "from_lsn",
                                  hi_col: str = "to_lsn") -> DataFrame:
    """Q3's per-event containment COUNT for the BROADCAST regime — sorted
    boundary arrays + vectorized binary search, zero pair enumeration.

    `epoch_for_lsn` broadcasts the interval side and nested-loops every
    (event, interval) pair — O(events × intervals) comparisons even when the
    caller only wants the count (bench r6: ~145M pair evaluations at sf0.1).
    The count needs none of those pairs: with interval lower bounds and
    upper bounds each in a sorted array,

        n_containing(e) = #{lo <= e} − #{hi < e}

    which is two binary searches per event — O(events · log intervals).
    The interval side is materialized on the driver exactly like
    ``F.broadcast(intervals)`` would be (same memory class, same
    applicability condition: the intervals fit one machine), sorted once
    with numpy, and shipped to executors in the UDF closure; events flow
    through one Arrow-vectorized ``searchsorted`` per batch (guide §4.2 —
    whole batches to native code).  Beyond broadcast scale use
    `range_count_chunked` (shuffled, no driver residency) or
    `interval_stab_count` (distributed sweep).

    Malformed intervals (null bounds, lo > hi) contain nothing and are
    dropped before sorting — the subtraction identity requires lo <= hi.
    NULL event positions satisfy no BETWEEN predicate and get count 0.
    Returns the event rows plus ``n_containing`` (0 when uncontained, like
    `interval_stab_count` — filter > 0 for inner-join semantics).

    Snapshot semantics caveat: the interval side is collected EAGERLY at
    call time (one Spark job during composition) and frozen into the UDF
    closure — re-executing the returned DataFrame after the intervals
    source changed keeps the OLD boundaries, where a re-executed broadcast
    join would re-read.  Compose-and-run pipelines (the contract queries,
    the bench) rebuild the frame per run; long-lived handles over mutable
    sources should use `range_count_chunked` or `interval_stab_count`.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rows = (
        intervals.where(
            F.col(lo_col).isNotNull() & F.col(hi_col).isNotNull()
            & (F.col(lo_col) <= F.col(hi_col)))
        .select(F.col(lo_col).cast("long"), F.col(hi_col).cast("long"))
        .collect()
    )
    los = np.sort(np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows)))
    his = np.sort(np.fromiter((r[1] for r in rows), dtype=np.int64, count=len(rows)))

    @pandas_udf("long")
    def _n_containing(e):
        mask = e.notna().to_numpy()
        x = e[mask].to_numpy(dtype=np.int64)
        out = np.zeros(len(e), dtype=np.int64)
        out[mask] = (np.searchsorted(los, x, side="right")
                     - np.searchsorted(his, x, side="left"))
        return pd.Series(out)

    # asNondeterministic (guide §4.4): a caller filtering on the returned
    # column (`where n_containing > 0`) otherwise gets the pushed-down
    # filter AND the projection each evaluating the UDF — two
    # ArrowEvalPython nodes and double the Arrow round trips (observed in
    # the r7 before/after plans).  The function IS deterministic; the flag
    # only stops the optimizer duplicating it.
    _n_containing = _n_containing.asNondeterministic()

    return events.withColumn(
        "n_containing", _n_containing(F.col(lsn_col).cast("long")))


def range_count_chunked(events: DataFrame, intervals: DataFrame,
                        lsn_col: str = "lsn", lo_col: str = "from_lsn",
                        hi_col: str = "to_lsn", chunk: int = 1 << 16) -> DataFrame:
    """Q3's per-event containment COUNT as a chunked shuffled equi-join —
    `range_join_chunked`'s plan family (no broadcast, no driver residency)
    with the O(pairs) term removed for the count aggregate.

    `range_join_chunked` + groupBy enumerates every matching pair, which on
    dense-overlap data (intervals spanning most of the log) approaches
    events × intervals no matter how the join is planned — the superlinear
    sf1 finding of r6.  For the COUNT, pairs with intervals that FULLY cover
    an event's chunk are redundant: every event in chunk c is contained, so
    one count per (chunk, full-cover) suffices.  Decomposition:

      1. explode intervals to overlapped chunk ids (as range_join_chunked);
      2. intervals fully covering a chunk (lo <= c·chunk and
         hi >= (c+1)·chunk − 1) reduce to one ``n_full`` count per chunk —
         O(intervals · span/chunk) rows, no event involvement;
      3. only BOUNDARY overlaps (≤ 2 chunks per interval) equi-join events
         on chunk id with the exact containment filter — O(boundary pairs),
         bounded by 2 · intervals · events-per-chunk;
      4. per event value: n_containing = n_full(chunk) + n_boundary(event).

    Events are pre-grouped by position (``n_events`` per distinct value), so
    callers needing join-multiplicity semantics multiply by ``n_events``.
    Returns one row per distinct non-null event position:
    (lsn_col, n_events, n_containing), n_containing possibly 0.
    """
    chunk = int(chunk)
    if chunk & (chunk - 1) == 0:
        # power-of-two chunk: arithmetic right shift is an EXACT 64-bit
        # floor division — the double-precision floor(col/chunk) mis-chunks
        # positions above 2^53, and unlike the join-shaped operator (whose
        # exact BETWEEN filter merely drops a mis-chunked pair) the
        # full-cover counts here have no per-event re-check, so a
        # mis-chunked event would OVERCOUNT (r7 review finding)
        shift = chunk.bit_length() - 1

        def _chunk_of(col):
            return F.shiftright(col.cast("long"), shift).cast("long")
    else:
        # non-power-of-two chunks share range_join_chunked's double-floor
        # domain: exact for |position| < 2^53 (every reference LSN space)
        def _chunk_of(col):
            return F.floor(col / F.lit(chunk)).cast("long")

    ev_vals = (
        events.where(F.col(lsn_col).isNotNull())
        .groupBy(F.col(lsn_col).cast("long").alias(lsn_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("__c", _chunk_of(F.col(lsn_col)))
    )
    iv = intervals.where(
        F.col(lo_col).isNotNull() & F.col(hi_col).isNotNull()
        & (F.col(lo_col) <= F.col(hi_col)))
    ivc = iv.select(
        F.col(lo_col).cast("long").alias("__lo"),
        F.col(hi_col).cast("long").alias("__hi"),
    ).withColumn(
        "__c", F.explode(F.sequence(_chunk_of(F.col("__lo")),
                                    _chunk_of(F.col("__hi")))),
    )
    full = (F.col("__lo") <= F.col("__c") * chunk) & \
           (F.col("__hi") >= (F.col("__c") + 1) * chunk - 1)
    full_counts = (ivc.where(full).groupBy("__c")
                   .agg(F.count(F.lit(1)).alias("__n_full")))
    partial = ivc.where(~full).select(
        F.col("__c").alias("__pc"), "__lo", "__hi")
    boundary_counts = (
        ev_vals.join(
            partial,
            (F.col("__c") == F.col("__pc"))
            & (F.col(lsn_col) >= F.col("__lo"))
            & (F.col(lsn_col) <= F.col("__hi")),
        )
        .groupBy(lsn_col)
        .agg(F.count(F.lit(1)).alias("__n_boundary"))
    )
    return (
        ev_vals.join(full_counts, on="__c", how="left")
        .join(boundary_counts, on=lsn_col, how="left")
        .select(
            lsn_col,
            "n_events",
            (F.coalesce(F.col("__n_full"), F.lit(0))
             + F.coalesce(F.col("__n_boundary"), F.lit(0)))
            .cast("long").alias("n_containing"),
        )
    )


def interval_stab_count(events: DataFrame, intervals: DataFrame,
                        lsn_col: str = "lsn", lo_col: str = "from_lsn",
                        hi_col: str = "to_lsn", n_parts: int = 256) -> DataFrame:
    """Q3 for the dense-overlap regime: per-event COUNT of containing
    intervals WITHOUT enumerating (event, interval) pairs.

    Any pair-enumerating range join — the broadcast nested loop
    (`epoch_for_lsn`) or the chunked equi-join (`range_join_chunked`) —
    costs O(matching pairs).  When intervals are long relative to the
    sequence space (every interval overlaps most events, e.g. per-user
    lifetime ranges), pairs approach events × intervals and the join is
    quadratic NO MATTER how it is planned; bench.py's sf1 gate measured
    exactly that (r6).  For count-style aggregates the pairs are never
    needed: sweep the boundary step function instead.

    Shape — one range shuffle over events + 2·intervals rows, O(n_parts)
    serial stitch, zero pair enumeration:
      1. each interval becomes two boundary rows: (lo, +1) and (hi+1, −1);
         events ride along with delta 0, boundaries sorting BEFORE events
         at equal position (an interval starting at p contains an event at
         p; one ending at p−1 does not);
      2. range-bucket all rows into ``n_parts`` contiguous slices of the
         sequence space (min/max from a 1-row broadcast aggregate) and
         running-sum the deltas within each slice — fully parallel;
      3. per-slice delta totals (≤ n_parts rows) prefix-sum on the driver
         side of a broadcast — each slice's offset — and every event's
         count is its slice-local running sum plus the slice offset.

    Returns the event rows (original columns) plus ``n_containing``;
    events contained by no interval carry 0 (filter > 0 for inner-join
    semantics).  Output is identical to the aggregate over either join
    twin; only the cost model differs.
    """
    iv = intervals.where(
        F.col(lo_col).isNotNull() & F.col(hi_col).isNotNull()
        & (F.col(lo_col) <= F.col(hi_col))
    )
    bnd = iv.select(
        F.explode(F.array(
            F.struct(F.col(lo_col).cast("long").alias("__pos"),
                     F.lit(1).alias("__delta")),
            F.struct((F.col(hi_col).cast("long") + 1).alias("__pos"),
                     F.lit(-1).alias("__delta")),
        )).alias("__b")
    ).select(
        F.col("__b.__pos").alias("__pos"),
        F.col("__b.__delta").alias("__delta"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(
            T.StructType([T.StructField(c, events.schema[c].dataType, True)
                          for c in events.columns])
        ).alias("__ev"),
    )
    ev = events.select(
        F.col(lsn_col).cast("long").alias("__pos"),
        F.lit(0).alias("__delta"),
        F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in events.columns]).alias("__ev"),
    )
    rows = bnd.unionByName(ev)
    bounds = rows.agg(F.min("__pos").alias("__mn"), F.max("__pos").alias("__mx"))
    width = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.col("__mx") - F.col("__mn") + 1) / F.lit(n_parts)).cast("long"),
    )
    parted = (
        rows.crossJoin(F.broadcast(bounds))
        .withColumn("__part", F.floor((F.col("__pos") - F.col("__mn")) / width)
                    .cast("long"))
        .drop("__mn", "__mx")
    )
    w_in = (
        Window.partitionBy("__part")
        .orderBy(F.col("__pos").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parted.withColumn("__local", F.sum("__delta").over(w_in))
    # per-slice totals: ≤ n_parts rows — the single-partition window here is
    # O(n_parts), not O(rows) (same stitch as verify_monotonic).  Aggregated
    # from `local` (not `parted`) so the offsets subtree shares the
    # running-sum branch's exchange (ReusedExchange) instead of re-scanning
    # events + intervals a second time.
    w_parts = (
        Window.orderBy("__part")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("__part").agg(F.sum("__delta").alias("__psum"))
        .withColumn("__offset", F.coalesce(F.sum("__psum").over(w_parts), F.lit(0)))
        .select("__part", "__offset")
    )
    # left + coalesce: an event with a NULL position (null lsn) sits in the
    # null slice, matches no interval by SQL semantics, and must surface
    # with n_containing = 0 — a null join key never matches, so an inner
    # join would silently drop the row instead
    out = (
        local.join(F.broadcast(offsets), "__part", "left")
        .where(F.col("__tag") == 1)
        .select(
            *[F.col("__ev")[c].alias(c) for c in events.columns],
            (F.col("__local") + F.coalesce(F.col("__offset"), F.lit(0)))
            .cast("long").alias("n_containing"),
        )
    )
    return out


def verify_monotonic(intervals: DataFrame, seq_col: str, attr_cols=("epoch", "from_lsn"),
                     strict: bool = True, n_parts: int = 256) -> DataFrame:
    """Q6: count rows where the attribute tuple regresses in ``seq_col``
    order (must be 0).  ``strict=True`` requires strictly ascending tuples
    (violation when cur <= prev); ``strict=False`` allows ties (violation
    only when cur < prev).

    Reference: tick-intervals-publisher asserts intervals ascending by
    (epoch, from) (processing/tick_interval_processor.go:167-179).  A
    DataFrame has no inherent order, so the position in the original list is
    an explicit sequence column.

    Scale shape — NO global window (a `Window.orderBy(seq)` with no
    partition funnels the whole table through one task):
      1. range-bucket rows into ``n_parts`` contiguous seq slices
         (min/max from a 1-row broadcast aggregate);
      2. count violations *within* each slice with a window partitioned by
         slice — fully parallel;
      3. stitch slice boundaries with a per-slice summary (first/last tuple
         via min_by/max_by — one row per slice) and a window over those
         ≤ n_parts rows.  The serial stage is O(n_parts), independent of
         table size — the boundary stitch of a parallel prefix scan.
    Degenerate inputs (all rows share one seq value) collapse to one slice;
    sequence columns are unique in every reference analogue.
    """
    cur = F.struct(*[F.col(c) for c in attr_cols])

    def viol(cur_c, prev_c):
        cmp = (cur_c <= prev_c) if strict else (cur_c < prev_c)
        return prev_c.isNotNull() & cmp

    bounds = intervals.agg(F.min(seq_col).alias("__mn"), F.max(seq_col).alias("__mx"))
    width = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.col("__mx") - F.col("__mn") + 1) / F.lit(n_parts)).cast("long"),
    )
    df = (
        intervals.crossJoin(F.broadcast(bounds))
        .withColumn("__part", F.floor((F.col(seq_col) - F.col("__mn")) / width).cast("long"))
    )
    w_in = Window.partitionBy("__part").orderBy(F.col(seq_col))
    enriched = df.select(
        "__part",
        F.col(seq_col).alias("__seq"),
        cur.alias("__cur"),
        F.lag(cur).over(w_in).alias("__prev"),
    )
    per_part = enriched.groupBy("__part").agg(
        F.sum(F.when(viol(F.col("__cur"), F.col("__prev")), 1).otherwise(0)).alias("__n_inner"),
        F.min_by("__cur", "__seq").alias("__first"),
        F.max_by("__cur", "__seq").alias("__last"),
    )
    # boundary stitch: ≤ n_parts rows — the single-partition window here is
    # O(n_parts), not O(rows)
    w_parts = Window.orderBy("__part")
    stitched = per_part.select(
        "__n_inner",
        F.when(
            viol(F.col("__first"), F.lag("__last").over(w_parts)), 1
        ).otherwise(0).alias("__n_boundary"),
    )
    return stitched.agg(
        F.coalesce(F.sum(F.col("__n_inner") + F.col("__n_boundary")), F.lit(0))
        .cast("long").alias("n_violations")
    )


def detect_gaps(df: DataFrame, key_cols, lsn_col: str, min_gap: int = 1) -> DataFrame:
    """Q7: holes in the sequence space — [prev+1, cur-1] per gap.

    Reference: calculateSkippedTicks (status-service/rpc/status_service.go:
    218-231).  Partitioned window → scales with the number of keys.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(lsn_col))
    prev = F.lag(lsn_col).over(w)
    return (
        df.select(*key_cols, F.col(lsn_col))
        .withColumn("__prev", prev)
        .where(F.col("__prev").isNotNull() & (F.col(lsn_col) - F.col("__prev") > min_gap))
        .select(
            *key_cols,
            (F.col("__prev") + 1).alias("gap_from"),
            (F.col(lsn_col) - 1).alias("gap_to"),
        )
    )


def group_intervals(df: DataFrame, group_cols, lsn_col: str) -> DataFrame:
    """Q9-ish: fold rows into per-group [min,max] interval summaries."""
    return df.groupBy(*group_cols).agg(
        F.min(lsn_col).alias("from_lsn"),
        F.max(lsn_col).alias("to_lsn"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def trim_to_cursor(intervals: DataFrame, cursor: int, lo_col="from_lsn", hi_col="to_lsn") -> DataFrame:
    """Q8: union'd intervals truncated at the live cursor.

    Reference: GetTickIntervals merges stored + live intervals and clamps the
    last one (status-service/rpc/status_service.go:68-116).
    """
    return (
        intervals.where(F.col(lo_col) <= cursor)
        .withColumn(hi_col, F.least(F.col(hi_col), F.lit(cursor)))
    )
