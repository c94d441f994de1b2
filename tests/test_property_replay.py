"""Property-based replay equality: arbitrary I/U/D sequences with duplicates
and arbitrary batch boundaries always converge to the pandas-oracle state.

(The reference has no property tests — SURVEY.md §5 — this goes beyond its
golden-replay strategy.)
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_data_publisher_spark.lake.table import TranscriptTable
from go_data_publisher_spark.streaming.apply import ChangeApplier

from conftest import pandas_final_state

EVENT_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp, schema_version int"
)

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.sampled_from(["c0", "c1", "c2"]),      # few keys → many collisions
        st.integers(min_value=0, max_value=2),
        st.text(alphabet="abµ𝄞", min_size=0, max_size=5),
    ),
    min_size=1,
    max_size=30,
)


@pytest.fixture(scope="module")
def sticky_spark(spark):
    return spark


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evs=events_strategy, n_batches=st.integers(min_value=1, max_value=3),
       dup_stride=st.integers(min_value=2, max_value=5))
def test_random_replay_converges(sticky_spark, tmp_path_factory, evs, n_batches, dup_stride):
    spark = sticky_spark
    rows = [
        (i + 1, op, conv, turn, "user", text, None, None, 1)
        for i, (op, conv, turn, text) in enumerate(evs)
    ]
    # duplicate every dup_stride-th event verbatim (at-least-once delivery)
    rows += rows[::dup_stride]

    root = str(tmp_path_factory.mktemp("prop"))
    tbl = TranscriptTable(spark, f"{root}/tbl", n_buckets=2)
    app = ChangeApplier(tbl)
    df = spark.createDataFrame(rows, EVENT_SCHEMA)

    span = max(1, (len(evs) // n_batches) + 1)
    from pyspark.sql import functions as F

    for b in range(n_batches):
        lo, hi = b * span + 1, (b + 1) * span
        app.apply_batch(df.where(F.col("lsn").between(lo, hi)), epoch_id=b)

    got = (
        tbl.snapshot()
        .select("conv_id", "turn_idx", "text", "lsn")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    oracle = pandas_final_state(
        pd.DataFrame(rows, columns=["lsn", "op", "conv_id", "turn_idx", "role",
                                    "text", "tool", "ts", "schema_version"])
    )[["conv_id", "turn_idx", "text", "lsn"]].sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)

    assert len(got) == len(oracle)
    for col in got.columns:
        pd.testing.assert_series_equal(
            got[col], oracle[col], check_names=False, check_dtype=False, obj=col
        )


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evs=events_strategy,
       order=st.permutations([0, 1, 2]),
       maint=st.lists(st.sampled_from(["compact", "vacuum", "replay", "none"]),
                      min_size=3, max_size=3))
def test_out_of_order_batches_with_maintenance(sticky_spark, tmp_path_factory,
                                               evs, order, maint):
    """The LSN-guarded merge is delivery-order independent: applying the
    lsn-chunks in any order (distinct epochs), with compaction / vacuum /
    epoch replays interleaved at random, converges to the same final state.
    This is the crash-recovery reality of a CDC consumer — redelivery and
    maintenance never race the result."""
    spark = sticky_spark
    rows = [
        (i + 1, op, conv, turn, "user", text, None, None, 1)
        for i, (op, conv, turn, text) in enumerate(evs)
    ]
    root = str(tmp_path_factory.mktemp("prop_ooo"))
    tbl = TranscriptTable(spark, f"{root}/tbl", n_buckets=2)
    app = ChangeApplier(tbl)
    df = spark.createDataFrame(rows, EVENT_SCHEMA)

    from pyspark.sql import functions as F

    span = max(1, (len(rows) // 3) + 1)
    bounds = [(b * span + 1, (b + 1) * span) for b in range(3)]
    applied = []
    for step, b in enumerate(order):
        lo, hi = bounds[b]
        app.apply_batch(df.where(F.col("lsn").between(lo, hi)), epoch_id=b)
        applied.append((b, lo, hi))
        act = maint[step]
        if act == "compact":
            tbl.compact()
        elif act == "vacuum":
            tbl.vacuum(keep_versions=2, orphan_grace_seconds=0)
        elif act == "replay" and applied:
            rb, rlo, rhi = applied[0]
            out = app.apply_batch(
                df.where(F.col("lsn").between(rlo, rhi)), epoch_id=rb
            )
            assert out["status"] == "skipped_replay"

    got = (
        tbl.snapshot()
        .select("conv_id", "turn_idx", "text", "lsn")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    oracle = pandas_final_state(
        pd.DataFrame(rows, columns=["lsn", "op", "conv_id", "turn_idx", "role",
                                    "text", "tool", "ts", "schema_version"])
    )[["conv_id", "turn_idx", "text", "lsn"]].sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)

    assert len(got) == len(oracle)
    for col in got.columns:
        pd.testing.assert_series_equal(
            got[col], oracle[col], check_names=False, check_dtype=False, obj=col
        )
