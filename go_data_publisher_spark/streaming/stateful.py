"""Custom stateful streaming operator via applyInPandasWithState.

`track_conversation_watermarks` maintains, per conv_id, the running
(max_lsn, n_events, n_regressions) across microbatches — the streaming
analogue of the reference's per-entity cursor gauges
(transactions-consumer/consume/transaction_consumer.go:125-129 max-tick
gauge; status-service per-epoch last-processed map).  A "regression" is a
batch whose max lsn is not above the stored watermark — i.e. pure
redelivery — which is exactly the signal the replay guard acts on.

State is Spark-managed (checkpointed with the query), so the operator
resumes correctly after a crash.  Per-group logic is pandas-vectorized.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "conv_id string, max_lsn long, n_events long, n_regressions long"
STATE_DDL = "max_lsn long, n_events long, n_regressions long"


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        max_lsn, n_events, n_regr = state.get
    else:
        max_lsn, n_events, n_regr = -1, 0, 0
    # fold ALL arrow chunks first: one microbatch may arrive as several
    # unordered pandas chunks, and comparing each chunk against the running
    # max would count intra-batch chunk ordering as redelivery
    batch_max, batch_n = -1, 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        batch_max = max(batch_max, int(pdf["lsn"].max()))
        batch_n += int(len(pdf))
    if batch_n:
        n_events += batch_n
        if batch_max <= max_lsn:
            n_regr += 1
        max_lsn = max(max_lsn, batch_max)
    state.update((max_lsn, n_events, n_regr))
    yield pd.DataFrame(
        [(conv_id, max_lsn, n_events, n_regr)],
        columns=["conv_id", "max_lsn", "n_events", "n_regressions"],
    )


def track_conversation_watermarks(stream_df: DataFrame) -> DataFrame:
    """Attach the stateful watermark tracker to a change-event stream.
    Emits one row per (conv_id, microbatch) with the running counters."""
    return (
        stream_df.select("conv_id", "lsn")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
