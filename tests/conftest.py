from __future__ import annotations

import shutil
import tempfile

import pytest

from go_data_publisher_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="cdc_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def pandas_final_state(log_pdf):
    """Naive oracle: replay the change log in pandas.

    Keep valid rows; per (conv_id, turn_idx) the winner is max (lsn, op_rank);
    winner op 'D' means the key is absent from the final state.
    """
    import pandas as pd

    pdf = log_pdf.copy()
    pdf = pdf[pdf["conv_id"].notna() & pdf["turn_idx"].notna() & pdf["op"].isin(["I", "U", "D"])]
    pdf["__op_rank"] = pdf["op"].map({"I": 1, "U": 2, "D": 3})
    pdf = pdf.sort_values(["lsn", "__op_rank"]).drop_duplicates(
        subset=["conv_id", "turn_idx"], keep="last"
    )
    pdf = pdf[pdf["op"] != "D"].drop(columns=["__op_rank"])
    return pdf.reset_index(drop=True)
