"""External watermark store (S9) — the engine-side analogue of the
reference's Redis "last ingested tick status".

Reference contract (status-service/redis/logs.go:41-65): one Redis hash
under a configured key holding ``tickNumber`` (how far an EXTERNAL system
has ingested) and ``count`` (how many records it holds at that point); the
verifier HGetAlls it, errors loudly when the key is absent, and uses the
pair to (a) clamp its own scan head and (b) check count equality (V5)
against its own store.

This implementation keeps the exact same contract over a local
file-per-key backend (atomic tmp+rename writes, so a reader never sees a
torn hash) — no Redis ships in this sandbox.  On a cluster, swap
``_read``/``_write`` for redis-py HGETALL/HSET against a sentinel client;
every caller is backend-agnostic.

Scale note: this is metadata-plane state — one tiny KV read per
microbatch/verification pass, never per row.
"""

from __future__ import annotations

import json
import os
import urllib.parse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ioutil import atomic_write_json


class WatermarkKeyError(KeyError):
    """Missing watermark key — the reference's `no data found for key [k]`
    error branch (redis/logs.go:50)."""


class ExternalWatermarkStore:
    """File-backed KV of per-key ingestion watermarks: key → (tick, count)."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")
        os.makedirs(self.root, exist_ok=True)

    def _path(self, key: str) -> str:
        # INJECTIVE filename encoding (percent-escaping): distinct keys can
        # never alias to one file — 'a/b' and 'a_b' stay separate watermarks
        # (a lossy sanitizer would silently merge two external systems'
        # ticks, clamping the publisher to the wrong head)
        safe = urllib.parse.quote(key, safe="-_.")
        return f"{self.root}/{safe}.json"

    def set_status(self, key: str, tick_number: int, count: int) -> None:
        """Atomic publish (tmp + rename): concurrent readers see either the
        old hash or the new one, never a torn write."""
        atomic_write_json(self._path(key),
                          {"tickNumber": int(tick_number), "count": int(count)})

    def get_status(self, key: str) -> tuple[int, int]:
        """(tick_number, count) — raises WatermarkKeyError on a missing key,
        matching the reference's loud no-data branch rather than returning a
        silently-permissive zero watermark."""
        try:
            with open(self._path(key)) as f:
                d = json.load(f)
        except FileNotFoundError:
            raise WatermarkKeyError(f"no data found for key [{key}]") from None
        return int(d["tickNumber"]), int(d["count"])


def clamp_to_external_watermark(df: DataFrame, store: ExternalWatermarkStore,
                                key: str, lsn_col: str = "lsn",
                                cursor: int | None = None) -> DataFrame:
    """Q2 with an EXTERNAL head: scan rows above ``cursor`` up to the
    external system's ingested tick — the publisher must never run ahead of
    what the downstream store has actually absorbed (the reference clamps
    its processing head to the Redis status the same way)."""
    tick, _count = store.get_status(key)
    out = df.where(F.col(lsn_col) <= tick)
    if cursor is not None:
        out = out.where(F.col(lsn_col) > int(cursor))
    return out


def external_count_equality(df: DataFrame, store: ExternalWatermarkStore,
                            key: str, lsn_col: str = "lsn") -> dict:
    """V5 against the external watermark: our row count at or below the
    external tick must equal the external system's reported count.  One
    pushdown-pruned aggregate; returns the comparison rather than raising —
    the caller (verifier loop / report CLI) decides the policy."""
    tick, count = store.get_status(key)
    ours = df.where(F.col(lsn_col) <= tick).count()
    return {
        "key": key,
        "external_tick": tick,
        "external_count": count,
        "our_count": ours,
        "match": ours == count,
    }
