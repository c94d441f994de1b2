"""S10: the status/progress serving surface over a lake table.

The reference exposes ingest progress over HTTP+gRPC
(status-service/rpc/server.go:104-151, status.proto:68-100: GetStatus,
processed-interval lists, skipped-tick report).  SURVEY.md scoped gRPC out
of the engine core; this module provides the same documents as (a) plain
dicts for the CLI `report` command and (b) a minimal stdlib HTTP JSON
endpoint (`ReportServer`) — enough for a dashboard or a health probe to
consume without spark-submit access.

Two cost tiers, deliberately separate:

- ``/status`` is the manifest fast path — version, cursor, epoch state,
  live-file count — served from one O(1) raw-manifest read, NO Spark job.
  Safe to poll at health-check frequency.
- ``/report`` runs the full progress document (snapshot row count, interval
  union, gap scan, lineage totals) — a handful of Spark jobs; poll it like
  a dashboard, not like a liveness probe.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def build_status(tbl) -> dict:
    """Manifest-only status (no Spark job): the reference's cheap GetStatus
    fields (status-service/rpc/server.go:104-118)."""
    m = tbl.manifest()
    return {
        "version": m["version"],
        "cursor_lsn": m["cursor_lsn"],
        "epoch_hwm": m["epoch_hwm"],
        "epochs_recent": m["epochs_recent"],
        "live_files": m.get("n_live_files", len(m["files"])),
        "delta_files_per_bucket": tbl.delta_file_counts(),
    }


def lineage_raw_totals(spark, lineage_dir: str) -> dict:
    """ONE Spark aggregation over the lineage feed, shared by /report and
    /metrics (each used to run its own, with drift-prone twin logic):
    per-epoch sums of the per-bucket counters, with rows_quarantined taken
    once per epoch (it is an epoch-level count replicated into every
    per-bucket row — quarantined rows never reach a bucket), then summed
    across epochs.  Sums are None over an empty feed — the distinction
    /report's ``rows_upserted_total`` preserves; /metrics coalesces to 0."""
    from .schemas import LINEAGE_SCHEMA

    lin = spark.read.schema(LINEAGE_SCHEMA).json(lineage_dir)
    row = lin.groupBy("epoch_id").agg(
        F.sum("rows_upserted").alias("u"),
        F.sum("rows_deleted").alias("d"),
        F.max("rows_quarantined").alias("q"),
    ).agg(F.sum("u"), F.sum("d"), F.sum("q"), F.count("*")).first()
    return {"epochs": row[3] or 0, "upserted": row[0],
            "deleted": row[1], "quarantined": row[2]}


def build_report(spark, tbl, lineage_dir: str | None = None,
                 quarantine_dir: str | None = None,
                 lineage_totals: dict | None = None) -> dict:
    """The full progress/intervals/gaps document (S10/Q7/Q8/A3 composed).

    ``lineage_totals``: a precomputed ``lineage_raw_totals`` result (the
    ReportServer passes its TTL-cached one so /report and /metrics share a
    single lineage aggregation per window); when absent and ``lineage_dir``
    holds data, the totals are computed here."""
    from .operators.sequencing import detect_gaps, group_intervals

    m = tbl.manifest()
    snap = tbl.snapshot()
    intervals = group_intervals(
        snap.withColumn("__all", F.lit(1)), ["__all"], "lsn"
    ).first()
    gaps = detect_gaps(
        snap.withColumn("__all", F.lit(1)), ["__all"], "lsn", min_gap=1000
    ).count()
    report = {
        "version": m["version"],
        "cursor_lsn": m["cursor_lsn"],
        "epoch_hwm": m["epoch_hwm"],
        "epochs_recent": m["epochs_recent"],
        "rows": snap.count(),
        "lsn_range": [intervals["from_lsn"], intervals["to_lsn"]] if intervals else None,
        "large_gaps": gaps,
        "history": tbl.history()[-5:],
    }
    if lineage_dir:
        # read with the DECLARED schema (same as ChangeApplier.lineage,
        # streaming/apply.py): a configured-but-still-empty lineage dir —
        # fresh pipeline, report before the first commit — must be an empty
        # frame, not an UNABLE_TO_INFER_SCHEMA 500.  The dir itself may not
        # exist yet either (ChangeApplier only creates it on the first
        # applied batch), and a schema'd read of a missing path raises
        # PATH_NOT_FOUND — so the fresh-pipeline report zeroes the fields.
        if os.path.isdir(lineage_dir):
            totals = lineage_totals or lineage_raw_totals(spark, lineage_dir)
            report["lineage_epochs"] = totals["epochs"]
            report["rows_upserted_total"] = totals["upserted"]
        else:
            report["lineage_epochs"] = 0
            report["rows_upserted_total"] = None
    # V4 persisted skipped-key set (served sorted, like the reference's
    # status-service/db/store.go:109 read-back).  A clean run's quarantine
    # dir holds ONLY the per-epoch marker files, which would make the
    # parquet reader raise UNABLE_TO_INFER_SCHEMA — shared probe with
    # ChangeApplier.skipped_keys.  Columns follow the table's declared
    # key/order contract, not hardcoded names.
    from .ioutil import has_parquet_data

    # Iceberg-backed tables have no filesystem root: without an explicit
    # quarantine_dir the skipped-keys section is simply omitted, it must not
    # AttributeError the whole report
    qdir = quarantine_dir or (
        f"{tbl.root}/_quarantine" if getattr(tbl, "root", None) else None)
    if qdir and os.path.isdir(qdir):
        key = list(tbl.key)
        order = tbl.order_col
        if has_parquet_data(qdir):
            q = spark.read.parquet(qdir)
            report["rows_skipped_total"] = q.count()
            report["skipped_sample"] = [
                {c: r[c] for c in (*key, order)}
                for r in q.orderBy(*key, order).limit(5).collect()
            ]
        else:
            report["rows_skipped_total"] = 0
            report["skipped_sample"] = []
    return report


def build_metrics_text(tbl, namespace: str = "gdps",
                       lineage_totals: dict | None = None) -> str:
    """Prometheus text exposition (format 0.0.4) of the engine's progress
    gauges — the reference's scrape surface
    (status-service/metrics/metrics.go:23-100: processed tick/epoch, source
    tick/epoch, error gauges, one flat namespace prefix).

    The manifest gauges come from the same O(1) raw-manifest read as
    ``/status`` — safe at scrape frequency, NO Spark job.  ``lineage_totals``
    (rows upserted/deleted/quarantined, epochs) is optional and supplied by
    the caller from its TTL cache, because computing it runs Spark jobs;
    when absent those series are simply not exported, which Prometheus
    treats as a disappearing series, not an error."""
    m = tbl.manifest()
    gauges: list[tuple[str, str, float | int | None]] = [
        ("cursor_lsn",
         "Highest LSN durably applied to the table "
         "(reference: processed_transactions_tick)", m["cursor_lsn"]),
        ("epoch_hwm",
         "Highest fully committed epoch "
         "(reference: processed_transactions_epoch)", m["epoch_hwm"]),
        ("table_version", "Current committed table version", m["version"]),
        ("live_files", "Live data files in the current snapshot",
         m.get("n_live_files", len(m["files"]))),
        ("delta_files_max_per_bucket",
         "Deepest per-bucket delta chain awaiting compaction",
         max(tbl.delta_file_counts().values(), default=0)),
    ]
    for name, (help_, value) in (lineage_totals or {}).items():
        gauges.append((name, help_, value))
    out = []
    for name, help_, value in gauges:
        if value is None:
            continue
        full = f"{namespace}_{name}"
        out.append(f"# HELP {full} {help_}")
        out.append(f"# TYPE {full} gauge")
        out.append(f"{full} {value}")
    return "\n".join(out) + "\n"


class ReportServer:
    """Minimal HTTP JSON endpoint over one table.

    Routes: ``/healthz`` (constant), ``/status`` (manifest fast path),
    ``/metrics`` (Prometheus text format: manifest gauges + TTL-cached
    lineage totals), ``/history`` (retained snapshot log), ``/report``
    (full document, runs Spark jobs), ``/row?key=<v>[&second=<v>]``
    (bucket-pruned point lookup, S2/S3).  Threaded: the cheap routes answer
    while a slow /report is
    in flight; one Spark session is shared (job submission is thread-safe).
    The driver is still not a web worker pool — put a cache/proxy in front
    for real fan-out, exactly as the reference fronts its status service.

    Usage::

        srv = ReportServer(spark, tbl, port=0)   # port 0 → ephemeral
        srv.start()                              # background thread
        ... GET http://127.0.0.1:{srv.port}/status ...
        srv.shutdown()

    or blocking: ``srv.serve_forever()`` (the CLI `serve` command).
    """

    def __init__(self, spark, tbl, port: int = 8080,
                 lineage_dir: str | None = None,
                 report_ttl_seconds: float = 60.0):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib contract)
                # COMPUTE fully before writing a single response byte, so a
                # compute failure becomes a clean 500 and a socket failure
                # never triggers a second status line on the same connection
                ctype = "application/json"
                try:
                    if self.path == "/healthz":
                        status, body = 200, {"ok": True}
                    elif self.path == "/status":
                        status, body = 200, build_status(outer.tbl)
                    elif self.path == "/metrics":
                        # Prometheus scrape target: text format, not JSON
                        status, body = 200, outer._metrics_text()
                        ctype = "text/plain; version=0.0.4"
                    elif self.path == "/history":
                        status, body = 200, {"history": outer.tbl.history()}
                    elif self.path == "/report":
                        status, body = 200, outer._cached_report()
                    elif self.path.startswith("/row?"):
                        status, body = outer._lookup(self.path)
                    else:
                        status, body = 404, {"error": "not found"}
                except Exception as exc:  # surface as 500, keep serving
                    status, body, ctype = 500, {"error": str(exc)}, "application/json"
                payload = (body.encode() if isinstance(body, str)
                           else json.dumps(body, default=str).encode())
                try:
                    self.send_response(status)
                    self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                except OSError:
                    pass  # client went away mid-write; nothing to salvage

            def log_message(self, *_a):  # quiet: engine logs, not access logs
                pass

        self.spark = spark
        self.tbl = tbl
        self.lineage_dir = lineage_dir
        # /report TTL cache — the reference fronts the same document with a
        # time-bounded cache (status-service/main.go:221-233 wraps GetStatus
        # in a 1s cache, rpc/status_service.go:118-137 serves the report from
        # a 1m one) so dashboard polling never multiplies Spark jobs on the
        # driver.  report_builds counts ACTUAL builds (observable in tests).
        self.report_ttl_seconds = float(report_ttl_seconds)
        self.report_builds = 0
        self.lineage_builds = 0
        self._report_cache: tuple[float, dict] | None = None
        self._lineage_cache: tuple[float, dict] | None = None
        self._report_lock = threading.Lock()
        # the lineage totals get their OWN lock: a /metrics scrape must not
        # queue behind a slow multi-job /report build just because both
        # consult the lineage cache (a blocked scrape = gaps in every
        # exported series); lock order is report → lineage only, never the
        # reverse, so the pair cannot deadlock
        self._lineage_lock = threading.Lock()
        # Threading: /healthz and /status (no Spark job) must answer while a
        # slow /report (several Spark jobs) is in flight, or a liveness
        # probe flaps unhealthy exactly when the service is doing normal
        # work.  Spark job submission is thread-safe; concurrent /report
        # calls just queue in the scheduler.
        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._httpd.daemon_threads = True
        self.port = self._httpd.server_address[1]
        self._thread = None

    def _cached_report(self) -> dict:
        """Serve /report from the TTL cache, building at most once per
        window.  The lock is held ACROSS the build so concurrent polls
        arriving during a slow build queue behind it and reuse its result
        instead of each launching their own Spark jobs; the no-Spark routes
        (/status, /healthz) never touch this lock."""
        import time

        with self._report_lock:
            now = time.monotonic()
            if (self._report_cache is not None
                    and now - self._report_cache[0] < self.report_ttl_seconds):
                return self._report_cache[1]
            # force a FRESH lineage aggregation for a fresh report: the
            # document's manifest/row fields are computed NOW, so pairing
            # them with a lineage total cached up to a TTL ago would serve
            # an internally inconsistent document (lineage_epochs behind
            # epoch_hwm in the SAME response).  The refreshed totals land in
            # the shared cache, so /metrics scrapes ride this build too.
            body = build_report(self.spark, self.tbl,
                                lineage_dir=self.lineage_dir,
                                lineage_totals=self._lineage_totals(force=True))
            self.report_builds += 1
            self._report_cache = (time.monotonic(), body)
            return body

    def _lineage_totals(self, force: bool = False) -> dict | None:
        """TTL-cached ``lineage_raw_totals`` shared by /report and /metrics.
        Scrapes are served from the cache (at most one aggregation per
        window on the /metrics path); a REPORT build always recomputes
        (``force=True``) for document coherence, refreshing the shared
        cache as it does — so a window with both a scrape and a report
        build runs up to two aggregations, bounded by the report TTL."""
        import time

        if not (self.lineage_dir and os.path.isdir(self.lineage_dir)):
            return None
        with self._lineage_lock:
            now = time.monotonic()
            if (not force and self._lineage_cache is not None
                    and now - self._lineage_cache[0] < self.report_ttl_seconds):
                return self._lineage_cache[1]
            totals = lineage_raw_totals(self.spark, self.lineage_dir)
            self.lineage_builds += 1
            self._lineage_cache = (time.monotonic(), totals)
            return totals

    _LOOKUP_LIMIT = 1000

    def _lookup(self, path: str) -> tuple[int, dict]:
        """``/row?key=<v>[&second=<v>]`` — the reference's per-tick
        transactions / single-TickData reads (S2/S3) served over HTTP from
        the committed table via the bucket-pruned ``TranscriptTable.lookup``
        (one bucket's files, key equality pushed into the scan).  ``second``
        is coerced to the second key column's type when it is integral (URL
        query params arrive as strings)."""
        from urllib.parse import parse_qs, urlparse

        import pyspark.sql.types as T

        def coerce(col_name: str, raw: str):
            dt = self.tbl.schema[col_name].dataType
            if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType)):
                return int(raw)  # ValueError → 400 below
            return raw

        # keep_blank_values: `second=` (client interpolated an unset
        # variable) must be a 400, not a silently ignored parameter that
        # returns every row of the key
        q = parse_qs(urlparse(path).query, keep_blank_values=True)
        if "key" not in q or q["key"][0] == "":
            return 400, {"error": "missing key= parameter"}
        second = q.get("second", [None])[0]
        if second is not None:
            if second == "":
                return 400, {"error": "second= given without a value"}
            if len(self.tbl.key) < 2:
                return 400, {"error": "second= given but the table key is "
                                      "single-column"}
        try:
            key_value = coerce(self.tbl.key[0], q["key"][0])
            if second is not None:
                second = coerce(self.tbl.key[1], second)
        except ValueError as exc:
            return 400, {"error": f"non-integral value for integral key "
                                  f"column: {exc}"}
        rows = (self.tbl.lookup(key_value, second=second)
                .limit(self._LOOKUP_LIMIT + 1).collect())
        truncated = len(rows) > self._LOOKUP_LIMIT
        return 200, {
            "rows": [r.asDict() for r in rows[: self._LOOKUP_LIMIT]],
            "truncated": truncated,
        }

    def _metrics_text(self) -> str:
        """/metrics body: manifest gauges are recomputed every scrape (O(1)
        read, no Spark); the lineage totals ride the shared TTL cache — a
        scrape never waits on a /report build, only (worst case) on one
        in-flight lineage aggregation."""
        totals = self._lineage_totals()
        gauges = None
        if totals is not None:
            gauges = {
                "rows_upserted_total":
                    ("Rows upserted across all committed epochs",
                     totals["upserted"] or 0),
                "rows_deleted_total":
                    ("Rows deleted across all committed epochs",
                     totals["deleted"] or 0),
                "rows_quarantined_total":
                    ("Rows quarantined by the validity guard",
                     totals["quarantined"] or 0),
                "lineage_epochs":
                    ("Distinct epochs with lineage records",
                     totals["epochs"] or 0),
            }
        return build_metrics_text(self.tbl, lineage_totals=gauges)

    def start(self) -> None:
        import threading

        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
