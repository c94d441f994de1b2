"""CDC-out consumer loop: ChangefeedTailer composes the engine's own change
feed the way a downstream reference consumer tails Kafka — persisted
cursor, offsets-after-sink, replay-safe across crashes, loud retention
error when compaction outruns it."""

import pytest
from pyspark.sql import functions as F

from go_data_publisher_spark.lake.table import TranscriptTable
from go_data_publisher_spark.streaming.apply import ChangeApplier
from go_data_publisher_spark.streaming.tailer import (
    ChangefeedRetentionError,
    ChangefeedTailer,
    CursorMismatchError,
)

SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp, schema_version int"
)


def _apply(spark, app, rows, epoch):
    app.apply_batch(spark.createDataFrame(rows, SCHEMA), epoch_id=epoch)


def _snap(tbl):
    return sorted(map(tuple, tbl.snapshot().select(
        "conv_id", "turn_idx", "lsn", "text").collect()))


def _mk(spark, tmpdir_path, name, n_buckets=2):
    return TranscriptTable(spark, f"{tmpdir_path}/{name}", n_buckets=n_buckets)


def test_tailer_reaches_source_state(spark, tmpdir_path):
    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1),
                        (2, "I", "c2", 0, "user", "b", None, None, 1)], 0)
    _apply(spark, app, [(3, "U", "c1", 0, "user", "a2", None, None, 1),
                        (4, "D", "c2", 0, "user", None, None, None, 1)], 1)

    tgt = _mk(spark, tmpdir_path, "tgt")
    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    out = tailer.run_until_caught_up()
    assert out["caught_up"] and out["ticks"][-1]["status"] == "committed"
    assert tailer.tick()["status"] == "idle"
    # tombstone flowed through the feed: c2 deleted in the copy too
    assert _snap(tgt) == _snap(src) == [("c1", 0, 3, "a2")]

    # incremental: new source commits flow without re-reading old windows
    _apply(spark, app, [(5, "I", "c3", 1, "user", "c", None, None, 1)], 2)
    stats = tailer.tick()
    assert stats["status"] == "committed"
    assert _snap(tgt) == _snap(src)


def test_tailer_crash_between_merge_and_cursor_advance(spark, tmpdir_path):
    """Kill after the target merge but before the cursor write; the retry
    must re-apply the SAME recorded window (epoch guard no-ops it), even
    though NEW source commits landed during the outage — the grown window
    is consumed by the next tick under a fresh epoch, never skipped."""
    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1)], 0)

    tgt = _mk(spark, tmpdir_path, "tgt")

    class CrashingTailer(ChangefeedTailer):
        def _store(self, cur):
            if cur.get("pending") is None and not getattr(self, "_ok", False):
                raise RuntimeError("injected crash before cursor advance")
            super()._store(cur)

    crasher = CrashingTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    with pytest.raises(RuntimeError, match="injected crash"):
        crasher.tick()
    # the merge itself committed; the cursor did not advance
    assert _snap(tgt) == _snap(src)

    # outage window: more source commits land
    _apply(spark, app, [(2, "U", "c1", 0, "user", "a2", None, None, 1),
                        (3, "I", "c2", 1, "user", "b", None, None, 1)], 1)

    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    out = tailer.run_until_caught_up()
    # first tick replays the recorded pending window → skipped by the epoch
    # guard; second tick consumes the growth under the next epoch
    assert out["caught_up"]
    assert [t["status"] for t in out["ticks"]] == ["skipped_replay", "committed"]
    assert _snap(tgt) == _snap(src)
    assert len(_snap(tgt)) == 2


def test_tailer_mid_tail_compaction_raises_retention_error(spark, tmpdir_path):
    """A tailer that fell behind a source compaction must get the loud
    retention error (the deltas it needs are folded away), not a silently
    incomplete copy."""
    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1)], 0)

    tgt = _mk(spark, tmpdir_path, "tgt")
    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    tailer.run_until_caught_up()

    # tailer sleeps; source commits more, then compacts those deltas away
    _apply(spark, app, [(2, "U", "c1", 0, "user", "a2", None, None, 1)], 1)
    src.compact()
    with pytest.raises(ChangefeedRetentionError, match="re-seed"):
        tailer.tick()


def test_tailer_caught_up_consumer_survives_compaction(spark, tmpdir_path):
    """A compaction that folds only windows the tailer ALREADY consumed is
    harmless: the next window is metadata-only/empty and the cursor simply
    advances past it (folded_hwm semantics, no epoch consumed)."""
    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1)], 0)
    _apply(spark, app, [(2, "U", "c1", 0, "user", "a2", None, None, 1)], 1)

    tgt = _mk(spark, tmpdir_path, "tgt")
    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    tailer.run_until_caught_up()

    src.compact()  # folds nothing the tailer still needs
    stats = tailer.tick()
    assert stats["status"] == "empty_window"
    assert tailer.tick()["status"] == "idle"

    # and the feed keeps flowing after the compaction
    _apply(spark, app, [(3, "I", "c2", 1, "user", "b", None, None, 1)], 2)
    assert tailer.tick()["status"] == "committed"
    assert _snap(tgt) == _snap(src)


def test_tailer_replays_to_oracle_over_generated_log(spark, tmpdir_path):
    """End-to-end over the synthetic changelog: source replay → tailed copy
    equals the source snapshot (the reference consumer's verify pass)."""
    from go_data_publisher_spark.sources.changelog import generate_changelog
    from go_data_publisher_spark.streaming.apply import replay_batch_range

    log = generate_changelog(spark, 1200, n_convs=20, seed=43)
    src = _mk(spark, tmpdir_path, "src", n_buckets=4)
    app = ChangeApplier(src)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    replay_batch_range(app, log, [(lo, mid), (mid + 1, hi)])

    tgt = _mk(spark, tmpdir_path, "tgt", n_buckets=4)
    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    tailer.run_until_caught_up()
    assert _snap(tgt) == _snap(src)
    assert len(_snap(tgt)) > 0


def test_tailer_pending_window_vacuumed_raises_retention_error(spark, tmpdir_path):
    """The OTHER retention shape: a crash leaves a pending window whose
    to_version manifest is expired by vacuum during the outage — the tailer
    must surface the same ChangefeedRetentionError (re-seed guidance), not
    the raw not-retained ValueError."""
    import json

    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1)], 0)

    tgt = _mk(spark, tmpdir_path, "tgt")
    cursor = f"{tmpdir_path}/cursor.json"
    tailer = ChangefeedTailer(src, tgt, cursor)
    tailer.run_until_caught_up()
    caught_up_v = json.load(open(cursor))["from_version"]

    # outage: two more source commits; the crash had recorded a pending
    # window ending at the FIRST of them
    _apply(spark, app, [(2, "U", "c1", 0, "user", "a2", None, None, 1)], 1)
    pending_v = src.manifest()["version"]
    _apply(spark, app, [(3, "I", "c2", 1, "user", "b", None, None, 1)], 2)
    json.dump({"from_version": caught_up_v, "next_epoch": 1,
               "pending": {"to_version": pending_v}}, open(cursor, "w"))

    # vacuum expires the pending manifest itself (keep only the newest)
    src.vacuum(keep_versions=1, orphan_grace_seconds=0)
    with pytest.raises(ChangefeedRetentionError, match="re-seed"):
        tailer.tick()


def test_tailer_flows_source_schema_evolution(spark, tmpdir_path):
    """Columns added to the source by schema evolution must reach the
    CDC-out copy — merge projects onto the TARGET schema, so the tailer
    evolves the target from the feed before merging."""
    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1)], 0)

    tgt = _mk(spark, tmpdir_path, "tgt")
    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    assert tailer.run_until_caught_up()["caught_up"]

    # source evolves: v2 events carry an extra column
    v2 = spark.createDataFrame(
        [(2, "U", "c1", 0, "user", "a2", None, None, 2, "extra-val")],
        SCHEMA + ", extra string")
    app.apply_batch(v2, epoch_id=1)
    assert "extra" in [f.name for f in src.schema.fields]

    assert tailer.tick()["status"] == "committed"
    assert "extra" in [f.name for f in tgt.schema.fields]
    row = tgt.snapshot().where("conv_id = 'c1'").first()
    assert row["extra"] == "extra-val" and row["text"] == "a2"


def test_tailer_bounded_drain_reports_not_caught_up(spark, tmpdir_path):
    """A drain bounded by max_ticks must say so — success-shaped output
    while arbitrarily stale hides an outage."""
    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    for e in range(3):
        _apply(spark, app,
               [(e + 1, "I", f"c{e}", 0, "user", "x", None, None, 1)], e)
        # one commit per epoch → 3 unconsumed windows? No: the tailer
        # consumes (cursor, CURRENT] in ONE window — so bound to 0 ticks
    tgt = _mk(spark, tmpdir_path, "tgt")
    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    out = tailer.run_until_caught_up(max_ticks=0)
    assert out == {"ticks": [], "caught_up": False}
    out = tailer.run_until_caught_up()
    assert out["caught_up"] and len(out["ticks"]) == 1
    assert _snap(tgt) == _snap(src)


def test_reseed_recovers_from_retention_loss(spark, tmpdir_path):
    """After falling behind compaction, reseed() makes the target equal the
    source snapshot — including deletes the tailer missed — and the feed
    flows again from there."""
    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1),
                        (2, "I", "c2", 0, "user", "b", None, None, 1)], 0)

    tgt = _mk(spark, tmpdir_path, "tgt")
    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    assert tailer.run_until_caught_up()["caught_up"]

    # outage: an update AND a delete land, then compaction folds them away
    _apply(spark, app, [(3, "U", "c1", 0, "user", "a2", None, None, 1),
                        (4, "D", "c2", 0, "user", None, None, None, 1)], 1)
    src.compact()
    with pytest.raises(ChangefeedRetentionError):
        tailer.tick()

    stats = tailer.reseed()
    assert stats["status"] == "committed"
    assert _snap(tgt) == _snap(src) == [("c1", 0, 3, "a2")]  # c2 deleted

    assert tailer.tick()["status"] == "idle"
    _apply(spark, app, [(5, "I", "c3", 1, "user", "c", None, None, 1)], 2)
    assert tailer.tick()["status"] == "committed"
    assert _snap(tgt) == _snap(src)


def test_reseed_crash_before_cursor_store_replays_pinned_version(spark, tmpdir_path):
    """A crash between the reseed merge and the cursor store must replay
    against the PINNED snapshot version — commits landing during the
    recovery outage are consumed by the next tick, never jumped over."""
    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1)], 0)

    tgt = _mk(spark, tmpdir_path, "tgt")
    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    tailer.run_until_caught_up()
    _apply(spark, app, [(2, "U", "c1", 0, "user", "a2", None, None, 1)], 1)
    src.compact()

    class CrashingTailer(ChangefeedTailer):
        def _store(self, cur):
            if "pending_reseed" not in cur and cur.get("pending") is None \
                    and not getattr(self, "_ok", False):
                raise RuntimeError("injected crash before reseed cursor store")
            super()._store(cur)

    crasher = CrashingTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    with pytest.raises(RuntimeError, match="injected crash"):
        crasher.reseed()
    # the reseed merge itself committed
    assert _snap(tgt) == _snap(src)

    # a NEW source commit lands during the recovery outage
    _apply(spark, app, [(3, "I", "c2", 1, "user", "b", None, None, 1)], 2)

    fresh = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    stats = fresh.reseed()   # replays the pinned version (skipped merge)
    assert stats["status"] == "skipped_replay"
    # the outage commit is NOT jumped: the next tick consumes it
    out = fresh.run_until_caught_up()
    assert out["caught_up"] and len(out["ticks"]) == 1
    assert _snap(tgt) == _snap(src)
    assert len(_snap(tgt)) == 2


def test_reseed_after_tick_crash_does_not_reuse_consumed_epoch(spark, tmpdir_path):
    """Review finding (severe): a tick crash between its merge commit and
    its cursor store leaves next_epoch pointing at an epoch the target
    already committed.  A later reseed must NOT merge under it (that would
    be skipped by the replay guard while the cursor still jumps — silent
    loss of everything the snapshot carries); it asks the target's guard
    state for a genuinely uncommitted epoch and commits for real."""
    import json

    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1)], 0)

    tgt = _mk(spark, tmpdir_path, "tgt")
    cursor = f"{tmpdir_path}/cursor.json"
    ChangefeedTailer(src, tgt, cursor).run_until_caught_up()

    # window A commits on the source; the tailer's tick merges it into the
    # target but crashes before the cursor store
    _apply(spark, app, [(2, "U", "c1", 0, "user", "a2", None, None, 1)], 1)

    class CrashingTailer(ChangefeedTailer):
        def _store(self, cur):
            if "pending_reseed" not in cur and cur.get("pending") is None:
                raise RuntimeError("injected crash before cursor advance")
            super()._store(cur)

    with pytest.raises(RuntimeError, match="injected crash"):
        CrashingTailer(src, tgt, cursor).tick()
    stale = json.load(open(cursor))
    assert tgt.is_epoch_committed(stale["next_epoch"], writer_id="cdc-out")

    # window B lands, then retention outruns the stale pending window
    _apply(spark, app, [(3, "I", "c2", 1, "user", "b", None, None, 1)], 2)
    src.compact()
    src.vacuum(keep_versions=1, orphan_grace_seconds=0)

    tailer = ChangefeedTailer(src, tgt, cursor)
    with pytest.raises(ChangefeedRetentionError):
        tailer.tick()
    stats = tailer.reseed()
    assert stats["status"] == "committed", \
        "reseed merged under a consumed epoch and was silently skipped"
    assert _snap(tgt) == _snap(src)
    assert len(_snap(tgt)) == 2  # window A update + window B insert
    assert tailer.tick()["status"] == "idle"


def test_reset_cursor_file_raises_mismatch_not_silent_drop(spark, tmpdir_path):
    """ADVICE r4 (medium): a cursor file that was reset/restored points
    next_epoch at an epoch the target already committed.  On a FRESH window
    (no pending record) that is a cursor/target mismatch — the tick must
    raise BEFORE writing a pending record, on every attempt, never advance
    from_version over the backlog (which would drop the window silently)."""
    import json
    import os

    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1)], 0)

    tgt = _mk(spark, tmpdir_path, "tgt")
    cursor = f"{tmpdir_path}/cursor.json"
    ChangefeedTailer(src, tgt, cursor).run_until_caught_up()

    # the cursor file is lost/reset; a backlog window exists
    os.unlink(cursor)
    _apply(spark, app, [(2, "U", "c1", 0, "user", "a2", None, None, 1)], 1)

    tailer = ChangefeedTailer(src, tgt, cursor)
    with pytest.raises(CursorMismatchError, match="reseed"):
        tailer.tick()
    # no pending record was written: the retry raises again instead of
    # accepting its own skip as a crash-recovery replay
    assert not os.path.exists(cursor)
    with pytest.raises(CursorMismatchError):
        tailer.tick()

    # the prescribed recovery works: reseed, then the feed flows again
    tailer.reseed()
    assert _snap(tgt) == _snap(src)
    _apply(spark, app, [(3, "I", "c2", 1, "user", "b", None, None, 1)], 2)
    assert tailer.tick()["status"] == "committed"
    assert _snap(tgt) == _snap(src)

    # a legitimate crash retry is still accepted: restored-from-backup
    # cursors are distinguishable from crashed ticks by the pending record
    cur = json.load(open(cursor))
    _apply(spark, app, [(4, "U", "c2", 1, "user", "b2", None, None, 1)], 3)
    assert tailer.tick()["status"] == "committed"
    # rewind the cursor to pre-tick state WITH the pending record the tick
    # would have left behind on a crash
    cur["pending"] = {"to_version": src.manifest()["version"]}
    json.dump(cur, open(cursor, "w"))
    assert tailer.tick()["status"] == "skipped_replay"
    assert _snap(tgt) == _snap(src)


def test_reseed_refuses_locally_evolved_target(spark, tmpdir_path):
    """Mirror-topology constraint (r4 verdict nit): reseed rebuilds rows
    from the SOURCE snapshot, so a target column the source lacks would be
    silently overwritten to NULL on every reseeded row — refuse loudly."""
    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1)], 0)

    tgt = _mk(spark, tmpdir_path, "tgt")
    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    tailer.run_until_caught_up()

    # the target evolves a column of its own (not a mirror any more)
    import pyspark.sql.types as T
    tgt.evolve_schema(T.StructType(
        list(tgt.schema.fields) + [T.StructField("local_note", T.StringType())]
    ))
    _apply(spark, app, [(2, "U", "c1", 0, "user", "a2", None, None, 1)], 1)
    src.compact()

    with pytest.raises(ValueError, match="mirror targets only"):
        tailer.reseed()


def test_reseed_refuses_recreated_source_with_unstampable_deletes(spark, tmpdir_path):
    """Code-review r5: a source table wiped and re-created has the
    freshly-initialized cursor_lsn=-1; reseeding a POPULATED target from it
    would stamp every missed-delete tombstone with -1, which loses to every
    stored row — the silent-loss mode reseed exists to fix.  Must refuse
    loudly.  (A fresh never-committed source with nothing to delete reseeds
    harmlessly — the guard keys on rows-to-delete, not on the cursor alone.)"""
    import shutil

    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1)], 0)

    tgt = _mk(spark, tmpdir_path, "tgt")
    tailer = ChangefeedTailer(src, tgt, f"{tmpdir_path}/cursor.json")
    tailer.run_until_caught_up()
    assert len(_snap(tgt)) == 1

    # the source is wiped and re-created empty (cursor_lsn back to -1)
    shutil.rmtree(f"{tmpdir_path}/src")
    src2 = _mk(spark, tmpdir_path, "src")
    tailer2 = ChangefeedTailer(src2, tgt, f"{tmpdir_path}/cursor2.json")
    with pytest.raises(ValueError, match="never committed"):
        tailer2.reseed()
    assert len(_snap(tgt)) == 1  # nothing was silently dropped

    # an empty target against the same fresh source reseeds harmlessly
    tgt2 = _mk(spark, tmpdir_path, "tgt2")
    stats = ChangefeedTailer(src2, tgt2, f"{tmpdir_path}/cursor3.json").reseed()
    assert "reseeded_to_version" in stats


def test_overlapping_drains_serialize_on_the_cursor_lock(spark, tmpdir_path):
    """Two drain jobs sharing one cursor file (a cron tick outliving its
    interval) must serialize, not interleave: pre-lock, the loser's stale
    in-memory cursor — written back after the winner advanced — rolled the
    file back and wedged every later tick in CursorMismatchError even
    though source and target were consistent.  With the exclusive cursor
    lock the second drain blocks until the first finishes, then sees an
    idle window."""
    import threading

    src = _mk(spark, tmpdir_path, "src")
    app = ChangeApplier(src)
    _apply(spark, app, [(1, "I", "c1", 0, "user", "a", None, None, 1),
                        (2, "I", "c2", 0, "user", "b", None, None, 1)], 0)
    tgt = _mk(spark, tmpdir_path, "tgt")
    cursor = f"{tmpdir_path}/cursor.json"

    entered, release = threading.Event(), threading.Event()

    class SlowTailer(ChangefeedTailer):
        def _consume_merge(self, cur, from_v, to_v, had_pending):
            entered.set()
            assert release.wait(timeout=30)
            return super()._consume_merge(cur, from_v, to_v, had_pending)

    results_a, results_b, errors = [], [], []

    def run(tailer, sink):
        try:
            sink.append(tailer.tick())
        except Exception as exc:  # noqa: BLE001 — surfaced in the assert
            errors.append(exc)

    ta = threading.Thread(
        target=run, args=(SlowTailer(src, tgt, cursor), results_a))
    ta.start()
    assert entered.wait(timeout=30)  # A holds the lock, mid-window
    tb = threading.Thread(
        target=run, args=(ChangefeedTailer(src, tgt, cursor), results_b))
    tb.start()
    tb.join(timeout=1.0)
    assert tb.is_alive()  # B is blocked on the cursor lock, not racing
    release.set()
    ta.join(timeout=60)
    tb.join(timeout=60)
    assert not ta.is_alive() and not tb.is_alive()

    assert errors == []  # pre-lock this raced into CursorMismatchError
    assert results_a[0]["status"] == "committed"
    assert results_b[0]["status"] == "idle"  # B saw A's advance, did nothing
    assert _snap(tgt) == _snap(src)
    # and the file was never rolled back: the next tick is a clean idle
    assert ChangefeedTailer(src, tgt, cursor).tick()["status"] == "idle"


def test_reseed_gives_up_loudly_when_vacuum_outruns_every_pin(spark, tmpdir_path):
    """The reseed retry loop is bounded: if every pinned snapshot version is
    vacuumed before it can be read, the recovery must surface a typed error
    instead of spinning forever while holding the cursor lock (which would
    block every cron tick on this cursor with no visible failure)."""
    from go_data_publisher_spark.lake.table import RetentionLostError

    class VacuumedOutSource:
        order_col = "lsn"

        def manifest(self, version=None):
            if version is None:
                return {"version": 7}  # a fresh pin is always offered...
            raise RetentionLostError("pinned version vacuumed")

        def snapshot(self, version=None):
            raise RetentionLostError("pinned version vacuumed")

    tgt = _mk(spark, tmpdir_path, "tgt")
    tailer = ChangefeedTailer(
        VacuumedOutSource(), tgt, f"{tmpdir_path}/cursor.json")
    with pytest.raises(ChangefeedRetentionError, match="outrunning"):
        tailer.reseed()
