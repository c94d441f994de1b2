"""Property-based check of the manifest metadata plane: any sequence of
file-delta commits, interval checkpoints, and vacuums must fold to exactly
the same live-file set as a trivial in-memory model — across version
boundaries, squashes, and fresh-reader re-resolution (empty cache)."""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_data_publisher_spark.lake.table import TranscriptTable


def _entry(i):
    return {"path": f"/x/f{i}.parquet", "bucket": i % 4,
            "schema_id": 0, "kind": "delta", "seq": 1}


# an action is (kind, payload): add k new files, remove j existing files,
# or vacuum with keep_versions k
ACTIONS = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.integers(1, 7)),
        st.tuples(st.just("remove"), st.integers(1, 5)),
        st.tuples(st.just("vacuum"), st.integers(1, 4)),
    ),
    min_size=5, max_size=40,
)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(actions=ACTIONS)
def test_fold_matches_reference_model(spark, tmp_path_factory, actions):
    root = str(tmp_path_factory.mktemp("mprop"))
    tbl = TranscriptTable(spark, f"{root}/tbl", n_buckets=4)
    model: dict[str, dict] = {}   # path -> entry (the trivially-correct fold)
    next_id = 0
    # Seed with version 0 (the empty manifest committed at construction):
    # it is a retained checkpoint until a vacuum drops it, so the fresh-reader
    # meta-guard below (`checked >= 1`) holds even for a degenerate action
    # sequence that never commits (e.g. all-removes on an empty table).
    history_snapshots: list[tuple[int, set]] = [(0, set())]

    for kind, k in actions:
        if kind == "add":
            added = [_entry(next_id + i) for i in range(k)]
            next_id += k
            tbl._publish(tbl.manifest(), files_added=added)
            for e in added:
                model[e["path"]] = e
        elif kind == "remove":
            victims = sorted(model)[:k]
            if not victims:
                continue
            tbl._publish(tbl.manifest(), files_removed=victims)
            for p in victims:
                del model[p]
        else:
            stats = tbl.vacuum(keep_versions=k, orphan_grace_seconds=0)
            # vacuumed history snapshots below the keep floor are gone
            floor = min(stats["kept_versions"])
            history_snapshots = [s for s in history_snapshots if s[0] >= floor]
        v = tbl.manifest()["version"]
        history_snapshots.append((v, set(model)))

        # invariant 1: the folded live set equals the model, and the running
        # counter agrees
        m = tbl.manifest()
        assert {f["path"] for f in m["files"]} == set(model)
        assert m["n_live_files"] == len(model)

    # invariant 2: a FRESH reader (no warm cache) resolves every retained
    # historical version to the set the model had at that version
    fresh = TranscriptTable(spark, f"{root}/tbl", n_buckets=4)
    retained = {h["version"] for h in fresh.history()}
    checked = 0
    for v, want in history_snapshots:
        if v in retained:
            got = {f["path"] for f in fresh.manifest(v)["files"]}
            assert got == want, f"version {v}"
            checked += 1
    assert checked >= 1

    # invariant 3: every retained delta chain resolves without touching a
    # vacuumed manifest (squash worked) — resolving already proved it above,
    # but also assert the on-disk chain closure directly
    for v in sorted(retained):
        raw = fresh._load_raw(v)
        while "files" not in raw:
            b = int(raw["base_version"])
            assert b in retained, f"chain of {v} reaches vacuumed version {b}"
            raw = fresh._load_raw(b)
