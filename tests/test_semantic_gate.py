"""Streaming semantic admission gate: bootstrap, vs-index rejection,
within-batch rejection, replay idempotence, manifest-pruned reads, and
the exactly-once streaming fold."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from metrics_service_spark.sources.merge_table import current_version, read_table
from metrics_service_spark.streaming.semantic_gate import (

    _BOOT_FILE,
    admit_batch,
    incremental_semantic_gate_refresh,
)

# multi-minute suite: excluded from the fast default run (pytest.ini)
pytestmark = pytest.mark.slow

SCHEMA = "vec_id long, embedding array<float>"

V1 = [1.0, 0.0, 0.0, 0.0]
V2 = [0.0, 1.0, 0.0, 0.0]
V3 = [0.99, 0.01, 0.0, 0.0]  # near-dup of V1 (cos ~ 0.9999)
V4 = [0.0, 0.0, 1.0, 0.0]


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _kept(df):
    return {r.vec_id: r.kept for r in df.collect()}


def test_bootstrap_then_reject_near_dup(spark, tmp_path):
    tdir = str(tmp_path / "semidx")
    got = _kept(admit_batch(spark, tdir, _batch(spark, [(1, V1), (2, V2)]), n_cells=2))
    assert got == {1: True, 2: True}
    assert os.path.exists(os.path.join(tdir, _BOOT_FILE))
    v_after_1 = current_version(tdir)
    assert v_after_1 >= 0

    got2 = _kept(
        admit_batch(spark, tdir, _batch(spark, [(3, V3), (4, V4)]), n_cells=2)
    )
    assert got2 == {3: False, 4: True}
    stored = {r.vec_id for r in read_table(spark, tdir).collect()}
    assert stored == {1, 2, 4}


def test_within_batch_drop_rule(spark, tmp_path):
    tdir = str(tmp_path / "semidx")
    got = _kept(
        admit_batch(spark, tdir, _batch(spark, [(10, V1), (11, V1), (12, V2)]), n_cells=2)
    )
    # 11 duplicates 10 within the batch -> smaller id survives
    assert got == {10: True, 11: False, 12: True}


def test_replay_converges(spark, tmp_path):
    tdir = str(tmp_path / "semidx")
    admit_batch(spark, tdir, _batch(spark, [(1, V1), (2, V2)]), n_cells=2)
    b2 = [(3, V3), (4, V4)]
    first = _kept(admit_batch(spark, tdir, _batch(spark, b2), n_cells=2))
    replay = _kept(admit_batch(spark, tdir, _batch(spark, b2), n_cells=2))
    # same verdicts on redelivery: 4 merges onto its own key (self-id
    # excluded from the index match), 3 stays rejected
    assert first == replay == {3: False, 4: True}
    rows = read_table(spark, tdir).collect()
    assert sorted(r.vec_id for r in rows) == [1, 2, 4]  # no duplicate keys


def test_centroids_pinned_across_batches(spark, tmp_path):
    tdir = str(tmp_path / "semidx")
    admit_batch(spark, tdir, _batch(spark, [(1, V1), (2, V2)]), n_cells=2)
    with open(os.path.join(tdir, _BOOT_FILE)) as f:
        before = json.load(f)
    admit_batch(spark, tdir, _batch(spark, [(7, V4)]), n_cells=2)
    with open(os.path.join(tdir, _BOOT_FILE)) as f:
        after = json.load(f)
    assert before == after


def test_streaming_fold_matches_sequential(spark, tmp_path):
    src = str(tmp_path / "emb_stream")
    _batch(spark, [(1, V1), (2, V2)]).coalesce(1).write.mode("append").parquet(src)
    _batch(spark, [(3, V3), (4, V4)]).coalesce(1).write.mode("append").parquet(src)

    tdir = str(tmp_path / "semidx_stream")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_semantic_gate_refresh(spark, src, tdir, ckpt, n_cells=2)
    q.awaitTermination(120)
    stored = {r.vec_id for r in read_table(spark, tdir).collect()}
    # 3 near-dups 1 regardless of whether the files land in one or two
    # micro-batches (1 < 3, so the within-batch rule agrees with the
    # vs-index rule)
    assert stored == {1, 2, 4}

    # second run with the same checkpoint: offsets committed, no new
    # files -> no further commits
    v = current_version(tdir)
    q2 = incremental_semantic_gate_refresh(spark, src, tdir, ckpt, n_cells=2)
    q2.awaitTermination(120)
    assert current_version(tdir) == v


def test_atomic_centroid_write_loser_preserves_winner(tmp_path):
    """ADVICE r6: the bootstrap race must be create-once ATOMIC — a
    losing writer returns False and the winner's fully-written content
    survives; no reader can observe a partial file (content is
    hard-linked into place only after fsync)."""
    from metrics_service_spark.streaming.semantic_gate import (
        _load_centroids,
        _write_centroids_atomic,
    )

    tdir = str(tmp_path / "t")
    assert _write_centroids_atomic(tdir, "_c.json", [[1, 2]]) is True
    assert _write_centroids_atomic(tdir, "_c.json", [[9, 9]]) is False
    assert _load_centroids(tdir, "_c.json") == [[1, 2]]
    # no temp droppings left behind
    assert [f for f in os.listdir(tdir) if f.endswith(".tmp")] == []


def test_admit_validates_max_retries(spark, tmp_path):
    with pytest.raises(ValueError, match="max_retries"):
        admit_batch(
            spark,
            str(tmp_path / "t"),
            _batch(spark, [(1, V1)]),
            n_cells=2,
            max_retries=0,
        )


def test_admit_tau_out_of_bounds(spark, tmp_path):
    """ADVICE r7: CLI-reachable tau must be validated against the
    int64 envelope — 99/100 silently wraps den^2*d^2 at the permitted
    dim/|q| bounds and flips verdicts with ANSI off."""
    with pytest.raises(ValueError, match="tau_num=99"):
        admit_batch(
            spark,
            str(tmp_path / "t"),
            _batch(spark, [(1, V1)]),
            n_cells=2,
            tau_num=99,
            tau_den=100,
        )


def test_missing_boot_centroids_on_committed_table_raises(spark, tmp_path):
    """ADVICE r7: a committed table whose (boot) centroid file was
    deleted is CORRUPTION — silently re-seeding from the current batch
    would leave stored rows' cells inconsistent with the new geometry."""
    tdir = str(tmp_path / "semidx")
    admit_batch(spark, tdir, _batch(spark, [(1, V1), (2, V2)]), n_cells=2)
    os.unlink(os.path.join(tdir, _BOOT_FILE))
    with pytest.raises(FileNotFoundError, match="refusing to re-seed"):
        admit_batch(spark, tdir, _batch(spark, [(4, V4)]), n_cells=2)


def test_mutable_ids_rewrite_moved_key_out_of_old_cell(spark, tmp_path):
    """ADVICE r7: re-admitting an existing id with a DIFFERENT
    embedding can assign it a new cell; the default fast path
    (immutable_ids=True) documents that as out of contract, and
    immutable_ids=False runs the global key-probe MERGE so the stale
    row is rewritten out of its old partition — exactly one row per
    key afterwards."""
    tdir = str(tmp_path / "semidx")
    admit_batch(spark, tdir, _batch(spark, [(1, V1), (2, V2)]), n_cells=2)
    cells0 = {r.vec_id: r.cell for r in read_table(spark, tdir).collect()}
    # re-admit id 2 with V4 (orthogonal to everything: admitted, and
    # with 2 cells seeded from (V1, V2) it lands in a different cell
    # than the stored V2 row for the guard to be exercised)
    out = _kept(
        admit_batch(
            spark, tdir, _batch(spark, [(2, V4)]), n_cells=2, immutable_ids=False
        )
    )
    assert out == {2: True}
    rows = read_table(spark, tdir).collect()
    assert sorted(r.vec_id for r in rows) == [1, 2]  # no duplicate key
    new_cell = {r.vec_id: r.cell for r in rows}[2]
    assert new_cell != cells0[2]  # the key genuinely moved partitions


def test_admit_string_ids_bootstrap(spark, tmp_path):
    """ADVICE r6: the empty-index rejection frame must use the batch's
    own id type — string ids previously anti-joined a string __vid
    against a hardcoded `long` column through an implicit cast."""
    tdir = str(tmp_path / "semidx_str")
    rows = [("a", V1), ("b", V2), ("a2", V3)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    got = {r.vec_id: r.kept for r in admit_batch(spark, tdir, df, n_cells=2).collect()}
    # a2 near-dups a within the batch; 'a' < 'a2' so a survives
    assert got == {"a": True, "b": True, "a2": False}
    stored = {r.vec_id for r in read_table(spark, tdir).collect()}
    assert stored == {"a", "b"}


def _grow_rows(n, dim=4, start=100):
    """n deterministic vectors pairwise separated by cos <= 0.985:
    each lives in one of the 12 ordered axis planes at one of three
    angle rings (12/40/68 deg), keyed on the ABSOLUTE id so
    different-start batches don't repeat directions.  Ring angles stay
    away from 45 deg because the MIRRORED plane (b,a) at angle t has
    cos = sin(2t) against (a,b) — at 45 deg they are the same
    direction; the worst surviving pair here is sin(80deg) ~ 0.985."""
    import itertools
    import math as m

    pairs = list(itertools.permutations(range(dim), 2))
    rows = []
    for i in range(n):
        k = start + i
        a, b = pairs[k % len(pairs)]
        theta = m.radians(12 + 28 * ((k // len(pairs)) % 3))
        v = [0.0] * dim
        v[a] = round(m.cos(theta), 4)
        v[b] = round(m.sin(theta), 4)
        rows.append((k, v))
    return rows


def test_centroid_refresh_on_growth_versions_and_consistency(spark, tmp_path):
    """VERDICT r6 #5: 3x corpus growth triggers a re-seed committed as
    ONE pinned overwrite; admission is replay-idempotent across the
    migration; readers of the pre-migration version keep a consistent
    snapshot (their rows AND their geometry file)."""
    from metrics_service_spark.sources.merge_table import manifest_meta
    from metrics_service_spark.streaming.semantic_gate import (
        _BOOT_FILE as BOOT,
        refresh_centroids,
    )

    tdir = str(tmp_path / "semidx_grow")
    tau = dict(tau_num=11, tau_den=11)  # tau=1: only exactly-parallel rejects
    admit_batch(spark, tdir, _batch(spark, _grow_rows(8)), n_cells=2, **tau)
    v0 = current_version(tdir)
    assert manifest_meta(tdir, v0).get("centroid_file") is None  # boot gen

    # no refresh while under budget
    assert refresh_centroids(spark, tdir, target_cell_size=1000) is None

    # grow the corpus ~3x, then refresh with a small budget
    admit_batch(
        spark, tdir, _batch(spark, _grow_rows(16, start=300)), n_cells=2, **tau
    )
    pre_rows = {(r.vec_id, r.cell) for r in read_table(spark, tdir).collect()}
    pre_v = current_version(tdir)
    newv = refresh_centroids(spark, tdir, target_cell_size=4)
    assert newv == pre_v + 1
    meta = manifest_meta(tdir, newv)
    assert meta["centroid_file"] != BOOT and meta["n_cells"] > 2
    assert os.path.exists(os.path.join(tdir, meta["centroid_file"]))

    # old-version reader: identical snapshot, geometry file still there
    old_rows = {(r.vec_id, r.cell) for r in read_table(spark, tdir, version=pre_v).collect()}
    assert old_rows == pre_rows
    assert os.path.exists(os.path.join(tdir, BOOT))

    # same keys survive the migration (only cells move)
    new_rows = {r.vec_id for r in read_table(spark, tdir).collect()}
    assert new_rows == {k for k, _ in pre_rows}

    # admission across the migration: a replayed batch (ids already
    # admitted pre-migration) converges — merges onto its own keys
    # under the NEW geometry, no duplicates, no self-rejection
    replay = admit_batch(
        spark, tdir, _batch(spark, _grow_rows(16, start=300)), n_cells=2, **tau
    )
    kept = {r.vec_id: r.kept for r in replay.collect()}
    stored_after = sorted(r.vec_id for r in read_table(spark, tdir).collect())
    assert stored_after == sorted(new_rows)  # replay added nothing new
    assert all(kept[i] for i in kept if i in new_rows)

    # and a NEW batch admits under the new geometry (cells beyond the
    # boot range are reachable)
    out = admit_batch(spark, tdir, _batch(spark, [(900, V4)]), n_cells=2, **tau)
    assert {r.vec_id: r.kept for r in out.collect()}[900] in (True, False)


def test_streaming_fold_runs_refresh(spark, tmp_path):
    """target_cell_size on the streaming fold: once files push the
    index past budget, the geometry migrates mid-stream and the
    manifest meta names the new generation."""
    from metrics_service_spark.sources.merge_table import manifest_meta

    src = str(tmp_path / "emb_stream2")
    _batch(spark, _grow_rows(6)).coalesce(1).write.mode("append").parquet(src)
    _batch(spark, _grow_rows(18, start=500)).coalesce(1).write.mode("append").parquet(src)

    tdir = str(tmp_path / "semidx_stream2")
    ckpt = str(tmp_path / "ckpt2")
    q = incremental_semantic_gate_refresh(
        spark, src, tdir, ckpt, n_cells=2, target_cell_size=4,
        tau_num=11, tau_den=11,
    )
    q.awaitTermination(180)
    meta = manifest_meta(tdir)
    assert meta.get("centroid_file", "").startswith("_semantic_centroids_")
    assert meta["n_cells"] > 2


def test_admit_racing_migration_retries_under_new_geometry(spark, tmp_path, monkeypatch):
    """Deterministic interleaving of the admit-vs-refresh race: a
    centroid migration commits BETWEEN the admitter's snapshot read
    and its merge.  The admitter's first merge must fail on the pinned
    base, and the retry must re-resolve the NEW geometry (different
    centroid file), re-assign its batch and converge — verdicts
    consistent, no duplicate keys, cells valid under the migrated
    generation."""
    from metrics_service_spark.sources.merge_table import manifest_meta
    from metrics_service_spark.streaming import semantic_gate as sg

    tau = dict(tau_num=11, tau_den=11)
    tdir = str(tmp_path / "semidx_race")
    admit_batch(spark, tdir, _batch(spark, _grow_rows(12)), n_cells=2, **tau)

    real_merge = sg.merge_table
    fired = {"n": 0}

    def racing_merge(spark_, table_dir_, updates, **kw):
        if fired["n"] == 0:
            fired["n"] += 1
            # the racer: corpus outgrew the geometry; migration commits
            # first, bumping the version and the centroid pointer
            newv = sg.refresh_centroids(spark_, table_dir_, target_cell_size=4)
            assert newv is not None
        return real_merge(spark_, table_dir_, updates, **kw)

    monkeypatch.setattr(sg, "merge_table", racing_merge)
    out = admit_batch(
        spark, tdir, _batch(spark, _grow_rows(8, start=700)), n_cells=2, **tau
    )
    kept = {r.vec_id: (r.kept, r.cell) for r in out.collect()}
    assert fired["n"] == 1  # the race actually happened
    assert all(k for k, _ in kept.values())  # distinct directions admit

    meta = manifest_meta(tdir)
    n_cells_new = meta["n_cells"]
    assert n_cells_new > 2
    rows = read_table(spark, tdir).collect()
    ids = sorted(r.vec_id for r in rows)
    assert ids == sorted(set(ids))  # no duplicate keys
    # admitted rows landed with cells of the NEW geometry
    for r in rows:
        assert 0 <= r.cell < n_cells_new
    for vid, (_, cell) in kept.items():
        assert 0 <= cell < n_cells_new


def test_refresh_losing_race_cleans_up_orphan_centroids(spark, tmp_path, monkeypatch):
    """The inverse race: an admit commits between refresh's snapshot
    read and its pinned overwrite.  refresh_centroids must surface
    ConflictError and unlink the centroid generation it staged."""
    from metrics_service_spark.sources.merge_table import ConflictError
    from metrics_service_spark.streaming import semantic_gate as sg

    tau = dict(tau_num=11, tau_den=11)
    tdir = str(tmp_path / "semidx_race2")
    admit_batch(spark, tdir, _batch(spark, _grow_rows(12)), n_cells=2, **tau)

    real_overwrite = sg.overwrite_table

    def racing_overwrite(df, table_dir_, **kw):
        # the racer admits just before the migration's commit
        admit_batch(
            spark, tdir, _batch(spark, _grow_rows(4, start=800)), n_cells=2, **tau
        )
        return real_overwrite(df, table_dir_, **kw)

    monkeypatch.setattr(sg, "overwrite_table", racing_overwrite)
    before = set(os.listdir(tdir))
    with pytest.raises(ConflictError):
        sg.refresh_centroids(spark, tdir, target_cell_size=4)
    after = set(os.listdir(tdir))
    # no orphaned centroid generation left behind (boot file persists)
    new_files = {f for f in after - before if f.startswith("_semantic_centroids_")}
    assert new_files == set()


def test_live_admit_vs_refresh_race(spark, tmp_path):
    """VERDICT r7 #3: a REAL concurrent interleaving — an admitter
    thread streams batches into one table_dir while a maintenance
    thread keeps running refresh_centroids migrations against the same
    dir, with no monkeypatched seams.  Invariants checked at the end:
    every id the admitter saw kept=True is stored EXACTLY once,
    rejected ids never resurface, every stored row's cell is exactly
    its assignment under the FINAL committed geometry, and replaying a
    delivered batch is a verdict-identical no-op on the stored set."""
    import threading

    from metrics_service_spark.sources.merge_table import manifest_meta
    from metrics_service_spark.streaming.semantic_gate import (
        _centroid_fname,
        _load_centroids,
        refresh_centroids,
    )
    from metrics_service_spark.sources.merge_table import ConflictError

    import math as m

    tau = dict(tau_num=11, tau_den=11)  # tau=1: only exactly-parallel rejects
    tdir = str(tmp_path / "semidx_live")

    # every id gets its OWN first-quadrant angle, 1.5 deg apart: no two
    # distinct ids are parallel (nothing legitimately rejects at
    # tau=1), and the spacing survives SEM_QUANT quantization
    slots: dict[int, int] = {}

    def vec(vid: int) -> list[float]:
        slot = slots.setdefault(vid, len(slots))
        th = m.radians(5 + slot * 1.5)
        return [round(m.cos(th), 4), round(m.sin(th), 4), 0.0, 0.0]

    def mk(ids) -> list[tuple[int, list[float]]]:
        return [(vid, vec(vid)) for vid in ids]

    # bootstrap so the refresher has something to migrate from round 1
    boot = mk(range(8))
    admit_batch(spark, tdir, _batch(spark, boot), n_cells=2, **tau)

    batches = [mk(range(100 * (i + 2), 100 * (i + 2) + 8)) for i in range(5)]
    # one duplicated direction: the last batch re-emits the FIRST
    # batch's vector under a new id, so at least one rejection crosses
    # the racing migrations (exactly-parallel => rejected at tau=1)
    dup_src = batches[0][0]
    batches[-1].append((9999, dup_src[1]))
    verdicts: dict[int, bool] = {}
    errors: list[BaseException] = []
    stop = threading.Event()

    def admitter():
        try:
            for b in batches:
                out = admit_batch(
                    spark, tdir, _batch(spark, b), n_cells=2,
                    max_retries=20, **tau,
                )
                verdicts.update(_kept(out))
        except BaseException as ex:  # surface into the main thread
            errors.append(ex)

    def refresher():
        try:
            while not stop.is_set():
                try:
                    # small budget: nearly every cycle wants a migration
                    refresh_centroids(spark, tdir, target_cell_size=4)
                except ConflictError:
                    pass  # an admit won the race; next cycle retries
        except BaseException as ex:
            errors.append(ex)

    ta = threading.Thread(target=admitter)
    tr = threading.Thread(target=refresher)
    ta.start(); tr.start()
    ta.join(timeout=600)
    stop.set()
    tr.join(timeout=600)
    assert not ta.is_alive() and not tr.is_alive()
    assert not errors, errors

    # the duplicated direction was rejected; everything else admitted
    assert verdicts[9999] is False
    admitted = {k for k, kept in verdicts.items() if kept}
    assert admitted == {k for b in batches for k, _ in b} - {9999}

    rows = read_table(spark, tdir).collect()
    ids = sorted(r.vec_id for r in rows)
    assert ids == sorted(set(ids)), "duplicate keys in the index"
    bootstrap_ids = {k for k, _ in boot}
    assert set(ids) == admitted | bootstrap_ids

    # at least one migration genuinely committed while admits flowed
    final_meta = manifest_meta(tdir)
    assert final_meta.get("centroid_file", "").startswith(
        "_semantic_centroids_"
    ), "no migration ever committed — the race was not exercised"

    # final-geometry consistency: every stored row's cell equals its
    # assignment under the centroids the final manifest names
    final_v = current_version(tdir)
    cvecs = _load_centroids(tdir, _centroid_fname(tdir, final_v))
    stored = read_table(spark, tdir, version=final_v)
    # qv is already quantized -> assign via the raw argmax directly
    from metrics_service_spark.operators.similarity import _argmax_cells

    expect = {
        r["__vid"]: r["cell"]
        for r in _argmax_cells(
            stored.select(
                F.col("vec_id").alias("__vid"), F.col("qv").alias("__v")
            ),
            cvecs,
        ).collect()
    }
    got = {r.vec_id: r.cell for r in rows}
    assert got == expect, "stored cells inconsistent with final geometry"

    # replay of a delivered batch: verdicts identical, stored set unchanged
    replay = _kept(
        admit_batch(
            spark, tdir, _batch(spark, batches[-1]), n_cells=2,
            max_retries=20, **tau,
        )
    )
    for k, _ in batches[-1]:
        assert replay[k] == verdicts[k], k
    ids_after = sorted(
        r.vec_id for r in read_table(spark, tdir).collect()
    )
    assert ids_after == ids
