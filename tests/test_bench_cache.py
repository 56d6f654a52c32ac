"""Bench cache fingerprinting (VERDICT r3 #3): a cached timing only counts
under the code/env fingerprint it was measured with — editing a dependency
file invalidates the entry, so bench reports a regression instead of
min()-merging it away against history.

These tests drive bench.py's cache layer directly (no TPU, no phases).
"""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_under_test", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "CACHE_PATH", tmp_path / "cache.json")
    yield mod
    sys.modules.pop("bench_under_test", None)


def test_fingerprint_changes_with_env(bench, monkeypatch):
    fp_vae = bench._fingerprint("vae")
    fp_train = bench._fingerprint("train")  # captured BEFORE the setenv
    monkeypatch.setenv("ORV_TPU_UPSAMPLE_PHASE", "0")
    assert bench._fingerprint("vae") != fp_vae
    # an env knob a phase does not depend on must NOT perturb it
    assert bench._fingerprint("train") == fp_train


def test_fingerprint_changes_with_source(bench, monkeypatch, tmp_path):
    fp0 = bench._fingerprint("vae")
    # point the repo root at a copy with an edited vae.py
    fake = tmp_path / "repo"
    (fake / "orv_tpu" / "models").mkdir(parents=True)
    (fake / "bench_phases.py").write_bytes((REPO / "bench_phases.py").read_bytes())
    (fake / "orv_tpu" / "models" / "vae.py").write_bytes(
        (REPO / "orv_tpu" / "models" / "vae.py").read_bytes() + b"\n# edited\n")
    monkeypatch.setattr(bench, "_REPO", fake)
    assert bench._fingerprint("vae") != fp0


def test_fingerprint_ignores_orchestration_edits(bench, monkeypatch, tmp_path):
    """Round-4 trap: editing the monolithic bench.py invalidated every
    cached timing even for emit-policy-only changes, and the round's
    artifact went null. Measurement definitions now live in
    bench_phases.py; bench.py (orchestration) is in NO phase fingerprint."""
    for phase in bench.PHASE_DEPS:
        files, _ = bench.PHASE_DEPS[phase]
        assert "bench.py" not in files
        assert "bench_phases.py" in files


def test_cache_get_rejects_mismatched_fingerprint(bench):
    cache = {"vae_decode_s": {"t": 1.73, "fp": "aaaa"}}
    assert bench._cache_get(cache, "vae_decode_s", "aaaa") == 1.73
    assert bench._cache_get(cache, "vae_decode_s", "bbbb") is None
    assert bench._cache_get(cache, "missing", "aaaa") is None


def test_legacy_v1_entries_migrate_with_null_fp(bench):
    bench.CACHE_PATH.write_text(json.dumps({"vae_decode_s": 1.73}))
    cache = bench._load_cache()
    assert cache["vae_decode_s"] == {"t": 1.73, "fp": None}
    # a null fp never matches a real fingerprint -> legacy numbers are
    # "for unknown code" and cannot stand in for a fresh measurement
    assert bench._cache_get(cache, "vae_decode_s", bench._fingerprint("vae")) is None


def test_save_merges_min_only_within_same_fp(bench):
    # on disk: an OLD-code best of 1.0s
    bench.CACHE_PATH.write_text(json.dumps({"vae_decode_s": {"t": 1.0, "fp": "old"}}))
    # in memory: the current code MEASURED slower (a regression) — _store
    # marks it fresh, which grants the cross-fp override
    cache = {}
    bench._store(cache, "vae_decode_s", "new", 2.5)
    bench._save_cache(cache)
    on_disk = json.loads(bench.CACHE_PATH.read_text())
    # the regression is recorded; the old-code 1.0 does NOT win
    assert on_disk["vae_decode_s"] == {"t": 2.5, "fp": "new"}

    # same fingerprint: best-of-both survives (overlapping runs)
    bench.CACHE_PATH.write_text(json.dumps({"vae_decode_s": {"t": 2.0, "fp": "new"}}))
    cache = {"vae_decode_s": {"t": 2.5, "fp": "new"}}
    bench._save_cache(cache)
    on_disk = json.loads(bench.CACHE_PATH.read_text())
    assert on_disk["vae_decode_s"]["t"] == 2.0


def test_save_preserves_unmeasured_keys(bench):
    bench.CACHE_PATH.write_text(json.dumps({"train_step_s": {"t": 0.42, "fp": "x"}}))
    cache = {"sampler_s": {"t": 11.0, "fp": "y"}}
    bench._save_cache(cache)
    on_disk = json.loads(bench.CACHE_PATH.read_text())
    assert set(on_disk) == {"train_step_s", "sampler_s"}


def test_rung_entries_are_last_write_wins(bench):
    # the ladder descended to rung 1 last run; this run re-proved rung 0
    bench.CACHE_PATH.write_text(
        json.dumps({"vae_decode_s_rung": {"t": 0, "fp": "new"}}))
    cache = {"vae_decode_s_rung": {"t": 1, "fp": "new"}}
    bench._save_cache(cache)
    on_disk = json.loads(bench.CACHE_PATH.read_text())
    # min() would pin the optimistic rung 0 forever — last observation wins
    assert on_disk["vae_decode_s_rung"]["t"] == 1


def test_ladder_starts_at_last_known_good_rung(bench, monkeypatch):
    """VERDICT r3 weak #5: the VAE ladder consults the cache and starts at
    the rung that last produced a sane timing instead of re-proving the
    chunk-6 OOM (+25-min recompile) under co-tenant HBM pressure."""
    fp = bench._fingerprint("vae")
    runs = []

    def fake_run(phase, extra, timeout):
        runs.append(extra)
        return 1.8  # sane (< SANE["vae"] = 4.0)

    monkeypatch.setattr(bench, "_run_phase_subprocess", fake_run)
    cache = {"vae_decode_s_rung": {"t": 1, "fp": fp}}
    val, sane = bench._phase_with_retries("vae", cache,
                                          ladder=[(6,), (4,), (2,), (0,)])
    assert (val, sane) == (1.8, True)
    assert runs == [(4,)]  # started at rung 1, not rung 0
    # success PROMOTES one rung: next run retries the faster footprint
    assert cache["vae_decode_s_rung"]["t"] == 0
    assert cache["vae_decode_s_rung"]["fp"] == fp
    assert cache["vae_decode_s"]["args"] == ["4"]  # chunk provenance
    # a mismatched fingerprint resets to rung 0
    runs.clear()
    cache = {"vae_decode_s_rung": {"t": 2, "fp": "stale"}}
    bench._phase_with_retries("vae", cache, ladder=[(6,), (4,), (2,), (0,)])
    assert runs == [(6,)]
    assert cache["vae_decode_s_rung"]["t"] == 0
    assert cache["vae_decode_s_rung"]["fp"] == fp


def test_ladder_persists_rung_on_oom(bench, monkeypatch):
    """An OOM persists the descended rung immediately (the warming queue's
    next cycle must not re-prove the held rungs), and a later sane success
    promotes one rung back up."""
    fp = bench._fingerprint("vae")
    runs = []

    def fake_run(phase, extra, timeout):
        runs.append(extra)
        if extra in ((6,), (4,)):
            raise bench._PhaseOOM("oom")
        return 2.2  # sane at chunk 2

    monkeypatch.setattr(bench, "_run_phase_subprocess", fake_run)
    cache = {}
    val, sane = bench._phase_with_retries(
        "vae", cache, ladder=[(6,), (4,), (2,), (0,)], max_attempts=4)
    assert (val, sane) == (2.2, True)
    assert runs == [(6,), (4,), (2,)]
    # descents were persisted along the way; the final success stores
    # rung-1 so the next run retries chunk 4 (one cheap OOM if still held)
    assert cache["vae_decode_s_rung"]["t"] == 1
    assert cache["vae_decode_s"]["t"] == 2.2
    assert cache["vae_decode_s"]["args"] == ["2"]


def test_phase_mode_saves_sane_result_to_cache(bench, monkeypatch):
    """`bench.py --phase X` (the on-chip A/B queue) persists sane timings
    under the current fingerprint so queue runs warm the cache the full
    bench reads — the round-4 queue measured 11.009s that never landed."""
    monkeypatch.setitem(bench.PHASE_FNS, "sampler", lambda args=(): 11.009)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--phase", "sampler"])
    bench.main()
    on_disk = json.loads(bench.CACHE_PATH.read_text())
    assert on_disk["sampler_s"] == {"t": 11.009,
                                    "fp": bench._fingerprint("sampler")}
    # an insane (contended-window) figure must NOT enter the cache
    bench.CACHE_PATH.unlink()
    monkeypatch.setitem(bench.PHASE_FNS, "sampler", lambda args=(): 250.0)
    bench.main()
    assert not bench.CACHE_PATH.exists()
