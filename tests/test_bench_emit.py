"""bench.py emit-policy and cache-merge unit tests (round-5 VERDICT #1).

The round-4 driver artifact was `value: null` (cold fingerprint cache +
contended chip), and a later emit published a contended-window 90 s decode
as the headline. These tests pin the corrected policy:

- `value` is composed ONLY of sane current-fingerprint timings;
- a cold-cache run still emits `stale_estimate` + provenance, never an
  information-free null;
- a contended (> SANE) measurement never enters `value`;
- the cache merge only lets entries measured by THIS process clobber a
  different-fingerprint on-disk entry (ADVICE r4 medium);
- `--phase` runs with non-default args never auto-cache under the
  headline key (ADVICE r4 low).

No TPU/jax computation: bench._compose is pure given its inputs.
"""

import importlib
import json
import sys
import types

import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
import bench_phases  # noqa: E402


@pytest.fixture()
def no_device_probe(monkeypatch):
    monkeypatch.setattr(bench, "_device_str", lambda: "<test>")


def _fp(phase):
    return bench._fingerprint(phase)


def test_cold_cache_emit_has_stale_estimate(no_device_probe):
    """r4 regression: cold fingerprint cache (old-code entries only) + no
    fresh measurements must NOT produce an information-free line: value is
    null (strictly fresh-only) but stale_estimate + provenance are there."""
    cache = {
        "sampler_s": {"t": 11.0, "fp": "deadbeef0000"},  # old-code entry
        "vae_decode_s": {"t": 1.73, "fp": None},          # legacy entry
    }
    out = bench._compose({}, {}, cache, ["sampler", "vae", "train"])
    assert out["value"] is None
    assert out["vs_baseline"] is None
    assert out["stale_estimate"] == pytest.approx(49 / (11.0 + 1.73), rel=1e-3)
    d = out["detail"]
    assert d["stale_estimate_basis"] == {"sampler": "cache_old_code",
                                         "vae": "cache_old_code"}
    assert d["measured_this_run"]["sampler"] is False
    assert d["measured_this_run"]["vae"] is False
    assert d["incomplete"] == ["sampler", "vae", "train"]
    json.dumps(out)  # emit shape must be JSON-serializable


def test_contended_vae_never_pollutes_value(no_device_probe):
    """r4 regression (16:41 emit): a 90 s contended-window decode must not
    become the headline value; it is reported separately and only feeds
    stale_estimate when nothing better exists."""
    cache = {"sampler_s": {"t": 11.0, "fp": _fp("sampler")}}
    out = bench._compose({"sampler": 11.0}, {"vae": 90.9}, cache, ["train"])
    assert out["value"] is None  # no sane vae under the current fingerprint
    assert out["detail"]["vae_decode_s_contended"] == pytest.approx(90.9)
    assert out["detail"]["vae_contended_window"] is True
    # the estimate exists, built from the contended figure (flagged)
    assert out["stale_estimate"] == pytest.approx(49 / (11.0 + 90.9), rel=1e-3)
    assert out["detail"]["stale_estimate_basis"]["vae"] == "contended_window"
    assert out["detail"]["measured_this_run"]["vae"] is True


def test_contended_vae_prefers_old_cache_estimate(no_device_probe):
    """With an old-code quiet-window decode on record, the estimate uses it
    rather than the contended measurement (better proxy for current code)."""
    cache = {
        "sampler_s": {"t": 11.0, "fp": _fp("sampler")},
        "vae_decode_s": {"t": 1.73, "fp": "oldcode000000"},
    }
    out = bench._compose({"sampler": 11.0}, {"vae": 90.9}, cache, [])
    assert out["value"] is None
    assert out["stale_estimate"] == pytest.approx(49 / (11.0 + 1.73), rel=1e-3)
    assert out["detail"]["stale_estimate_basis"]["vae"] == "cache_old_code"
    assert out["detail"]["vae_decode_s_contended"] == pytest.approx(90.9)


def test_fresh_and_cached_value_composition(no_device_probe):
    """A fresh sampler + current-fp cached vae compose a non-null value with
    the vae flagged stale (not measured this run) but NOT old-code."""
    cache = {"vae_decode_s": {"t": 1.73, "fp": _fp("vae"), "args": ["6"]}}
    out = bench._compose({"sampler": 11.0}, {}, cache, [])
    assert out["value"] == pytest.approx(49 / (11.0 + 1.73), rel=1e-3)
    assert out["vs_baseline"] == pytest.approx(out["value"] / 1.55, rel=1e-3)
    assert "stale_estimate" not in out
    d = out["detail"]
    assert d["stale"] == ["vae"]
    assert d["vae_decode_chunk"] == 6
    assert d["measured_this_run"]["sampler"] is True
    assert d["measured_this_run"]["vae"] is False


def test_train_detail_reports_mfu(no_device_probe):
    cache = {
        "sampler_s": {"t": 11.0, "fp": _fp("sampler")},
        "vae_decode_s": {"t": 1.73, "fp": _fp("vae")},
        "train_step_s": {"t": 0.42, "fp": _fp("train")},
        "train_step_s_b4": {"t": 1.5, "fp": _fp("train_b4")},
    }
    out = bench._compose({}, {}, cache, [])
    d = out["detail"]
    assert d["train_step_s_1p4b_17f"] == pytest.approx(0.42)
    expect_mfu = (100.0 * 6 * bench_phases.TRAIN_N_PARAMS * 3226 / 0.42
                  / bench_phases.V5E_BF16_PEAK)
    assert d["train_mfu_pct"] == pytest.approx(expect_mfu, abs=0.06)
    # b4: 4x the tokens per step
    expect_b4 = (100.0 * 6 * bench_phases.TRAIN_N_PARAMS * 4 * 3226 / 1.5
                 / bench_phases.V5E_BF16_PEAK)
    assert d["train_mfu_pct_b4"] == pytest.approx(expect_b4, abs=0.06)
    assert d["train_tokens_per_s_b4"] == round(4 * 3226 / 1.5)


def test_save_cache_fresh_flag_merge(tmp_path, monkeypatch):
    """Cross-fingerprint merge: an entry merely LOADED at startup must not
    clobber a different-fp entry landed on disk by a concurrent run; an
    entry MEASURED by this process must (regression is reported, not
    hidden). ADVICE r4 medium — the documented invariant, now implemented."""
    cache_path = tmp_path / "cache.json"
    monkeypatch.setattr(bench, "CACHE_PATH", cache_path)

    # 1) concurrent run lands a fresh fp-B entry on disk
    cache_path.write_text(json.dumps({"sampler_s": {"t": 10.0, "fp": "B"}}))
    # 2) this process loaded {fp: A} at startup (stale code) and never
    #    re-measured: on-disk B must survive
    mem = {"sampler_s": {"t": 11.0, "fp": "A"}}
    bench._save_cache(mem)
    on_disk = json.loads(cache_path.read_text())
    assert on_disk["sampler_s"] == {"t": 10.0, "fp": "B"}

    # 3) this process MEASURED under fp C: it wins over on-disk B
    mem = {}
    bench._store(mem, "sampler_s", "C", 12.0)
    bench._save_cache(mem)
    on_disk = json.loads(cache_path.read_text())
    assert on_disk["sampler_s"]["fp"] == "C"
    assert on_disk["sampler_s"]["t"] == pytest.approx(12.0)
    assert "fresh" not in on_disk["sampler_s"]  # stripped before writing

    # 4) same-fingerprint entries min-merge
    cache_path.write_text(json.dumps({"sampler_s": {"t": 9.0, "fp": "C"}}))
    mem = {}
    bench._store(mem, "sampler_s", "C", 12.0)
    bench._save_cache(mem)
    assert json.loads(cache_path.read_text())["sampler_s"]["t"] == pytest.approx(9.0)

    # 5) rung keys: last observation wins even when larger
    cache_path.write_text(json.dumps({"vae_decode_s_rung": {"t": 0, "fp": "C"}}))
    mem = {}
    bench._store(mem, "vae_decode_s_rung", "C", 2)
    bench._save_cache(mem)
    assert json.loads(cache_path.read_text())["vae_decode_s_rung"]["t"] == 2


def test_phase_auto_cache_skips_non_default_args(tmp_path, monkeypatch):
    """`bench.py --phase vae 2` must not warm the headline (chunk-6) cache
    key (ADVICE r4 low); default args (or none) do."""
    cache_path = tmp_path / "cache.json"
    monkeypatch.setattr(bench, "CACHE_PATH", cache_path)
    monkeypatch.setattr(bench, "PHASE_FNS",
                        {"vae": lambda args=(): 1.5})

    monkeypatch.setattr(sys, "argv", ["bench.py", "--phase", "vae", "2"])
    bench.main()
    assert not cache_path.exists() or "vae_decode_s" not in json.loads(
        cache_path.read_text())

    monkeypatch.setattr(sys, "argv", ["bench.py", "--phase", "vae", "6"])
    bench.main()
    ent = json.loads(cache_path.read_text())["vae_decode_s"]
    assert ent["t"] == pytest.approx(1.5)
    assert ent["fp"] == _fp("vae")
    assert ent["args"] == ["6"]


def test_dryrun_full_remat_gate_unit():
    """The gate helper raises on a planted GSPMD warning line and the
    fd-level capture sees C++-side (fd 2) writes — together these make the
    body-level gate un-bypassable on the inline path (VERDICT r4 weak #2)."""
    import os

    import __graft_entry__ as g

    with pytest.raises(RuntimeError, match="full-rematerialization"):
        g._assert_no_full_remat(
            "ok line\nW0819 [SPMD] Involuntary full rematerialization. The "
            "compiler cannot go from sharding X to Y\nok line 2\n")
    g._assert_no_full_remat("clean\n")  # no raise

    captured = g._capture_stderr_fd(
        lambda: os.write(2, b"W [SPMD] Involuntary full rematerialization "
                            b"planted-from-fd2\n"))
    assert "planted-from-fd2" in captured
    with pytest.raises(RuntimeError, match="full-rematerialization"):
        g._assert_no_full_remat(captured)


def test_ladder_rung_sane_slack(tmp_path, monkeypatch):
    """Descended ladder rungs get a rung-aware sane ceiling: SANE['vae']
    (4.0 s) is calibrated for the chunk-6 headline, but a QUIET-window
    chunk-2 decode is genuinely slower — a flat ceiling could reject every
    measurement the persisted rung can produce and deadlock the ladder
    under a long co-tenant hold (observed r5: rung pinned at chunk-2,
    three honest-but-contended 39 s reads, no promotion path)."""
    cache_path = tmp_path / "cache.json"
    monkeypatch.setattr(bench, "CACHE_PATH", cache_path)
    ladder = [(6,), (4,), (2,), (0,)]
    fp = _fp("vae")

    # persisted rung 2 (chunk-2); a quiet-window 5.5 s chunk-2 measurement
    # exceeds flat SANE (4.0) but passes the slacked ceiling (4.0*1.75=7.0)
    cache = {}
    bench._store(cache, "vae_decode_s_rung", fp, 2)
    monkeypatch.setattr(bench, "_run_phase_subprocess",
                        lambda phase, extra, timeout: 5.5)
    val, sane = bench._phase_with_retries("vae", cache, ladder=ladder,
                                          max_attempts=4)
    assert (val, sane) == (5.5, True)
    ent = bench._cache_entry(cache, "vae_decode_s", fp)
    assert ent["t"] == pytest.approx(5.5)
    assert list(ent["args"]) == ["2"]  # chunk provenance rides into the emit
    # sane success promotes the rung one step up for the next window
    assert bench._cache_get(cache, "vae_decode_s_rung", fp) == 1

    # a contended window (39 s) still fails every rung's ceiling: no
    # headline write, sane=False
    cache = {}
    bench._store(cache, "vae_decode_s_rung", fp, 2)
    monkeypatch.setattr(bench, "_run_phase_subprocess",
                        lambda phase, extra, timeout: 39.0)
    val, sane = bench._phase_with_retries("vae", cache, ladder=ladder,
                                          max_attempts=3)
    assert (val, sane) == (39.0, False)
    assert bench._cache_entry(cache, "vae_decode_s", fp) is None

    # flat-rung phases (no ladder) keep the plain SANE ceiling
    monkeypatch.setattr(bench, "_run_phase_subprocess",
                        lambda phase, extra, timeout: 26.0)
    val, sane = bench._phase_with_retries("sampler", {}, max_attempts=1)
    assert (val, sane) == (26.0, False)


def test_ladder_timeout_descends_rung(tmp_path, monkeypatch):
    """A trial that exceeds its wall-clock timeout advances the ladder like
    an OOM (it is definitionally not sane; a smaller footprint competes
    better for HBM) instead of burning every attempt on the same rung —
    r5 observed one contended chunk-2 trial eat 935 s of a 2400 s budget
    while the tiled rung answered in 72 s under the same load."""
    cache_path = tmp_path / "cache.json"
    monkeypatch.setattr(bench, "CACHE_PATH", cache_path)
    ladder = [(6,), (4,), (2,), (0,)]
    fp = _fp("vae")
    cache = {}
    bench._store(cache, "vae_decode_s_rung", fp, 2)

    calls = []

    def fake_run(phase, extra, timeout):
        calls.append((tuple(extra), timeout))
        if tuple(extra) == (2,):
            raise bench._PhaseTimeout("phase vae timed out after 700s")
        return 8.0  # tiled rung, under its slacked ceiling 4.0*2.75=11.0

    monkeypatch.setattr(bench, "_run_phase_subprocess", fake_run)
    val, sane = bench._phase_with_retries("vae", cache, ladder=ladder,
                                          max_attempts=4)
    assert (val, sane) == (8.0, True)
    assert [c[0] for c in calls] == [(2,), (0,)]
    # descended rungs run under the tighter 700 s wall
    assert all(t <= 700.0 for _, t in calls)
    ent = bench._cache_entry(cache, "vae_decode_s", fp)
    assert ent["t"] == pytest.approx(8.0)
    assert list(ent["args"]) == ["0"]
