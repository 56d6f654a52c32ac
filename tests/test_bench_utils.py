"""Unit tests for bench.py's cache/report plumbing and the eval manifest
merge — the pieces the driver's record depends on (no TPU, no model)."""

import importlib.util
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load_bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_under_test", ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "CACHE_PATH", tmp_path / ".bench_cache.json")
    # keep _emit from initializing the (tunneled) TPU backend via jax.devices()
    monkeypatch.setattr(mod, "_DEVICE_STR", "cpu-test")
    return mod


def test_save_cache_keeps_best_of_both(tmp_path, monkeypatch):
    bench = _load_bench(tmp_path, monkeypatch)
    # another (overlapping) run wrote a BETTER vae number to disk under the
    # SAME fingerprint (cross-fingerprint merging is covered by
    # test_bench_cache.py)
    bench.CACHE_PATH.write_text(json.dumps(
        {"vae_decode_s": {"t": 1.60, "fp": "v"},
         "train_step_s": {"t": 0.5, "fp": "t"}}))
    cache = {"vae_decode_s": {"t": 1.70, "fp": "v"},
             "sampler_s": {"t": 11.7, "fp": "s"}}
    bench._save_cache(cache)
    on_disk = json.loads(bench.CACHE_PATH.read_text())
    assert on_disk["vae_decode_s"]["t"] == 1.60  # same-fp best-so-far wins
    assert on_disk["sampler_s"]["t"] == 11.7  # new keys land
    assert on_disk["train_step_s"]["t"] == 0.5  # unmeasured keys survive


def test_emit_stale_and_fresh(tmp_path, monkeypatch, capsys):
    bench = _load_bench(tmp_path, monkeypatch)
    cache = {"sampler_s": {"t": 12.0, "fp": bench._fingerprint("sampler")},
             "vae_decode_s": {"t": 1.8, "fp": bench._fingerprint("vae")}}
    bench._emit({"sampler": 11.5}, {}, cache, ["vae", "train"])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] > 0
    assert line["detail"]["sampler_s"] == 11.5  # fresh beats cache
    assert line["detail"]["stale"] == ["vae"]
    # a cache stand-in says nothing about the current window (ADVICE r3 #3):
    # the contended-window flag is only emitted for this-run measurements
    assert "vae_contended_window" not in line["detail"]
    assert line["detail"]["incomplete"] == ["vae", "train"]
    assert line["baseline_is_estimate"] is True


def test_emit_always_leaves_a_line(tmp_path, monkeypatch, capsys):
    """Round-5 policy: even with nothing reportable, the emit leaves a
    parseable null-value line with an error field — a kill at any point
    leaves the driver a valid (if empty) record."""
    bench = _load_bench(tmp_path, monkeypatch)
    bench._emit({"train": 0.5}, {}, {}, ["sampler", "vae"])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] is None
    assert "sampler" in line["detail"]["error"]
    assert line["detail"]["partial"] == {"train": 0.5}
    assert line["detail"]["measured_this_run"]["train"] is True


def test_merge_manifests_skips_stale_and_cascaded(tmp_path):
    from orv_tpu.pipelines.evaluate import _merge_manifests

    (tmp_path / "manifest_0.json").write_text(json.dumps(["a", "b"]))
    (tmp_path / "manifest_1.json").write_text(json.dumps(["c"]))
    # stale shard from an earlier 4-process run + a cascaded manifest
    (tmp_path / "manifest_2.json").write_text(json.dumps(["stale"]))
    (tmp_path / "manifest_cascaded.json").write_text(json.dumps(["casc"]))
    _merge_manifests(tmp_path, n_proc=1, pid=0)
    assert json.loads((tmp_path / "manifest.json").read_text()) == ["a", "b"]
    _merge_manifests(tmp_path, n_proc=2, pid=0)
    assert json.loads((tmp_path / "manifest.json").read_text()) == ["a", "b", "c"]
