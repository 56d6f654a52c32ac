"""Headline benchmark: frames/sec/chip for 49-frame 320x480
occupancy-conditioned generation with the 2B ControlDiT (BASELINE.md
generation config; the reference eval configs run guidance_scale=1.0 so
there is no CFG batch).

The inference figure is the REAL serving path: `make_sampler`'s jitted
50-step DPM denoise scan (scheduler math, noise injection, per-step
image-latent concat — pipelines/sample.py) on the int8-serving model
(W8A8 linears + int8-QK^T flash attention, models/quantize.py), plus the
conv-cached chunked VAE decode. A train-throughput phase (fwd+bwd+adamw,
remat) is reported in `detail`. Phase definitions live in bench_phases.py
(the fingerprinted measurement definition); this file is orchestration
only and may be edited without invalidating cached timings.

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...} —
**the last line printed is the result**. The chip is multi-tenant and the
driver enforces an outer timeout, so this script is deadline-proof:

- a best-so-far JSON line is printed at startup (from `.bench_cache.json`)
  and again after EVERY completed phase, so a kill at any point leaves a
  parseable result;
- one global wall-clock budget (ORV_TPU_BENCH_BUDGET_S, default 840s)
  bounds everything; phases that didn't run are listed in `"incomplete"`;
- RESOURCE_EXHAUSTED descends the VAE chunk ladder (6->4->2->tiled)
  immediately in a fresh subprocess — no sleeps;
- quiet-window timings persist in `.bench_cache.json`, fingerprinted on
  the sources that define each phase (bench_phases.PHASE_DEPS).

Emit policy (round-5 VERDICT #1):

- `value` is composed ONLY of sane timings measured under the CURRENT
  code fingerprint — this run (detail.measured_this_run[phase]=true) or a
  cached quiet-window run of byte-identical code (listed in detail.stale).
  A contended-window timing (> SANE ceiling) NEVER enters `value`, and
  neither does a cache entry from since-edited code.
- when `value` cannot be composed, it is null BUT the line still carries
  `stale_estimate` — a best-effort f/s built from old-code cache entries
  and/or contended-window measurements, with per-phase provenance in
  detail.stale_estimate_basis — so a cold-cache driver run is never
  information-free.
- detail.measured_this_run records, for every phase, whether a timing was
  measured by THIS process (fresh), as opposed to any cache.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is an engineering estimate of the reference stack on one
A100-80GB: ~7.4e13 transformer FLOPs/step-call at ~40% MFU of 312 bf16
TFLOP/s (torch SDPA + diffusers, no compile) -> 0.59s/call -> 50 calls +
~2s VAE decode -> ~1.55 f/s. Both numbers use the same counting, and the
JSON carries `"baseline_is_estimate": true` so the ratio is never
mistaken for a measured-vs-measured figure.
"""

import hashlib
import json
import os
import pathlib
import subprocess
import sys
import time

import jax

# Persistent compilation cache: compiles through the remote tunnel cost
# 40-300s each; the cache survives across processes so the driver's runs
# reuse this session's compiles.
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

_here = str(pathlib.Path(__file__).parent)
if _here not in sys.path:  # spec-loaded under tests: make bench_phases importable
    sys.path.insert(0, _here)

from bench_phases import (  # noqa: E402
    A100_BASELINE_FPS, NUM_FRAMES, PHASE_DEFAULT_ARGS, PHASE_DEPS, PHASE_FNS,
    PHASE_KEY, SANE, STEPS, TRAIN_N_PARAMS, TRAIN_TOKENS_PER_SAMPLE,
    V5E_BF16_PEAK,
)

START = time.time()
GLOBAL_BUDGET_S = float(os.environ.get("ORV_TPU_BENCH_BUDGET_S", "840"))
CACHE_PATH = pathlib.Path(__file__).parent / ".bench_cache.json"
_REPO = pathlib.Path(__file__).parent

_METRIC = ("frames/sec/chip (49x320x480 occupancy-conditioned, 2B DiT, "
           "50-step sampler)")


def _fingerprint(phase: str) -> str:
    files, envs = PHASE_DEPS[phase]
    h = hashlib.sha256()
    for f in sorted(files):
        try:
            h.update((_REPO / f).read_bytes())
        except OSError:
            h.update(b"<missing>")
        h.update(b"\0")
    for e in sorted(envs):
        h.update(f"{e}={os.environ.get(e, '')}".encode())
    return h.hexdigest()[:12]


# Quiet-window slowdown bounds for descended ladder rungs. SANE[phase] is
# calibrated for the headline rung (decode chunk-6 measured 1.73s quiet →
# 4.0s ceiling); the descended footprints are GENUINELY slower even on an
# idle chip (chunk-2 runs 7 conv-cache chunks instead of 3; the tiled
# last-resort path more), so a flat ceiling would reject a quiet-window
# measurement from a descended rung and the ladder could neither land a
# fresh headline nor promote back up. A slacked rung that passes is still
# an honest measurement — it is cached with its args so the emit reports
# `vae_decode_chunk` provenance and a later faster rung overwrites it.
_RUNG_SLACK = {
    ("vae", (4,)): 1.25, ("vae", (2,)): 1.75, ("vae", (0,)): 2.75,
    ("encode", (4,)): 1.25, ("encode", (2,)): 1.75,
}


def _rung_slack(phase: str, extra) -> float:
    return _RUNG_SLACK.get((phase, tuple(extra)), 1.0)


def _remaining() -> float:
    return GLOBAL_BUDGET_S - (time.time() - START)


def _load_cache() -> dict:
    """Load the cache: {key: {"t": seconds, "fp": fingerprint, "args": [...]}}.

    Legacy entries (bare floats, no fingerprint) are migrated with
    fp=None, which never matches a current fingerprint — they surface only
    through the stale_estimate fallback and are replaced on first fresh
    measurement. Loaded entries are by definition NOT "fresh" (see
    _save_cache): only a timing measured by this process may clobber a
    different-fingerprint entry another process landed on disk meanwhile."""
    try:
        raw = json.loads(CACHE_PATH.read_text())
    except Exception:  # noqa: BLE001 — missing/corrupt cache is a cold start
        return {}
    cache = {}
    for k, v in raw.items():
        if isinstance(v, dict) and "t" in v:
            ent = {"t": float(v["t"]), "fp": v.get("fp")}
            if v.get("args"):
                ent["args"] = list(v["args"])
            cache[k] = ent
        elif isinstance(v, (int, float)):
            cache[k] = {"t": float(v), "fp": None}
    return cache


def _cache_entry(cache: dict, key: str, fp: str):
    """Cache entry for `key` under the CURRENT fingerprint, or None if
    absent or measured under different code/env (a stale-code number is
    worse than no number in `value`: it can mask a regression)."""
    ent = cache.get(key)
    if ent is None or ent.get("fp") != fp:
        return None
    return ent


def _cache_get(cache: dict, key: str, fp: str):
    ent = _cache_entry(cache, key, fp)
    return None if ent is None else float(ent["t"])


def _store(cache: dict, key: str, fp: str, t: float, args=None) -> None:
    """Record a timing measured BY THIS PROCESS ("fresh" — grants the
    right to clobber a different-fingerprint on-disk entry in _save_cache)."""
    ent = {"t": round(float(t), 4), "fp": fp, "fresh": True}
    if args:
        ent["args"] = [str(a) for a in args]
    cache[key] = ent


def _save_cache(cache: dict) -> None:
    try:
        on_disk = _load_cache()
        merged = {}
        for k in set(cache) | set(on_disk):
            mem, disk = cache.get(k), on_disk.get(k)
            if mem is None or disk is None:
                merged[k] = mem or disk
            elif mem.get("fp") == disk.get("fp"):
                if k.endswith("_rung"):
                    # *_rung entries record the last ladder rung that worked —
                    # last observation wins, min() would pin the optimistic rung
                    merged[k] = mem
                else:
                    merged[k] = mem if mem["t"] <= disk["t"] else disk
            else:
                # cross-fingerprint conflict: only an entry MEASURED BY THIS
                # PROCESS may override — an entry merely loaded at startup
                # must not clobber a fresher timing a concurrent run landed
                # on disk meanwhile (round-4 ADVICE: the warm-the-cache
                # queue thrashed against long-running full benches)
                merged[k] = mem if mem.get("fresh") else disk
        out = {k: {kk: vv for kk, vv in v.items() if kk != "fresh"}
               for k, v in merged.items() if v is not None}
        CACHE_PATH.write_text(json.dumps(out, indent=1) + "\n")
    except OSError:
        pass  # read-only checkout: cache is an optimization, not a requirement


class _PhaseOOM(RuntimeError):
    pass


class _PhaseTimeout(RuntimeError):
    """A phase subprocess exceeded its wall-clock timeout. In the ladder
    this advances the rung like an OOM: a trial that cannot finish inside
    the timeout is definitionally not sane, and a smaller footprint
    competes better against a co-tenant HBM hold (observed r5: one
    contended chunk-2 trial burned 935 s of a 2400 s budget while the
    tiled rung answered in 72 s under the same load)."""


def _run_phase_subprocess(phase: str, extra=(), timeout=None) -> float:
    """Each phase runs in its own process: the tunneled TPU backend does not
    reliably return HBM freed mid-process, so phase isolation keeps the VAE
    phase from inheriting the DiT's reservation (and lets OOM fallbacks
    start from a clean allocator)."""
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--phase", phase, *map(str, extra)],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired as e:
        tail = (e.stderr or b"")
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        sys.stderr.write(tail[-1000:])
        raise _PhaseTimeout(f"phase {phase} timed out after {timeout:.0f}s")
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        if "RESOURCE_EXHAUSTED" in out.stderr:
            raise _PhaseOOM(f"phase {phase} OOM (co-tenant HBM hold?)")
        raise RuntimeError(f"phase {phase} failed (rc={out.returncode})")
    return float(out.stdout.strip().splitlines()[-1])


_DEVICE_STR = None
_PROBE_FAILED = False  # last probe outcome (read by the dead-tunnel check)


def _device_str() -> str:
    # backend init goes through the tunnel and can fail OR HANG (observed
    # 2026-08-17: a dead tunnel leaves init in a retry loop that no
    # exception and no SIGALRM interrupts) — so the parent process must
    # never call jax.devices() itself. Probe in a killable subprocess.
    global _DEVICE_STR, _PROBE_FAILED
    if _DEVICE_STR is not None:
        return _DEVICE_STR
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0])"],
            capture_output=True, text=True, timeout=45.0,
        )
        if out.returncode == 0 and out.stdout.strip():
            _DEVICE_STR = out.stdout.strip().splitlines()[-1]  # cache success
            _PROBE_FAILED = False
            return _DEVICE_STR
        _PROBE_FAILED = True
        return "<unavailable: probe failed>"  # NOT cached: retry next emit
    except Exception as e:  # noqa: BLE001 — incl. TimeoutExpired on a hung tunnel
        _PROBE_FAILED = True
        return f"<unavailable: {type(e).__name__}>"  # NOT cached


def _compose(results: dict, contended: dict, cache: dict,
             incomplete: list) -> dict:
    """Build the JSON result object from fresh measurements + cache.

    Pure given its inputs (device probe aside) — unit-tested in
    tests/test_bench_emit.py. `results` holds sane timings measured this
    run; `contended` holds this run's measurements that exceeded the SANE
    ceiling (reported, never part of `value`)."""

    def cur(phase):
        """Current-fingerprint value: (seconds, measured_this_run, entry)."""
        if phase in results:
            return results[phase], True, None
        ent = _cache_entry(cache, PHASE_KEY[phase], _fingerprint(phase))
        if ent is not None:
            return float(ent["t"]), False, ent
        return None, None, None

    def fallback(phase):
        """Best-effort estimate when no current-fp value exists:
        an old-code quiet-window cache entry approximates current code
        better than a contended-window measurement of it."""
        ent = cache.get(PHASE_KEY[phase])
        if ent is not None:
            return float(ent["t"]), "cache_old_code"
        if phase in contended:
            return contended[phase], "contended_window"
        return None, None

    sampler_s, sampler_fresh, _ = cur("sampler")
    vae_s, vae_fresh, vae_ent = cur("vae")
    detail = {
        "serving_config": ("int8 W8A8 linears + int8-QK^T flash attention "
                           "(bf16: models default)"),
        "device": _device_str(),
        "elapsed_s": round(time.time() - START, 1),
        "measured_this_run": {p: (p in results or p in contended)
                              for p in PHASE_KEY},
    }
    stale = []
    value = None
    if sampler_s is not None and vae_s is not None:
        total = sampler_s + vae_s
        value = NUM_FRAMES / total
        detail.update({
            "sampler_s": round(sampler_s, 3),
            "per_step_s": round(sampler_s / STEPS, 4),
            "vae_decode_s": round(vae_s, 3),
            "total_s": round(total, 2),
        })
        if vae_ent is not None and vae_ent.get("args"):
            detail["vae_decode_chunk"] = int(vae_ent["args"][0])
        stale = [p for p, fresh in [("sampler", sampler_fresh),
                                    ("vae", vae_fresh)] if not fresh]
    else:
        # value cannot be composed from current-fingerprint sane timings:
        # emit a loudly-flagged estimate instead of an information-free null
        basis = {}
        est = {}
        for phase, v, fr in [("sampler", sampler_s, sampler_fresh),
                             ("vae", vae_s, vae_fresh)]:
            if v is not None:
                est[phase] = v
                basis[phase] = "measured" if fr else "cache"
            else:
                fv, fb = fallback(phase)
                if fv is not None:
                    est[phase] = fv
                    basis[phase] = fb
        if len(est) == 2:
            detail["stale_estimate_basis"] = basis
            detail["sampler_s_estimate"] = round(est["sampler"], 3)
            detail["vae_decode_s_estimate"] = round(est["vae"], 3)
        else:
            detail["error"] = ("no timing or estimate available for: "
                               + ", ".join(p for p in ("sampler", "vae")
                                           if p not in est))
        partial = {p: round(v, 4) for p, v in {**contended, **results}.items()}
        if partial:
            detail["partial"] = partial

    # contended-window measurements are reported but NEVER enter value
    if "vae" in contended:
        detail["vae_decode_s_contended"] = round(contended["vae"], 3)
        detail["vae_contended_window"] = True
    elif value is not None and "vae" in results:
        detail["vae_contended_window"] = False

    for phase, key_out in [("encode", "vae_encode_s"),
                           ("sampler_pab", "sampler_pab_s")]:
        v, fresh, _ = cur(phase)
        if v is not None:
            detail[key_out] = round(v, 3)
            if not fresh:
                stale.append(phase)
    if "sampler_pab_s" in detail and value is not None:
        # APPROXIMATE serving mode (PAB attention broadcast, opt-in) —
        # informational only, never the headline value above
        vae_for_pab = detail.get("vae_decode_s")
        detail["pab_frames_per_s"] = round(
            NUM_FRAMES / (detail["sampler_pab_s"] + vae_for_pab), 4)

    def train_detail(phase, suffix):
        v, fresh, _ = cur(phase)
        if v is None:
            return
        b = int(PHASE_DEFAULT_ARGS[phase][0])
        tok = TRAIN_TOKENS_PER_SAMPLE * b
        detail[f"train_step_s_1p4b_17f{suffix}"] = round(v, 3)
        detail[f"train_tokens_per_s{suffix}"] = round(tok / v)
        # PaLM-style MFU: 6 * N_params * tokens/s over the chip's bf16 peak
        detail[f"train_mfu_pct{suffix}"] = round(
            100.0 * 6.0 * TRAIN_N_PARAMS * tok / v / V5E_BF16_PEAK, 1)
        if not fresh:
            stale.append(phase)

    train_detail("train", "")
    train_detail("train_b2", "_b2")
    train_detail("train_b4", "_b4")

    if stale:
        # cached quiet-window timings (.bench_cache.json, byte-identical
        # code) substituted for phases not measured this run
        detail["stale"] = stale
    if incomplete:
        detail["incomplete"] = list(incomplete)

    out = {
        "metric": _METRIC,
        "value": None if value is None else round(value, 4),
        "unit": "frames/s",
        "vs_baseline": None if value is None else round(value / A100_BASELINE_FPS, 4),
        "baseline_is_estimate": True,
    }
    if value is None and "sampler_s_estimate" in detail:
        est_total = detail["sampler_s_estimate"] + detail["vae_decode_s_estimate"]
        out["stale_estimate"] = round(NUM_FRAMES / est_total, 4)
    out["detail"] = detail
    return out


def _emit(results: dict, contended: dict, cache: dict, incomplete: list) -> None:
    """Print one best-so-far JSON result line. Called after every phase (and
    once at startup) so that an outer kill at ANY point leaves a parseable
    last line."""
    print(json.dumps(_compose(results, contended, cache, incomplete)), flush=True)


def _phase_with_retries(phase: str, cache: dict, ladder=None, max_attempts=3,
                        first_timeout=480.0):
    """Run `phase` in fresh subprocesses until a quiet-window (sane) timing
    lands, the attempts run out, or the global budget is exhausted.

    - RESOURCE_EXHAUSTED descends `ladder` (VAE chunk sizes) IMMEDIATELY in
      a fresh subprocess — no sleeping; fresh processes start from a clean
      HBM allocator.
    - a successful-but-slow timing (contended window) also advances the
      ladder (smaller footprint competes better for HBM) and retries.
    - returns (best, sane): best observed timing (None if every attempt
      errored or the budget ran out first) and whether it beat the SANE
      contention ceiling. Never sleeps: the global deadline is the only
      clock that matters.
    """
    ladder = list(ladder or [()])
    best = None
    best_extra = ()
    rung = 0
    rung_key = f"{PHASE_KEY[phase]}_rung"
    if len(ladder) > 1:
        # start at the last rung that produced a sane timing under this
        # code fingerprint: re-proving chunk 6 under co-tenant HBM pressure
        # costs an OOM + a ~25-minute recompile before descending
        prev = _cache_get(cache, rung_key, _fingerprint(phase))
        if prev is not None:
            rung = min(int(prev), len(ladder) - 1)
    key = PHASE_KEY[phase]
    fp = _fingerprint(phase)
    sane_val = None
    for attempt in range(max_attempts):
        if _remaining() < 90.0:  # not enough budget for compile + trial
            break
        timeout = max(60.0, min(_remaining() - 20.0, first_timeout))
        if rung > 0:
            # descended rungs get a tighter wall: their quiet-window trial
            # fits easily (warm compile cache + seconds of decode), and a
            # window that can't finish inside this can't produce a sane
            # timing anyway — cut it and descend instead of burning the
            # budget (the 935 s chunk-2 trial, see _PhaseTimeout)
            timeout = min(timeout, 700.0)
        extra = ladder[min(rung, len(ladder) - 1)]
        ceiling = SANE[phase] * _rung_slack(phase, extra)
        try:
            val = _run_phase_subprocess(phase, extra, timeout=timeout)
            if best is None or val < best:
                best, best_extra = val, extra
            if val <= ceiling:
                sane_val = val
                best, best_extra = val, extra
                break
            print(f"bench: {phase}{extra} took {val:.2f}s (contended window, "
                  f"ceiling {ceiling:.1f}s) — retrying",
                  file=sys.stderr, flush=True)
            rung += 1
        except (_PhaseOOM, _PhaseTimeout) as e:
            print(f"bench: {e} — descending ladder", file=sys.stderr, flush=True)
            rung += 1
            if len(ladder) > 1:
                # persist the descent so the NEXT run (the warming queue
                # cycles every ~50 min under a co-tenant HBM hold) skips
                # straight past the rungs that just OOM'd instead of
                # re-proving them; a later sane success promotes back up
                _store(cache, rung_key, fp, min(rung, len(ladder) - 1))
                _save_cache(cache)
        except Exception as e:  # noqa: BLE001
            print(f"bench: {phase} attempt failed: {e}", file=sys.stderr, flush=True)
    if sane_val is not None:
        cached = _cache_get(cache, key, fp)
        if cached is None or best < cached:
            _store(cache, key, fp, best, args=best_extra)
        if len(ladder) > 1:
            # store one rung ABOVE the one that worked: the next run retries
            # the faster footprint (one cheap OOM if the hold persists) so
            # the ladder converges to the best feasible rung per window
            # instead of pinning the pessimistic one (last-write-wins, see
            # _save_cache)
            _store(cache, rung_key, fp, max(min(rung, len(ladder) - 1) - 1, 0))
        _save_cache(cache)
        return best, True
    return best, False


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        phase = sys.argv[2]
        extra = sys.argv[3:]
        val = PHASE_FNS[phase](tuple(extra))
        print(val)
        # A/B queue runs (scripts/onchip_ab*.sh) measure the same phase
        # definitions — persist sane results under the current fingerprint
        # so they warm the cache the driver's full bench reads. Runs with
        # NON-default phase args (e.g. `--phase vae 2`) never auto-cache:
        # a non-headline-chunk decode time must not stand in for the
        # headline figure without ladder provenance.
        if extra and list(extra) != PHASE_DEFAULT_ARGS.get(phase, []):
            return
        try:
            v = float(val)
        except (TypeError, ValueError):
            return
        if v <= SANE.get(phase, float("inf")):
            cache = _load_cache()
            key, fp = PHASE_KEY[phase], _fingerprint(phase)
            cached = _cache_get(cache, key, fp)
            if cached is None or v < cached:
                _store(cache, key, fp, v,
                       args=extra or PHASE_DEFAULT_ARGS.get(phase))
                _save_cache(cache)
        return

    if len(sys.argv) > 2 and sys.argv[1] == "--ladder":
        # Queue entry point: run ONE phase through the same retry/ladder
        # machinery as the full bench (fresh subprocesses, persisted rung,
        # auto-cache with args provenance). `--phase vae` always measures
        # chunk 6 and keeps OOMing under a co-tenant HBM hold; this path
        # resumes from the last rung that worked (.bench_cache.json
        # *_rung) so a warming queue converges instead of re-proving the
        # OOM each cycle. rc=0 iff a sane timing landed.
        phase = sys.argv[2]
        ladders = {"vae": [(6,), (4,), (2,), (0,)], "encode": [(8,), (4,), (2,)]}
        cache = _load_cache()
        val, sane = _phase_with_retries(
            phase, cache, ladder=ladders.get(phase),
            max_attempts=4, first_timeout=1500.0)
        print(json.dumps({"phase": phase, "value": val, "sane": sane}))
        sys.exit(0 if (val is not None and sane) else 1)

    cache = _load_cache()
    results: dict = {}
    contended: dict = {}
    incomplete = ["sampler", "vae", "train"]

    # hard backstop: even if a phase subprocess wedges past its own timeout
    # (tunnel pathology), the global budget still ends the run with a final
    # best-so-far emit instead of relying on the driver's outer kill.
    # Armed BEFORE the startup emit: nothing in this process may run
    # un-alarmed (the startup emit once hung in jax.devices() on a dead
    # tunnel and produced rc=124 with no output).
    import signal

    def _deadline(_sig, _frm):
        print("bench: global budget exhausted — emitting best-so-far",
              file=sys.stderr, flush=True)
        _emit(results, contended, cache, incomplete)
        sys.exit(0)

    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(int(GLOBAL_BUDGET_S + 30))

    # startup emit: if a previous quiet window populated the cache, a
    # parseable line exists within seconds of process start
    _emit(results, contended, cache, incomplete)

    # Dead-tunnel early exit: when backend init hangs (observed 2026-08-17,
    # no exception — just a retry loop), every phase subprocess would burn
    # its full timeout. The startup emit's device probe already timed out
    # in that state (_PROBE_FAILED); confirm with one longer probe before
    # writing the chip off — a merely-contended window usually still
    # answers within 120 s.
    if _PROBE_FAILED and cache:
        try:
            alive = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=120.0,
            ).returncode == 0
        except Exception:  # noqa: BLE001 — TimeoutExpired => still hung
            alive = False
        if not alive:
            print("bench: TPU backend init hung twice — tunnel is down; "
                  "reporting cached timings", file=sys.stderr, flush=True)
            _emit(results, contended, cache, incomplete)
            return

    # Phase order: the matmul-heavy scan phases (sampler/train and the
    # optional pab/b2/b4) are contention-stable — they land even while a
    # co-tenant wave makes every big-conv VAE program crawl 10-100x
    # (observed 2026-08-19 23:00: train 0.417s fresh while tiled decode
    # took 78s) — so they run FIRST and the budget-burning conv phases
    # (vae ladder, encode) run last. Emit happens after every phase, so
    # ordering never changes what a partial run reports.
    for phase, kwargs in [
        ("sampler", dict(max_attempts=3, first_timeout=900.0)),
        ("train", dict(max_attempts=2, first_timeout=600.0)),
    ] + ([("sampler_pab", dict(max_attempts=2, first_timeout=900.0))]
         if os.environ.get("ORV_TPU_BENCH_PAB") == "1" else []) \
      + ([("train_b2", dict(max_attempts=2, first_timeout=900.0))]
         if os.environ.get("ORV_TPU_BENCH_TRAIN_B2") == "1" else []) \
      + ([("train_b4", dict(max_attempts=2, first_timeout=900.0))]
         if os.environ.get("ORV_TPU_BENCH_TRAIN_B4") == "1" else []) \
      + [
        # decode chunk 6 is fastest but needs ~10GB HBM; under a co-tenant
        # memory hold descend to chunk 4 (~7GB) / 2 / 0 (spatially tiled,
        # ~2GB — the last-resort rung) in FRESH subprocesses
        ("vae", dict(ladder=[(6,), (4,), (2,), (0,)], max_attempts=4,
                     first_timeout=1500.0)),
    ] + ([("encode", dict(ladder=[(8,), (4,), (2,)], max_attempts=3,
                          first_timeout=900.0))]
         if os.environ.get("ORV_TPU_BENCH_ENCODE") == "1" else []):
        if _remaining() < 90.0:
            break
        val, sane = _phase_with_retries(phase, cache, **kwargs)
        if val is not None and sane:
            results[phase] = val
        elif val is not None:
            contended[phase] = val
        if phase in incomplete and (
                val is not None
                or _cache_get(cache, PHASE_KEY[phase], _fingerprint(phase))
                is not None):
            # measured (even contended — it ran), or a cached quiet-window
            # number stands in; a phase that errored every attempt with no
            # cache STAYS in `incomplete` so the report shows it. Optional
            # detail phases are never in the list — hence the membership
            # check, never an unconditional remove.
            incomplete.remove(phase)
        _emit(results, contended, cache, incomplete)


if __name__ == "__main__":
    main()
