"""The synthetic PAB quality harness (scripts/pab_quality_synthetic.py,
round-5 VERDICT #4) — short-budget structural run.

The committed quality numbers come from the full run
(reports/pab_quality_synthetic.json, 800 train steps / 50 sampler steps);
this test keeps the harness itself from rotting: the overfit trains, the
report carries every field the decision rule needs, and a PAB sampler
whose broadcast window is EMPTY is bit-exact with the exact sampler
(pab_start == pab_end => no broadcast step, pure plumbing overhead)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_harness_short_run_and_empty_window_exactness():
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from pab_quality_synthetic import build_overfit_model, run

    report = run(train_steps=20, sample_steps=6, n_clips=2,
                 skips=(2,), windows=((0.1, 0.85),))
    assert {"recon_psnr_exact", "final_train_loss", "cells"} <= set(report)
    cell = report["cells"][0]
    assert {"pab_skip", "window", "recon_psnr_pab", "pab_vs_exact_psnr",
            "frechet_rp", "safe"} <= set(cell)
    assert np.isfinite(cell["frechet_rp"])

    # empty broadcast window => the PAB sampler is the exact sampler
    from orv_tpu.pipelines.sample import SamplerConfig, make_sampler
    from orv_tpu.schedulers import make_schedule

    model, params, clip, img_lat, enc, _ = build_overfit_model(train_steps=2)
    schedule = make_schedule()
    lat0 = jax.random.normal(jax.random.PRNGKey(3), clip.shape, jnp.float32)
    args = (params, lat0, jnp.asarray(img_lat), jnp.asarray(enc),
            jax.random.PRNGKey(4))
    exact = jax.jit(make_sampler(model.apply, schedule,
                                 SamplerConfig(num_inference_steps=4)))(*args)
    empty = jax.jit(make_sampler(
        model.apply, schedule,
        SamplerConfig(num_inference_steps=4, pab_skip=2,
                      pab_start=0.5, pab_end=0.5)))(*args)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(empty))
