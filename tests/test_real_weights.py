"""Real-checkpoint parity (runs only when weights exist locally).

Set ORV_TPU_COGVIDEOX_CKPT=/path/to/CogVideoX-2b (HF layout with
transformer/ and vae/ safetensors) to activate. Optionally set
ORV_TPU_COGVIDEOX_GOLDEN to a goldens npz recorded from the torch
reference (scripts/check_real_weights.py --record)."""

import os

import pytest


@pytest.mark.skipif(
    not os.environ.get("ORV_TPU_COGVIDEOX_CKPT"),
    reason="no local CogVideoX checkpoint (set ORV_TPU_COGVIDEOX_CKPT)",
)
def test_real_weight_parity():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from check_real_weights import run

    rc = run(os.environ["ORV_TPU_COGVIDEOX_CKPT"],
             golden=os.environ.get("ORV_TPU_COGVIDEOX_GOLDEN"))
    assert rc == 0
