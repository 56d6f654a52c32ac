"""End-to-end integration: raw episodes -> extract -> encode -> train ->
evaluate (incl. cascaded) on synthetic data, all through the public CLIs'
underlying functions. Codifies the manually-driven flow so it stays green."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SEQ = 8


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    """Raw episodes written through data_process, encoded through
    encode_dataset (random VAE)."""
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)

    from orv_tpu.pipelines.data_process import extract

    def source():
        for i in range(2):
            yield dict(
                episode_id=f"{i:05d}", texts=["pick the cube"],
                frames={0: rng.uniform(0, 255, (40, 32, 32, 3)).astype(np.uint8)},
                state=rng.uniform(-1, 1, (40, 7)).tolist(),
                continuous_gripper_state=rng.uniform(0, 1, 40).tolist(),
            )

    extract(source(), str(root), split="train", num_workers=1)

    from orv_tpu.configs import Config
    from orv_tpu.models.vae import CausalVAE, VAEConfig
    from orv_tpu.pipelines.encode_dataset import encode_empty_prompt, encode_split

    tiny_vae = VAEConfig(block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                         norm_num_groups=4, latent_channels=16)
    vae = CausalVAE(tiny_vae, dtype=jnp.float32)
    vparams = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 32, 32)))
    cfg = Config({
        "dataset": {"data_root": str(root), "sequence_length": SEQ,
                    "sequence_interval": 1, "start_frame_interval": 8,
                    "video_size": [32, 32]},
        "transformer": {"max_text_seq_length": 8, "text_embed_dim": 32},
    })
    encode_split(cfg, vae, vparams, "train")
    encode_empty_prompt(cfg, Path(root) / "embeddings_full" / "train")
    return str(root)


def test_encoded_layout(pipeline_root):
    emb = Path(pipeline_root) / "embeddings_full" / "train"
    lat = sorted((emb / "latents").glob("*.npz"))
    assert len(lat) >= 6  # 2 episodes x >=3 slices
    arr = np.load(lat[0])["arr_0"]
    assert arr.shape == (32, SEQ // 4 + 1, 4, 4)  # moments 2C, F_lat, h, w
    assert (emb / "prompt_embeds" / "empty.npz").exists()


def test_train_then_eval(pipeline_root, tmp_path):
    from orv_tpu.configs import default_config_dir, load_config
    from orv_tpu.pipelines.train import train

    overrides = [
        f"dataset.data_root={pipeline_root}", "dataset.sequence_length=8",
        "dataset.start_frame_interval=8",
        "transformer.num_attention_heads=2", "transformer.attention_head_dim=8",
        "transformer.num_layers=1", "transformer.text_embed_dim=32",
        "transformer.time_embed_dim=32", "transformer.max_text_seq_length=8",
        "transformer.in_channels=32", "transformer.out_channels=16",
        "transformer.pretrained_name_or_path=null",
        "train.max_train_steps=2", "train.checkpointing_steps=10",
        "train.train_batch_size=2", "train.gradient_accumulation_steps=1",
        "train.lr_warmup_steps=0", "train.log_every=1",
        "train.validation_steps=100", "inference.num_inference_steps=2",
        f"train.output_path={tmp_path}", "train.output_dir=run",
    ]
    os.environ["NO_INIT_VAL"] = "1"
    try:
        cfg = load_config(str(default_config_dir() / "base_train.yaml"),
                          dataset_type="rt1", overrides=overrides)
        state = train(cfg)
    finally:
        os.environ.pop("NO_INIT_VAL", None)
    assert int(state.step) == 2
    assert (tmp_path / "run" / "checkpoint" / "model.msgpack").exists()

    # evaluate from the exported checkpoint (incl. cascaded rollout)
    from orv_tpu.pipelines.evaluate import evaluate

    eval_overrides = [
        f"dataset.data_root={pipeline_root}", "dataset.sequence_length=8",
        "dataset.start_frame_interval=8", "dataset.split=train",
        "transformer.num_attention_heads=2", "transformer.attention_head_dim=8",
        "transformer.num_layers=1", "transformer.text_embed_dim=32",
        "transformer.time_embed_dim=32", "transformer.max_text_seq_length=8",
        f"transformer.pretrained_name_or_path={tmp_path}/run/checkpoint",
        "evaluation.num_inference_steps=2", "evaluation.batch_size=2",
        f"evaluation.output_dir={tmp_path}/eval",
    ]
    cfg = load_config(str(default_config_dir() / "base_eval.yaml"),
                      dataset_type="rt1", overrides=eval_overrides)
    results = evaluate(cfg, max_batches=1)
    assert len(results) == 2
    assert len(list((tmp_path / "eval").glob("*_latents.npz"))) == 2
