"""HF Hub checkpoint upload/download helper (reference scripts/hf_model.py).

huggingface_hub is optional; everything gates on import + network
availability with clear errors (this framework's images are often
zero-egress)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from orv_tpu.utils.logging import CONSOLE


def _api():
    try:
        from huggingface_hub import HfApi

        return HfApi()
    except ImportError as e:
        raise RuntimeError("huggingface_hub not installed") from e


def upload_folder(local_dir: str, repo_id: str, path_in_repo: str = "",
                  token: Optional[str] = None, private: bool = True):
    api = _api()
    api.create_repo(repo_id, exist_ok=True, private=private, token=token)
    api.upload_folder(folder_path=local_dir, repo_id=repo_id,
                      path_in_repo=path_in_repo, token=token)
    CONSOLE.log(f"uploaded {local_dir} -> {repo_id}/{path_in_repo}")


def download_folder(repo_id: str, local_dir: str, allow_patterns=None,
                    token: Optional[str] = None) -> str:
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise RuntimeError("huggingface_hub not installed") from e
    path = snapshot_download(repo_id, local_dir=local_dir,
                             allow_patterns=allow_patterns, token=token)
    CONSOLE.log(f"downloaded {repo_id} -> {path}")
    return path
