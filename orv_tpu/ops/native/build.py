"""On-demand g++ build + ctypes loader for the native ops.

No pip/pybind dependency: sources compile once into
orv_tpu/ops/native/_build/<name>-<srchash>.so and load via ctypes
(the reference used torch.utils.cpp_extension JIT builds the same way).
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_BUILD = _DIR / "_build"


def load_native(name: str) -> ctypes.CDLL:
    src = _DIR / f"{name}.cpp"
    code = src.read_bytes()
    tag = hashlib.sha256(code).hexdigest()[:12]
    _BUILD.mkdir(exist_ok=True)
    so = _BUILD / f"{name}-{tag}.so"
    if not so.exists():
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-march=native", str(src), "-o", str(so),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return ctypes.CDLL(str(so))
