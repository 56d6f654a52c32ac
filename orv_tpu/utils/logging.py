"""Console logging.

Reference parity: orv/utils.py:13 creates a global rich Console(width=120)
used everywhere for status logging. rich may not be available in a slim
environment, so fall back to a shim with the same `.log`/`.print` surface.
"""

import sys
import time


class _PlainConsole:
    def log(self, *args, **kwargs):
        ts = time.strftime("%H:%M:%S")
        print(f"[{ts}]", *args, file=sys.stderr)

    def print(self, *args, **kwargs):
        print(*args)

    def rule(self, title: str = ""):
        print("-" * 40, title, "-" * 40)


try:
    from rich.console import Console

    CONSOLE = Console(width=120)
except Exception:  # pragma: no cover - rich is present in CI images
    CONSOLE = _PlainConsole()


def log(*args, **kwargs):
    CONSOLE.log(*args, **kwargs)
