"""Trace-time dispatch telemetry for the Pallas kernels.

Round-2 review finding: kernel paths could silently not run (poe_fused fell
back to jnp on any exception with a bare ``except``, flash attention was
env-gated off) — so a perf claim about kernels carried no evidence they ever
fired.  Every kernel dispatch decision now goes through :func:`record`,
which counts per (kernel, path) at trace time and prints the first
occurrence of each.  ``summary()`` is exported so training runs and benches
can log which compute paths their XLA programs actually contain.
"""
from __future__ import annotations

import sys
from collections import Counter

_counts: Counter = Counter()


def record(kernel: str, path: str, note: str = "") -> None:
    """Count a trace-time dispatch decision; print each distinct one once.

    :param kernel: kernel name, e.g. "poe", "flash_attn", "kl"
    :param path: "pallas" | "jnp" | "jnp-error-fallback" ...
    """
    key = f"{kernel}:{path}"
    _counts[key] += 1
    if _counts[key] == 1:
        msg = f"[pallas] {kernel} -> {path} path (trace-time)"
        if note:
            msg += f" — {note}"
        # stderr: stdout is reserved for tool output contracts (bench.py
        # must print exactly one JSON line to stdout)
        print(msg, file=sys.stderr)


def summary() -> dict:
    """{kernel:path -> trace count} for logging next to perf numbers."""
    return dict(_counts)


def reset() -> None:
    _counts.clear()
