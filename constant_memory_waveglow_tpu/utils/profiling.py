"""Profiling hooks — the reference's observability here is wall-clock prints
and Lightning callbacks (SURVEY.md §5); the TPU-native upgrade is
``jax.profiler`` traces viewable in TensorBoard/XProf, plus device memory
stats."""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the duration of the context."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None):
    """Best-effort device memory stats dict ({} when unsupported)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


def model_summary(params, max_depth: int = 2) -> str:
    """Parameter-count table — the ModelSummary(max_depth=2) analog
    (reference ``train.py:56``)."""
    import numpy as np

    rows = []

    def count(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(int(np.prod(l.shape)) for l in leaves if hasattr(l, "shape"))

    def rec(node, name, depth):
        if depth >= max_depth or not isinstance(node, (dict, list, tuple)):
            rows.append((name, count(node)))
            return
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{name}.{k}" if name else k, depth + 1)
        else:
            rows.append((name, count(node)))

    rec(params, "", 0)
    total = count(params)
    width = max((len(n) for n, _ in rows), default=10)
    lines = [f"{n:<{width}}  {c:>12,}" for n, c in rows]
    lines.append(f"{'TOTAL':<{width}}  {total:>12,}")
    return "\n".join(lines)
