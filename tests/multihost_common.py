"""Shared fixture data for the emulated multi-host test (worker + parent
must build bitwise-identical batches and checksums)."""
import numpy as np

B, P_, L, C, T, STEPS = 16, 29, 96, 4, 10, 3


def make_batch():
    rng = np.random.default_rng(7)
    x0 = rng.normal(size=(B, P_)).astype(np.float32)
    cond = rng.normal(size=(B, L, C)).astype(np.float32)
    w = np.ones((B,), np.float32)
    return x0, cond, w


def param_checksum(params) -> float:
    import jax
    import numpy as _np
    return float(sum(_np.abs(_np.asarray(leaf)).sum()
                     for leaf in jax.tree_util.tree_leaves(params)))
