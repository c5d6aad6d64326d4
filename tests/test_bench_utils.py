"""Unit tests for bench.py / __graft_entry__ helper logic (CPU-safe)."""
import numpy as np

import __graft_entry__ as ge
import bench


def test_xla_flags_device_count_replacement():
    f = ge._flags_with_device_count
    assert f("", 8).strip() == "--xla_force_host_platform_device_count=8"
    # replaces an existing count instead of stacking
    out = f("--xla_force_host_platform_device_count=2 --foo=1", 8)
    assert out.count("xla_force_host_platform_device_count") == 1
    assert "=8" in out and "--foo=1" in out


def test_peak_flops_table_kinds():
    table = dict(bench._PEAK_FLOPS)
    assert table["v5 lite"] == 197e12      # the bench chip ("TPU v5 lite")
    assert table["v4"] == 275e12
    # matching is substring-based and ordered: "v5 lite" before "v4"
    kinds = [k for k, _ in bench._PEAK_FLOPS]
    assert kinds.index("v5 lite") < kinds.index("v4")


def test_flops_of_counts_matmul():
    import jax
    import jax.numpy as jnp
    a = jnp.ones((64, 64))
    f = jax.jit(lambda a: a @ a)
    flops = bench._flops_of(f, a)
    # 2*M*N*K = 524288 (cost analysis may fold constants; allow slack)
    assert flops == flops and 1e5 <= flops <= 1e7


def test_flops_of_handles_failure():
    flops = bench._flops_of(None)
    assert np.isnan(flops)
