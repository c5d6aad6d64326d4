"""Kernel microbenchmarks: Pallas vs XLA, forward and backward.

Run on a TPU host: `python benchmarks/kernel_bench.py`. Timing protocol
for this machine's tunnel (see docs/DESIGN.md §5b): work amortized inside
a lax.scan per dispatch, host-read sync per dispatch, median of repeats.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def scan_time(make_body, n_iter=32, repeats=3, args=()):
    """Median seconds per body execution, scan-amortized + host-synced.

    Large operand arrays MUST come in via `args` (threaded through jit as
    real arguments) — a body that closes over device slabs ships them as
    compiled-program constants, which this host's remote backend rejects
    or slows by orders of magnitude (CLAUDE.md "Environment quirks")."""
    body = make_body()

    @jax.jit
    def run(key, *ops):
        def step(c, k):
            return c, body(k, *ops)
        keys = jax.random.split(key, n_iter)
        _, outs = jax.lax.scan(step, None, keys)
        return outs

    o = run(jax.random.key(0), *args)
    _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        o = run(jax.random.key(1 + i), *args)
        _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        times.append((time.perf_counter() - t0) / n_iter)
    return sorted(times)[len(times) // 2]


def bench_attention(b=8, h=4, l=512, d=64):
    from ertdx.ops.attention import flash_attention, reference_attention
    q0 = jax.random.normal(jax.random.key(10), (b, h, l, d))
    k0 = jax.random.normal(jax.random.key(11), (b, h, l, d))
    v0 = jax.random.normal(jax.random.key(12), (b, h, l, d))

    out = {}
    for name, fn in (("pallas", lambda q, k, v: flash_attention(
                          q, k, v, None, True)),
                     ("xla", reference_attention)):
        def make_fwd(fn=fn):
            def body(key):
                q = q0 + 1e-9 * jax.random.normal(key, q0.shape)
                return jnp.mean(fn(q, k0, v0))
            return body

        def make_bwd(fn=fn):
            def body(key):
                q = q0 + 1e-9 * jax.random.normal(key, q0.shape)
                g = jax.grad(lambda q_: jnp.mean(fn(q_, k0, v0) ** 2))(q)
                return jnp.mean(g)
            return body

        out[f"attn_fwd_{name}_ms"] = scan_time(make_fwd) * 1e3
        out[f"attn_fwdbwd_{name}_ms"] = scan_time(make_bwd) * 1e3
    return out


def bench_groupnorm(b=16, l=1174, c=256, groups=8):
    from ertdx.ops.groupnorm import groupnorm_silu, reference_groupnorm_silu
    x0 = jax.random.normal(jax.random.key(20), (b, l, c))
    gamma = jnp.ones(c)
    beta = jnp.zeros(c)

    out = {}
    for name, fn in (("pallas", lambda x: groupnorm_silu(
                          x, gamma, beta, groups, 1e-5, True)),
                     ("xla", lambda x: reference_groupnorm_silu(
                          x, gamma, beta, groups))):
        def make_fwd(fn=fn):
            def body(key):
                x = x0 + 1e-9 * jax.random.normal(key, x0.shape)
                return jnp.mean(fn(x))
            return body

        def make_bwd(fn=fn):
            def body(key):
                x = x0 + 1e-9 * jax.random.normal(key, x0.shape)
                g = jax.grad(lambda x_: jnp.mean(fn(x_) ** 2))(x)
                return jnp.mean(g)
            return body

        out[f"gn_fwd_{name}_ms"] = scan_time(make_fwd) * 1e3
        out[f"gn_fwdbwd_{name}_ms"] = scan_time(make_bwd) * 1e3
    return out


def bench_gnconv(b=32, l=587, c=128, co=128, groups=8):
    """Fused GN+SiLU+conv3 (Pallas) vs the unfused XLA composition, at the
    CondUNet encoder's reference-grid shapes (stage 0: (32, 587, 128);
    stage 1+: (32, 294, 256))."""
    from ertdx.ops.conv import gn_silu_conv3, reference_gn_silu_conv3
    x0 = jax.random.normal(jax.random.key(30), (b, l, c))
    gamma = jnp.ones(c)
    beta = jnp.zeros(c)
    w = 0.05 * jax.random.normal(jax.random.key(31), (3, c, co))
    bias = jnp.zeros(co)

    out = {}
    tag = f"{b}x{l}x{c}to{co}"
    for name, fn in (("pallas", lambda x: gn_silu_conv3(
                          x, gamma, beta, w, bias, groups, 1e-5, True)),
                     ("xla", lambda x: reference_gn_silu_conv3(
                          x, gamma, beta, w, bias, groups))):
        def make_fwd(fn=fn):
            def body(key):
                x = x0 + 1e-9 * jax.random.normal(key, x0.shape)
                return jnp.mean(fn(x))
            return body

        def make_bwd(fn=fn):
            def body(key):
                x = x0 + 1e-9 * jax.random.normal(key, x0.shape)
                g = jax.grad(lambda x_: jnp.mean(fn(x_) ** 2))(x)
                return jnp.mean(g)
            return body

        out[f"gnconv_{tag}_fwd_{name}_ms"] = scan_time(make_fwd) * 1e3
        out[f"gnconv_{tag}_fwdbwd_{name}_ms"] = scan_time(make_bwd) * 1e3
    return out


def bench_ensemble_attn(n=32000, p=29, bcond=32, lk=147, d=128):
    """Fused ensemble-core attention vs XLA at the configs[3] shapes:
    32,000 chains x 29 tokens (self) and 32 conditions x 29,000 folded
    queries vs ~147 condition tokens (cross)."""
    from ertdx.ops.ensemble_attn import (_cross_reference, _self_reference,
                                         block_self_attention,
                                         folded_cross_attention)
    out = {}
    qs = jax.random.normal(jax.random.key(40), (n, p, d))
    ks = jax.random.normal(jax.random.key(41), (n, p, d))
    vs = jax.random.normal(jax.random.key(42), (n, p, d))
    lq = (n // bcond) * p
    qc = jax.random.normal(jax.random.key(43), (bcond, lq, d))
    kc = jax.random.normal(jax.random.key(44), (bcond, lk, d))
    vc = jax.random.normal(jax.random.key(45), (bcond, lk, d))

    def record(tag, make, ops):
        # operand slabs go through scan_time(args=...) — at these sizes
        # (~475 MB each) a closure would ship them as program constants
        # and hang the remote backend. Incremental flush + XLA first: a
        # hung Mosaic compile must not lose already-measured entries.
        out[tag] = scan_time(make, n_iter=8, args=ops) * 1e3
        print(json.dumps({tag: round(out[tag], 3)}), flush=True)

    def make_attn(fn):
        def body(key, q0, k0, v0):
            q = q0 + 1e-9 * jax.random.normal(key, (1, 1, d))
            return jnp.mean(fn(q, k0, v0))
        return lambda: body

    record(f"ens_self_{n}x{p}x{d}_xla_ms", make_attn(_self_reference),
           (qs, ks, vs))
    record(f"ens_cross_{bcond}x{lq}x{lk}_xla_ms",
           make_attn(_cross_reference), (qc, kc, vc))
    record(f"ens_self_{n}x{p}x{d}_pallas_ms",
           make_attn(block_self_attention), (qs, ks, vs))
    record(f"ens_cross_{bcond}x{lq}x{lk}_pallas_ms",
           make_attn(folded_cross_attention), (qc, kc, vc))
    return out


def main():
    record = {"backend": jax.default_backend()}
    record.update(bench_attention())
    record.update(bench_groupnorm())
    record.update(bench_gnconv(b=32, l=587, c=128, co=128))
    record.update(bench_gnconv(b=32, l=294, c=256, co=256))
    record.update(bench_gnconv(b=32, l=587, c=256, co=256))
    record.update(bench_ensemble_attn())
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in record.items()}, indent=2))


if __name__ == "__main__":
    main()
