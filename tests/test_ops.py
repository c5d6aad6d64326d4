import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ertdx.ops.attention import (flash_attention, flash_attention_interpret,
                                 reference_attention)
from ertdx.ops.groupnorm import (groupnorm_silu, groupnorm_silu_interpret,
                                 reference_groupnorm_silu)


def _qkv(key, b=2, h=2, l=256, d=64):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (b, h, l, d)),
            jax.random.normal(kk, (b, h, l, d)),
            jax.random.normal(kv, (b, h, l, d)))


def test_flash_kernel_matches_reference_interpret():
    """The Pallas kernel itself (interpreter mode on CPU) == XLA attention."""
    q, k, v = _qkv(jax.random.key(0))
    out_kernel = flash_attention_interpret(q, k, v)
    out_ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_kernel_masked():
    q, k, v = _qkv(jax.random.key(1), l=128)
    mask = jnp.ones((2, 128)).at[:, 100:].set(0.0)
    out_kernel = flash_attention_interpret(q, k, v, mask)
    out_ref = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    # masked keys must not influence the output
    v2 = v.at[:, :, 100:, :].set(999.0)
    out2 = flash_attention_interpret(q, k, v2, mask)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out_kernel),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_dispatch_cpu_fallback():
    """On CPU the public op silently uses the XLA path — same numbers."""
    q, k, v = _qkv(jax.random.key(2), l=128)
    out = flash_attention(q, k, v, None, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(reference_attention(q, k, v)),
                               rtol=1e-6)


def test_flash_attention_grad():
    """Custom VJP (recompute backward) == autodiff through the reference."""
    q, k, v = _qkv(jax.random.key(3), b=1, h=1, l=128, d=64)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_gn_silu_kernel_matches_reference_interpret():
    key = jax.random.key(4)
    x = jax.random.normal(key, (3, 64, 32))
    gamma = jnp.linspace(0.5, 1.5, 32)
    beta = jnp.linspace(-0.2, 0.2, 32)
    out_k = groupnorm_silu_interpret(x, gamma, beta, num_groups=8)
    out_r = reference_groupnorm_silu(x, gamma, beta, num_groups=8)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)


def test_gn_silu_matches_flax_groupnorm():
    """Semantics == flax GroupNorm followed by SiLU."""
    from flax import linen as nn
    x = jax.random.normal(jax.random.key(5), (2, 40, 16))
    gn = nn.GroupNorm(num_groups=4)
    variables = gn.init(jax.random.key(0), x)
    gamma = variables["params"]["scale"]
    beta = variables["params"]["bias"]
    expected = nn.silu(gn.apply(variables, x))
    out = reference_groupnorm_silu(x, gamma, beta, num_groups=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_gn_silu_grad():
    x = jax.random.normal(jax.random.key(6), (2, 32, 16))
    gamma = jnp.ones(16)
    beta = jnp.zeros(16)

    def loss_f(x, g, b):
        return jnp.sum(groupnorm_silu(x, g, b, 4, 1e-5, True) ** 2)

    def loss_r(x, g, b):
        return jnp.sum(reference_groupnorm_silu(x, g, b, 4) ** 2)

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_flash_backward_kernels_match_reference():
    """Fused Pallas backward (interpreter mode) == autodiff of the XLA
    reference, with and without a kv mask."""
    from ertdx.ops.attention import flash_attention_backward_interpret
    q, k, v = _qkv(jax.random.key(7), b=1, h=2, l=128, d=64)
    do = jax.random.normal(jax.random.key(8), q.shape)
    for mask in (None, jnp.ones((1, 128)).at[:, 90:].set(0.0)):
        dq, dk, dv = flash_attention_backward_interpret(q, k, v, mask, do)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(q_, k_, v_, mask),
            q, k, v)
        rq, rk, rv = vjp(do)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                                   rtol=2e-4, atol=2e-5)


def test_flash_backward_multi_block():
    """Backward tiling across multiple q and kv blocks (l=256, block=128)."""
    from ertdx.ops.attention import flash_attention_backward_interpret
    q, k, v = _qkv(jax.random.key(9), b=1, h=1, l=256, d=64)
    do = jax.random.normal(jax.random.key(10), q.shape)
    dq, dk, dv = flash_attention_backward_interpret(q, k, v, None, do)
    _, vjp = jax.vjp(lambda a, b_, c: reference_attention(a, b_, c),
                     q, k, v)
    rq, rk, rv = vjp(do)
    for ours, ref in ((dq, rq), (dk, rk), (dv, rv)):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_gn_silu_fused_backward_matches_reference():
    """Fused Pallas GN+SiLU backward (interpreter) == autodiff of the XLA
    reference for dx, dgamma, dbeta."""
    from ertdx.ops.groupnorm import groupnorm_silu_backward_interpret
    x = jax.random.normal(jax.random.key(11), (3, 48, 32))
    gamma = jnp.linspace(0.5, 1.5, 32)
    beta = jnp.linspace(-0.2, 0.2, 32)
    g = jax.random.normal(jax.random.key(12), x.shape)
    dx, dgamma, dbeta = groupnorm_silu_backward_interpret(
        x, gamma, beta, g, num_groups=8)
    _, vjp = jax.vjp(
        lambda x_, ga_, be_: reference_groupnorm_silu(x_, ga_, be_, 8),
        x, gamma, beta)
    rx, rgamma, rbeta = vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(dgamma), np.asarray(rgamma),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(dbeta), np.asarray(rbeta),
                               rtol=3e-4, atol=3e-4)


def test_gn_silu_conv3_kernel_matches_reference_interpret():
    """Fused GN+SiLU+Conv1d(k=3) Pallas kernel (interpreter mode) == the
    XLA composition, including the zero-padded SAME boundary rows."""
    from ertdx.ops.conv import (gn_silu_conv3_interpret,
                                reference_gn_silu_conv3)
    rng = np.random.default_rng(3)
    B, L, C, CO = 3, 40, 32, 48
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    beta = jnp.asarray(rng.normal(size=C), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, C, CO)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=CO) * 0.1, jnp.float32)
    ref = reference_gn_silu_conv3(x, gamma, beta, w, b, 8)
    out = gn_silu_conv3_interpret(x, gamma, beta, w, b, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gn_silu_conv3_grad_matches_reference():
    """custom-VJP backward (XLA recompute) == autodiff of the reference."""
    from ertdx.ops.conv import gn_silu_conv3, reference_gn_silu_conv3
    rng = np.random.default_rng(4)
    B, L, C, CO = 2, 24, 16, 16
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    beta = jnp.asarray(rng.normal(size=C), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, C, CO)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=CO) * 0.1, jnp.float32)

    g1 = jax.grad(lambda *a: jnp.mean(
        gn_silu_conv3(*a, 4) ** 2), argnums=(0, 1, 2, 3, 4))(
            x, gamma, beta, w, b)
    g2 = jax.grad(lambda *a: jnp.mean(
        reference_gn_silu_conv3(*a, 4) ** 2), argnums=(0, 1, 2, 3, 4))(
            x, gamma, beta, w, b)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)


def test_flash_cross_attention_padded_matches_reference():
    """Padded cross-attention (odd Lq/Lk, dh=32 padded to 64 with scale
    compensation) == XLA reference, interpreter mode."""
    from ertdx.ops.attention import (flash_cross_attention_interpret,
                                     reference_attention)
    rng = np.random.default_rng(7)
    b, h, lq, lk, d = 2, 4, 150, 147, 32
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.float32)
    ref = reference_attention(q, k, v)
    out = flash_cross_attention_interpret(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # with a partial kv mask
    mask = jnp.asarray(rng.uniform(size=(b, lk)) > 0.3, jnp.float32)
    ref = reference_attention(q, k, v, mask)
    out = flash_cross_attention_interpret(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gn_silu_conv3_fused_backward_matches_reference():
    """Fused Pallas GN+SiLU+conv3 backward (interpreter) == autodiff of
    the XLA composition: dx, dgamma, dbeta, dW, db."""
    from ertdx.ops.conv import (gn_silu_conv3_backward_interpret,
                                reference_gn_silu_conv3)
    rng = np.random.default_rng(5)
    B, L, C, CO, G = 2, 40, 32, 48, 8
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    beta = jnp.asarray(rng.normal(size=C), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, C, CO)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=CO) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, L, CO)), jnp.float32)

    got = gn_silu_conv3_backward_interpret(x, gamma, beta, w, b, g, G)
    _, vjp = jax.vjp(lambda *a: reference_gn_silu_conv3(*a, G),
                     x, gamma, beta, w, b)
    want = vjp(g)
    names = ("dx", "dgamma", "dbeta", "dw", "db")
    for nm, a, r in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)


# ---------------------------------------------------------------------------
# fused ensemble-core attention (ops/ensemble_attn.py)
# ---------------------------------------------------------------------------

def test_block_self_attention_kernel_matches_reference_interpret():
    """Block-diagonal per-chain self-attention == per-chain XLA attention.

    Shapes cover the configs[3] layout (P=29 parameter tokens, D=128) and
    a non-29 P to pin the any-P sublane packing (8*P rows per chunk)."""
    from ertdx.ops.ensemble_attn import (_self_reference,
                                         block_self_attention_interpret)
    for n, p in ((32, 29), (16, 5), (8, 29)):
        kq, kk, kv = jax.random.split(jax.random.fold_in(
            jax.random.key(7), n), 3)
        q = jax.random.normal(kq, (n, p, 128))
        k = jax.random.normal(kk, (n, p, 128))
        v = jax.random.normal(kv, (n, p, 128))
        out = block_self_attention_interpret(q, k, v)
        ref = _self_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_folded_cross_attention_kernel_matches_reference_interpret():
    """VMEM-resident folded cross-attention == XLA attention, including
    the key padding/masking at a non-aligned Lk (147 condition tokens)."""
    from ertdx.ops.ensemble_attn import (_cross_reference,
                                         folded_cross_attention_interpret)
    for b, lq, lk in ((4, 40, 19), (2, 29 * 8, 147)):
        kq, kk, kv = jax.random.split(jax.random.fold_in(
            jax.random.key(8), lq), 3)
        q = jax.random.normal(kq, (b, lq, 128))
        k = jax.random.normal(kk, (b, lk, 128))
        v = jax.random.normal(kv, (b, lk, 128))
        out = folded_cross_attention_interpret(q, k, v)
        ref = _cross_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_ensemble_attention_grads_fall_back():
    """The sampling-path kernels carry a recompute VJP: differentiating
    through them must match differentiating the XLA reference."""
    from ertdx.ops.ensemble_attn import (_cross_reference, _self_reference,
                                         block_self_attention,
                                         folded_cross_attention)
    kq, kk, kv = jax.random.split(jax.random.key(9), 3)
    q = jax.random.normal(kq, (8, 5, 128))
    k = jax.random.normal(kk, (8, 5, 128))
    v = jax.random.normal(kv, (8, 5, 128))
    g1 = jax.grad(lambda a: jnp.sum(block_self_attention(a, k, v) ** 2))(q)
    g2 = jax.grad(lambda a: jnp.sum(_self_reference(a, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)
    kc = jax.random.normal(kk, (8, 11, 128))
    vc = jax.random.normal(kv, (8, 11, 128))
    qc = jax.random.normal(kq, (8, 40, 128))
    g1 = jax.grad(lambda a: jnp.sum(folded_cross_attention(a, kc, vc) ** 2)
                  )(qc)
    g2 = jax.grad(lambda a: jnp.sum(_cross_reference(a, kc, vc) ** 2))(qc)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# fused-core ensemble path (ops/core_block.py + models/mega.py)
# ---------------------------------------------------------------------------

def _mega_model_and_inputs(n_real, key=0, num_blocks=2, d=32):
    from ertdx.models.condunet import CondUNet

    model = CondUNet(param_dim=29, hidden_dim=d, cond_channels=4,
                     base_width=16, depth=2, num_blocks=num_blocks,
                     num_heads=2, core_heads=1)
    rng = np.random.default_rng(key)
    B = 4
    cond = jnp.asarray(rng.normal(size=(B, 96, 4)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B * n_real, 29)), jnp.float32)
    t = jnp.full((B * n_real,), 7, jnp.int32)       # samplers share one t
    variables = model.init(jax.random.key(0), x[:B], t[:B], cond)
    # zero-init output projections make a parity test vacuous — perturb
    # every parameter so all residual branches carry signal
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.key(9), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape)
              for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    ctx = model.apply({"params": params}, cond,
                      method=model.encode_condition)
    return model, params, x, t, ctx


def _mega_parity(n_real, expect_tile8):
    from ertdx.models.mega import mega_denoise_ensemble
    from ertdx.ops.core_block import pick_chunk

    model, params, x, t, ctx = _mega_model_and_inputs(n_real)
    chunk = pick_chunk(n_real, 29)
    assert chunk > 0
    assert (chunk % 8 == 0) is expect_tile8
    out_ref = model.apply({"params": params}, x, t, ctx, n_real,
                          method=model.denoise_ensemble)
    for stack in (True, False):          # one-kernel core / kernel-per-block
        out = mega_denoise_ensemble(params, x, t, ctx, n_real, p=29,
                                    d=model.hidden_dim, num_blocks=2,
                                    chunk=chunk, stack=stack,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_mega_denoise_matches_flax_tile8():
    """8-chain-tile self-attention path (R divisible by 8)."""
    _mega_parity(16, expect_tile8=True)


@pytest.mark.slow
def test_mega_denoise_matches_flax_single_tile():
    """Whole-chunk tile path (R=10: the reference's R=50 family)."""
    _mega_parity(10, expect_tile8=False)


def test_mega_plan_gates():
    """mega_plan engages only under its full precondition set."""
    from ertdx.models.mega import mega_plan
    from ertdx.models.condunet import CondUNet

    kw = dict(param_dim=29, hidden_dim=128, cond_channels=4, base_width=16,
              depth=2, num_blocks=2, num_heads=2, core_heads=1,
              ensemble_mega=True)
    big = 100_000                            # clears MIN_TOTAL_CHAINS
    on_cpu = mega_plan(CondUNet(**kw), 16, big)
    assert on_cpu is None                    # CPU backend -> XLA path
    assert mega_plan(CondUNet(**{**kw, "ensemble_mega": False}),
                     16, big) is None
    assert mega_plan(CondUNet(**{**kw, "core_heads": 2}), 16, big) is None
    # below the measured crossover the XLA path wins — stay off
    assert mega_plan(CondUNet(**kw), 16, 2) is None
    # mesh-sharded ensembles stay on the GSPMD path
    assert mega_plan(CondUNet(**kw), 16, big, mesh=object()) is None


@pytest.mark.parametrize("p,n_real,num_blocks,d", [
    (13, 24, 3, 32),     # prime token count, 8-tile path, odd depth
    (7, 10, 1, 64),      # single-tile path, single block
    (29, 8, 4, 32),      # flagship token count, minimum 8-tile chunk
])
@pytest.mark.slow
def test_mega_denoise_odd_shapes(p, n_real, num_blocks, d):
    """Interpret-mode parity across awkward (P, R, depth, D) combos —
    guards the one-hot relayouts, tile masks, and kv padding against
    shape regressions."""
    from ertdx.models.condunet import CondUNet
    from ertdx.models.mega import mega_denoise_ensemble
    from ertdx.ops.core_block import pick_chunk

    model = CondUNet(param_dim=p, hidden_dim=d, cond_channels=3,
                     base_width=16, depth=2, num_blocks=num_blocks,
                     num_heads=2, core_heads=1)
    rng = np.random.default_rng(p * 100 + n_real)
    B = 3
    cond = jnp.asarray(rng.normal(size=(B, 40, 3)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B * n_real, p)), jnp.float32)
    t = jnp.full((B * n_real,), 3, jnp.int32)
    variables = model.init(jax.random.key(0), x[:B], t[:B], cond)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.key(1), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)])
    ctx = model.apply({"params": params}, cond,
                      method=model.encode_condition)
    ref = model.apply({"params": params}, x, t, ctx, n_real,
                      method=model.denoise_ensemble)
    chunk = pick_chunk(n_real, p)
    assert chunk > 0
    for stack in (True, False):
        out = mega_denoise_ensemble(params, x, t, ctx, n_real, p=p, d=d,
                                    num_blocks=num_blocks, chunk=chunk,
                                    stack=stack, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)
    # budget-shrunk stack tile (outer below the default pick): the
    # in-kernel fori_loop must stream more, smaller tiles to the same
    # numbers — this is the path wide configs take under the VMEM gate
    from ertdx.ops.core_block import chunk_candidates
    cands = chunk_candidates(n_real, p)
    if len(cands) > 1:
        out = mega_denoise_ensemble(params, x, t, ctx, n_real, p=p, d=d,
                                    num_blocks=num_blocks, chunk=chunk,
                                    stack=True, outer=cands[1],
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("b,l,c,nh", [
    (4, 147, 256, 4),     # the b256 encoder shape family (dh=64)
    (2, 96, 128, 2),      # dh=64, lane-aligned length
    (8, 40, 64, 1),       # single head, short odd length
    (4, 147, 256, 8),     # dh=32 (quarter-lane heads)
])
def test_slab_attention_parity(b, l, c, nh):
    """Packed-head slab kernel (interpret mode) == the classic head-split
    reference, forward and backward — the function-preserving contract
    that lets it replace the XLA encoder attention with zero quality
    cost (VERDICT r4 item 3)."""
    from ertdx.ops.slab_attn import (reference_slab_attention,
                                     slab_attention_backward_interpret,
                                     slab_attention_interpret)

    rng = np.random.default_rng(b * 1000 + l)
    qkv = jnp.asarray(rng.normal(size=(b, l, 3 * c)), jnp.float32)
    ref = reference_slab_attention(qkv, nh)
    out = slab_attention_interpret(qkv, nh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    do = jnp.asarray(rng.normal(size=(b, l, c)), jnp.float32)
    _, vjp = jax.vjp(lambda z: reference_slab_attention(z, nh), qkv)
    dref = vjp(do)[0]
    dk = slab_attention_backward_interpret(qkv, do, nh)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dref),
                               rtol=2e-4, atol=2e-4)


def test_condunet_attn_slab_function_preserving():
    """attn_slab=True computes the SAME model function on the SAME
    parameter tree (checkpoints interchangeable): outputs and gradients
    match the default path to float tolerance."""
    from ertdx.models.condunet import CondUNet

    kw = dict(param_dim=29, hidden_dim=64, cond_channels=4, base_width=16,
              depth=2, num_blocks=2, num_heads=2, core_heads=1)
    m0 = CondUNet(**kw)
    m1 = CondUNet(attn_slab=True, **kw)
    rng = np.random.default_rng(3)
    B = 4
    cond = jnp.asarray(rng.normal(size=(B, 96, 4)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, 29)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 50, B), jnp.int32)
    params = m0.init(jax.random.key(0), x, t, cond)["params"]
    # identical param tree -> the slab model accepts it directly
    y0 = m0.apply({"params": params}, x, t, cond)
    y1 = m1.apply({"params": params}, x, t, cond)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    g0 = jax.grad(lambda p: jnp.sum(
        m0.apply({"params": p}, x, t, cond) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(
        m1.apply({"params": p}, x, t, cond) ** 2))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                     jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_mega_plan_accepts_bf16(monkeypatch):
    """bf16-activation models must route to the fused-core kernel, not
    the XLA fallback (VERDICT r4 item 1: the bf16 XLA ensemble measured
    2.5x SLOWER than f32 while the kernel's matmuls are bf16 MXU passes
    either way). Unknown dtypes still fall back."""
    import jax as _jax
    from ertdx.models.condunet import CondUNet
    from ertdx.models import mega as mega_mod

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    kw = dict(param_dim=29, hidden_dim=128, cond_channels=4, base_width=16,
              depth=2, num_blocks=2, num_heads=2, core_heads=1,
              ensemble_mega=True)
    assert mega_mod.mega_plan(
        CondUNet(dtype=jnp.bfloat16, **kw), 1000, 32) is not None
    assert mega_mod.mega_plan(
        CondUNet(dtype="bfloat16", **kw), 1000, 32) is not None
    assert mega_mod.mega_plan(
        CondUNet(dtype=jnp.float16, **kw), 1000, 32) is None


@pytest.mark.slow
def test_mega_denoise_bf16_model_parity():
    """A bf16 model's fused-core posterior step must match its own XLA
    path inside the bf16 accumulation band: the context arrives
    bf16-encoded, the kernel casts chain-side operands to f32 at entry
    (models/mega.py), and the only remaining divergence is the core
    blocks' compute dtype (bf16 flax vs f32-register kernel)."""
    from ertdx.models.condunet import CondUNet
    from ertdx.models.mega import mega_denoise_ensemble
    from ertdx.ops.core_block import pick_chunk

    n_real, d = 16, 32
    model = CondUNet(param_dim=29, hidden_dim=d, cond_channels=4,
                     base_width=16, depth=2, num_blocks=2,
                     num_heads=2, core_heads=1, dtype=jnp.bfloat16)
    rng = np.random.default_rng(5)
    B = 4
    cond = jnp.asarray(rng.normal(size=(B, 96, 4)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B * n_real, 29)), jnp.float32)
    t = jnp.full((B * n_real,), 7, jnp.int32)
    variables = model.init(jax.random.key(0), x[:B], t[:B], cond)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.key(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)])
    ctx = model.apply({"params": params}, cond,
                      method=model.encode_condition)
    assert ctx[0].dtype == jnp.bfloat16        # the case under test
    ref = model.apply({"params": params}, x, t, ctx, n_real,
                      method=model.denoise_ensemble)
    assert ref.dtype == jnp.float32            # head stays f32
    chunk = pick_chunk(n_real, 29)
    out = mega_denoise_ensemble(params, x, t, ctx, n_real, p=29, d=d,
                                num_blocks=2, chunk=chunk, stack=True,
                                interpret=True)
    assert out.dtype == jnp.float32
    # bf16 accumulation band (core_block.py module docstring): per-matmul
    # ~2e-3 relative; four residual blocks compound to low-1e-2 absolute
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_mega_plan_vmem_gate(monkeypatch):
    """Oversize configs (weight stacks/logit tiles beyond the ~16 MiB
    VMEM budget) must never reach the Mosaic compiler (ADVICE r2): the
    pickers first SHRINK the tile/chunk until the working set fits, and
    only truly oversize configs fall back to XLA. Backend is faked to
    'tpu' so the VMEM check — not the backend gate — decides."""
    import jax as _jax
    from ertdx.models.condunet import CondUNet
    from ertdx.models import mega as mega_mod
    from ertdx.ops.core_block import (_CORE_VMEM_BUDGET, block_vmem_bytes,
                                      pick_chunk, stack_vmem_bytes)

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    kw = dict(param_dim=29, cond_channels=4, base_width=16, depth=2,
              num_blocks=4, num_heads=2, core_heads=1, ensemble_mega=True)
    ok = mega_mod.mega_plan(CondUNet(hidden_dim=128, **kw), 1000, 32)
    assert ok is not None and ok["stack"]          # production config fits
    # hidden_dim 256: the stack kernel's resident weight stacks blow the
    # budget at EVERY tile, but the per-block kernel fits at a shrunk
    # chunk — the plan degrades to it instead of abandoning the fused path
    wide = mega_mod.mega_plan(CondUNet(hidden_dim=256, **kw), 1000, 32)
    assert wide is not None and not wide["stack"]
    assert block_vmem_bytes(29, 256, 147,
                            wide["chunk"]) <= _CORE_VMEM_BUDGET
    assert stack_vmem_bytes(29, 256, 4, 147, 1000) > _CORE_VMEM_BUDGET
    assert block_vmem_bytes(29, 256, 147,
                            pick_chunk(1000, 29)) > _CORE_VMEM_BUDGET
    # truly oversize (wide model AND huge param_dim): no chunk fits ->
    # XLA fallback
    assert mega_mod.mega_plan(
        CondUNet(hidden_dim=1024, **{**kw, "param_dim": 512}),
        1000, 32) is None
    # estimates are p-aware: a huge param_dim shrinks the tile, and the
    # working reference configs stay inside the budget
    assert pick_chunk(1000, 512) == 1
    assert stack_vmem_bytes(29, 128, 4, 147, 1000) <= _CORE_VMEM_BUDGET


def test_chunk_candidates_min_tile_floor():
    """Awkward realization counts (prime R, tiny divisors only) must
    yield NO fused-path candidate instead of a degenerate 1-chain tile
    (29-row programs, an order slower than the XLA fallback)."""
    from ertdx.ops.core_block import chunk_candidates, pick_chunk

    assert chunk_candidates(997, 29) == []          # prime R -> XLA
    assert pick_chunk(997, 29) == 0
    # whole-chunk small tiles still allowed (the reference's R=50 -> 10)
    assert pick_chunk(50, 29) == 10
    assert pick_chunk(12, 29) == 12                 # whole chunk, small R
    # 8-divisible tiles unaffected
    assert pick_chunk(32, 29) % 8 == 0
