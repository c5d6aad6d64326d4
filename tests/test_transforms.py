import jax.numpy as jnp
import numpy as np
import pytest

from ertdx.params import ParameterSpace
from ertdx.transforms import (MinMaxScaler, ParameterScaler,
                              check_param_bounds, inverse_transform,
                              param_bounds_mask, transform_to_unconstrained)


def test_logit_roundtrip(rng):
    x = rng.uniform(0.01, 0.99, size=(100, 29))
    u = transform_to_unconstrained(x, 0.0, 1.0)
    back = inverse_transform(u, 0.0, 1.0)
    np.testing.assert_allclose(back, x, rtol=1e-6, atol=1e-9)


def test_logit_eps_clamp():
    # values at/outside [a,b] clamp at the eps boundary — finite outputs
    x = np.array([0.0, 1.0, -0.5, 1.5])
    u = transform_to_unconstrained(x, 0.0, 1.0)
    assert np.isfinite(u).all()
    expected = np.log((1 - 1e-6) / 1e-6)
    np.testing.assert_allclose(u[1], expected, rtol=1e-6)
    np.testing.assert_allclose(u[0], -expected, rtol=1e-6)


def test_logit_matches_reference_formula(rng):
    x = rng.uniform(-0.2, 1.2, size=(50,))
    a, b = -1.0, 2.0
    eps = 1e-6
    xn = np.clip((x - a) / (b - a), eps, 1 - eps)
    expected = np.log(xn / (1 - xn))
    np.testing.assert_allclose(
        transform_to_unconstrained(x, a, b), expected, rtol=1e-7)


def test_logit_jax_and_numpy_agree(rng):
    x = rng.uniform(0.0, 1.0, size=(20, 5))
    u_np = transform_to_unconstrained(x)
    u_jx = transform_to_unconstrained(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(u_jx), u_np, rtol=1e-4, atol=1e-5)


def test_minmax_matches_sklearn(rng):
    from sklearn.preprocessing import MinMaxScaler as SkMinMax
    x = rng.normal(3.0, 2.0, size=(40, 7))
    ours = MinMaxScaler.fit(x, (0.0, 1.0))
    sk = SkMinMax(feature_range=(0, 1)).fit(x)
    np.testing.assert_allclose(ours.transform(x), sk.transform(x),
                               rtol=1e-12)
    y = rng.normal(size=(10, 7))
    np.testing.assert_allclose(ours.inverse(y), sk.inverse_transform(y),
                               rtol=1e-9)


def test_minmax_roundtrip_and_state(rng):
    x = rng.normal(size=(30, 4))
    sc = MinMaxScaler.fit(x)
    np.testing.assert_allclose(sc.inverse(sc.transform(x)), x, atol=1e-12)
    sc2 = MinMaxScaler.from_state_dict(sc.state_dict())
    np.testing.assert_allclose(sc2.transform(x), sc.transform(x))


def test_minmax_constant_column():
    x = np.ones((5, 2))
    x[:, 1] = np.arange(5)
    sc = MinMaxScaler.fit(x)
    out = sc.transform(x)
    assert np.isfinite(out).all()


def test_param_scaler_roundtrip(rng):
    sp = ParameterSpace()
    ps = ParameterScaler(sp)
    # random physical draws inside bounds (log-uniform on log params)
    lo, hi = sp.effective_bounds()
    u = rng.uniform(size=(50, 29))
    pm = np.where(sp.log_mask, 10 ** (lo + (hi - lo) * u),
                  lo + (hi - lo) * u)
    s = ps.scale(pm)
    assert (s >= -1e-9).all() and (s <= 1 + 1e-9).all()
    back = ps.descale(s)
    np.testing.assert_allclose(back, pm, rtol=1e-9)


def test_param_scaler_matches_reference_loop(rng):
    """Vectorized scaler == the reference's per-element loop
    (Generate_ERT_utils.py:103-130)."""
    sp = ParameterSpace()
    ps = ParameterScaler(sp)
    pm = sp.plims.mean(axis=1)
    # reference scale loop
    expected = np.zeros(29)
    for i in range(29):
        p = sp.plims[i]
        expected[i] = (1 / (p[1] - p[0])) * (pm[i] - p[0])
    for i in sp.logparms:
        p = sp.plims[i]
        pmin, pmax = np.log10(p[0]), np.log10(p[1])
        expected[i] = (1 / (pmax - pmin)) * (np.log10(pm[i]) - pmin)
    np.testing.assert_allclose(ps.scale(pm), expected, rtol=1e-12)
    # reference descale loop
    u = rng.uniform(size=29)
    exp_d = np.zeros(29)
    for i in range(29):
        p = sp.plims[i]
        exp_d[i] = (p[1] - p[0]) * u[i] + p[0]
    for i in sp.logparms:
        p = sp.plims[i]
        pmin, pmax = np.log10(p[0]), np.log10(p[1])
        exp_d[i] = 10 ** ((pmax - pmin) * u[i] + pmin)
    np.testing.assert_allclose(ps.descale(u), exp_d, rtol=1e-12)


def test_param_scaler_clamps():
    ps = ParameterScaler()
    out = ps.descale(np.full(29, -0.5))  # below range
    sp = ParameterSpace()
    np.testing.assert_allclose(out, sp.lo, rtol=1e-12)
    out = ps.descale(np.full(29, 1.5))
    np.testing.assert_allclose(out, sp.hi, rtol=1e-12)


def test_check_param_bounds_filters(capsys):
    limits = np.array([[0.0, 1.0], [0.0, 1.0]])
    param = np.array([[0.5, 0.5], [1.5, 0.5], [0.2, 0.9]])
    out = check_param_bounds(param, limits)
    assert out.shape == (2, 2)
    assert "Sample 1 Parameter 0" in capsys.readouterr().out
    assert check_param_bounds(np.array([[2.0, 2.0]]), limits) is None


def test_param_bounds_mask_jit():
    import jax
    limits = jnp.array([[0.0, 1.0], [0.0, 1.0]])
    param = jnp.array([[0.5, 0.5], [1.5, 0.5]])
    mask = jax.jit(param_bounds_mask)(param, limits)
    np.testing.assert_array_equal(np.asarray(mask), [True, False])
