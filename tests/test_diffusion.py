import jax
import jax.numpy as jnp
import numpy as np

import pytest

from ertdx.diffusion import (ddim_timesteps, get_diffusion_schedule,
                             lambda_timesteps, pd_grid, q_sample,
                             sample_ancestral, sample_ddim, sample_dpmpp_2m,
                             sample_pd)


def test_schedule_closed_form():
    T = 500
    sch = get_diffusion_schedule(T)
    betas = np.linspace(1e-4, 0.02, T, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(sch.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sch.alphas), 1 - betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sch.alpha_bar),
                               np.cumprod(1 - betas.astype(np.float64)),
                               rtol=1e-4)
    assert sch.num_steps == T
    assert np.asarray(sch.alpha_bar)[-1] < 0.01  # near-pure noise at T


def test_q_sample_formula():
    sch = get_diffusion_schedule(100)
    x0 = jnp.ones((4, 29))
    noise = jnp.full((4, 29), 2.0)
    t = jnp.array([0, 10, 50, 99])
    out = q_sample(x0, t, noise, sch.alpha_bar)
    ab = np.asarray(sch.alpha_bar)[np.asarray(t)]
    expected = np.broadcast_to(
        np.sqrt(ab)[:, None] * 1.0 + np.sqrt(1 - ab)[:, None] * 2.0, (4, 29))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_q_sample_statistics():
    """Marginal of q(x_t|x0) is N(sqrt(ab)x0, (1-ab)I)."""
    sch = get_diffusion_schedule(500)
    key = jax.random.key(0)
    n = 20000
    x0 = jnp.full((n, 2), 0.7)
    noise = jax.random.normal(key, (n, 2))
    t = jnp.full((n,), 250, jnp.int32)
    xt = np.asarray(q_sample(x0, t, noise, sch.alpha_bar))
    ab = float(sch.alpha_bar[250])
    assert abs(xt.mean() - np.sqrt(ab) * 0.7) < 0.02
    assert abs(xt.std() - np.sqrt(1 - ab)) < 0.02


def _perfect_denoiser(mu):
    """For x0 ~ N(mu, I) the posterior-optimal eps-predictor is linear:
    E[eps | x_t] = (x_t - sqrt(ab_t) mu) * sqrt(1-ab_t) / (ab_t + 1 - ab_t)
                 = (x_t - sqrt(ab_t) mu) * sqrt(1-ab_t) / (x_t variance)."""
    def make(schedule):
        ab = schedule.alpha_bar

        def fn(x, t):
            ab_t = ab[t][:, None]
            var = ab_t * 1.0 + (1 - ab_t)  # = 1 for unit-variance data
            return (x - jnp.sqrt(ab_t) * mu) * jnp.sqrt(1 - ab_t) / var

        return fn
    return make


def test_ancestral_recovers_gaussian():
    """Config[1]-style tolerance check: with the analytically optimal
    denoiser for N(mu, I) data, ancestral sampling reproduces N(mu, I)."""
    mu = 1.5
    sch = get_diffusion_schedule(500)
    denoise = _perfect_denoiser(mu)(sch)
    key = jax.random.key(7)
    out = sample_ancestral(denoise, key, (4000, 2), sch)
    x = np.asarray(out)
    assert abs(x.mean() - mu) < 0.1
    assert abs(x.std() - 1.0) < 0.1


def test_ddim_recovers_gaussian():
    mu = -0.8
    sch = get_diffusion_schedule(500)
    denoise = _perfect_denoiser(mu)(sch)
    out = sample_ddim(denoise, jax.random.key(3), (4000, 2), sch,
                      num_steps=50, eta=0.0)
    x = np.asarray(out)
    assert abs(x.mean() - mu) < 0.1
    assert abs(x.std() - 1.0) < 0.15


def test_ddim_timesteps():
    ts = np.asarray(ddim_timesteps(500, 50))
    assert ts.shape == (50,)
    # both endpoints included: the chain must start at the noisiest step
    # or the N(0,I) prior is mismatched by sqrt(abar_start)
    assert ts[0] == 0 and ts[-1] == 499
    assert (np.diff(ts) >= 10).all() and (np.diff(ts) <= 11).all()
    # full-schedule subsequence is the identity
    assert (np.asarray(ddim_timesteps(200, 200)) == np.arange(200)).all()
    # strictly increasing for any num_steps <= T
    for n in (1, 2, 3, 7, 499, 500):
        tsn = np.asarray(ddim_timesteps(500, n))
        assert tsn.shape == (n,) and (np.diff(tsn) > 0).all()
    assert np.asarray(ddim_timesteps(500, 1))[0] == 499


def test_samplers_reproducible():
    sch = get_diffusion_schedule(50)
    denoise = _perfect_denoiser(0.0)(sch)
    key = jax.random.key(11)
    a = sample_ancestral(denoise, key, (8, 4), sch)
    b = sample_ancestral(denoise, key, (8, 4), sch)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sample_ancestral(denoise, jax.random.key(12), (8, 4), sch)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_truncate_steps_compat():
    """Reference `num_steps` truncation: starts the chain at t=k-1."""
    sch = get_diffusion_schedule(500)
    denoise = _perfect_denoiser(0.0)(sch)
    out = sample_ancestral(denoise, jax.random.key(0), (16, 3), sch,
                           truncate_steps=10)
    assert np.isfinite(np.asarray(out)).all()


def test_temperature_scales_stochasticity():
    sch = get_diffusion_schedule(100)
    denoise = _perfect_denoiser(0.5)(sch)
    cold = np.asarray(sample_ancestral(denoise, jax.random.key(5), (2000, 2),
                                       sch, temperature=0.0))
    warm = np.asarray(sample_ancestral(denoise, jax.random.key(5), (2000, 2),
                                       sch, temperature=1.0))
    assert np.isfinite(cold).all() and np.isfinite(warm).all()
    # zero temperature removes the per-step noise -> tighter ensemble
    assert cold.std() < 0.8 * warm.std()


def test_ddim_temperature_semantics():
    """DDIM temperature scales ONLY the injected noise: a bitwise no-op at
    eta=0 (no noise term), tempering at eta=1 (temperature=0 collapses the
    per-step noise -> tighter ensemble). Also accepts a traced scalar."""
    sch = get_diffusion_schedule(100)
    denoise = _perfect_denoiser(0.5)(sch)
    k = jax.random.key(7)
    det_a = np.asarray(sample_ddim(denoise, k, (64, 2), sch, num_steps=25,
                                   eta=0.0, temperature=1.0))
    det_b = np.asarray(sample_ddim(denoise, k, (64, 2), sch, num_steps=25,
                                   eta=0.0, temperature=2.0))
    np.testing.assert_array_equal(det_a, det_b)
    cold = np.asarray(sample_ddim(denoise, k, (2000, 2), sch, num_steps=50,
                                  eta=1.0, temperature=jnp.float32(0.0)))
    warm = np.asarray(sample_ddim(denoise, k, (2000, 2), sch, num_steps=50,
                                  eta=1.0, temperature=jnp.float32(1.0)))
    assert np.isfinite(cold).all() and np.isfinite(warm).all()
    assert cold.std() < 0.8 * warm.std()


def test_dpmpp_matches_target_distribution():
    """DPM-Solver++(2M) at 12 steps sits on the converged ODE solution and
    near the analytic target N(mu, 1) (up to the schedule's inherent
    sqrt(abar_T) prior mismatch, ~0.08 mean for T=500 — shared by ancestral
    and DDIM alike, see test_sample_ancestral_* tolerances)."""
    mu = 0.9
    sch = get_diffusion_schedule(500)
    denoise = _perfect_denoiser(mu)(sch)
    coarse = np.asarray(sample_dpmpp_2m(denoise, jax.random.key(3), (6000, 2),
                                        sch, num_steps=12))
    fine = np.asarray(sample_dpmpp_2m(denoise, jax.random.key(3), (6000, 2),
                                      sch, num_steps=100))
    assert np.isfinite(coarse).all()
    # 12 steps lands within tight moment distance of the converged solution
    assert abs(coarse.mean() - fine.mean()) < 0.01
    assert abs(coarse.std() - fine.std()) < 0.03
    # and loosely on the analytic target
    assert abs(coarse.mean() - mu) < 0.15
    assert abs(coarse.std() - 1.0) < 0.1


def test_dpmpp_beats_ddim_at_equal_steps():
    """Second-order multistep has lower discretization error than first-order
    DDIM at the same (small) denoiser-call budget: the coarse-grid terminal
    moments sit closer to the analytic target."""
    mu = 0.9
    sch = get_diffusion_schedule(500)
    denoise = _perfect_denoiser(mu)(sch)
    n, steps = 8000, 8

    def moment_err(x):
        return abs(x.mean() - mu) + abs(x.std() - 1.0)

    dpm = np.asarray(sample_dpmpp_2m(denoise, jax.random.key(4), (n, 2),
                                     sch, num_steps=steps))
    ddim = np.asarray(sample_ddim(denoise, jax.random.key(4), (n, 2),
                                  sch, num_steps=steps, eta=0.0))
    assert moment_err(dpm) < moment_err(ddim)


def test_dpmpp_temperature_tempers_prior():
    """For the deterministic ODE sampler, temperature scales the initial
    draw: temp=0 collapses the ensemble to a point; larger temp widens it."""
    sch = get_diffusion_schedule(200)
    denoise = _perfect_denoiser(0.5)(sch)
    k = jax.random.key(6)
    frozen = np.asarray(sample_dpmpp_2m(denoise, k, (512, 2), sch,
                                        num_steps=12, temperature=0.0))
    base = np.asarray(sample_dpmpp_2m(denoise, k, (512, 2), sch,
                                      num_steps=12, temperature=1.0))
    warm = np.asarray(sample_dpmpp_2m(denoise, k, (512, 2), sch,
                                      num_steps=12,
                                      temperature=jnp.float32(1.5)))
    assert frozen.std() < 1e-5
    assert base.std() * 1.2 < warm.std()


def test_ddim_eta1_matches_ancestral_statistically():
    """DDIM over the FULL schedule with eta=1 is the DDPM ancestral sampler
    (up to RNG stream): with the analytic denoiser both must reproduce the
    same target distribution."""
    mu = 0.9
    sch = get_diffusion_schedule(200)
    denoise = _perfect_denoiser(mu)(sch)
    anc = np.asarray(sample_ancestral(denoise, jax.random.key(1),
                                      (4000, 2), sch))
    ddim = np.asarray(sample_ddim(denoise, jax.random.key(2), (4000, 2),
                                  sch, num_steps=200, eta=1.0))
    # the two samplers agree closely; both carry the same O(1/T)
    # discretization bias toward mu at T=200, so the absolute check is
    # looser than the pairwise one
    assert abs(anc.mean() - ddim.mean()) < 0.08
    assert abs(anc.std() - ddim.std()) < 0.08
    assert abs(ddim.mean() - mu) < 0.2


def test_lambda_timesteps_oversized_budget_raises():
    """dpmpp step budgets beyond T would silently degrade into duplicate
    (full-cost identity) solver steps; mirror ddim_timesteps and raise."""
    sch = get_diffusion_schedule(10)
    with pytest.raises(ValueError, match="num_steps"):
        lambda_timesteps(sch, 50)
    assert np.asarray(lambda_timesteps(sch, 10)).shape == (10,)


def test_truncate_steps_oversize_raises():
    """truncate_steps > T would silently clamp OOB schedule gathers under
    jit (repeating the t=T-1 update); it must raise instead."""
    sch = get_diffusion_schedule(10)
    with pytest.raises(ValueError, match="truncate_steps"):
        sample_ancestral(lambda x, t: x, jax.random.key(0), (2, 4), sch,
                         truncate_steps=11)


def test_pd_grid_properties():
    """PD grid: exact indices of the signal fractions i/N, and the halving
    nesting invariant progressive distillation depends on."""
    # full chain is the identity grid
    assert (np.asarray(pd_grid(500, 500)) == np.arange(500)).all()
    # one step = the noisiest index
    assert np.asarray(pd_grid(500, 1)) == [499]
    for T in (500, 10, 37, 1000):
        for n in (1, 2, 3, 4, 5, 8):
            if n > T:
                continue
            g = np.asarray(pd_grid(T, n))
            assert g.shape == (n,) and (np.diff(g) > 0).all()
            assert g[-1] == T - 1 and g[0] >= 0
            if 2 * n <= T:
                g2 = np.asarray(pd_grid(T, 2 * n))
                # student step i spans exactly teacher steps 2i-1, 2i
                np.testing.assert_array_equal(g2[1::2], g)
    with pytest.raises(ValueError):
        pd_grid(10, 11)
    with pytest.raises(ValueError):
        pd_grid(10, 0)


def test_sample_pd_recovers_gaussian():
    """With the analytic denoiser, the PD-grid deterministic chain matches
    the DDIM-grid one at moderate step counts (both are eta=0 chains on
    slightly different grids)."""
    mu = 0.9
    sch = get_diffusion_schedule(500)
    denoise = _perfect_denoiser(mu)(sch)
    out = np.asarray(sample_pd(denoise, jax.random.key(2), (4000, 2), sch,
                               num_steps=8))
    assert abs(out.mean() - mu) < 0.1
    assert abs(out.std() - 1.0) < 0.15


def test_sample_pd_full_grid_matches_ddim_eta0():
    """pd_grid(T, T) is the identity grid, so sample_pd at num_steps=T is
    the same deterministic map as DDIM eta=0 at num_steps=T. Align the
    prior draws (sample_ddim splits its key before drawing x_init) and
    the chains must agree pointwise."""
    sch = get_diffusion_schedule(20)
    denoise = _perfect_denoiser(0.3)(sch)
    key = jax.random.key(4)
    _, init_key = jax.random.split(key)
    a = np.asarray(sample_pd(denoise, init_key, (16, 3), sch, num_steps=20))
    b = np.asarray(sample_ddim(denoise, key, (16, 3), sch, num_steps=20,
                               eta=0.0))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def test_sample_pd_prior_temperature():
    """temperature scales the PRIOR draw of the deterministic chain:
    higher T widens the output spread monotonically."""
    sch = get_diffusion_schedule(100)
    denoise = _perfect_denoiser(0.0)(sch)
    cold = np.asarray(sample_pd(denoise, jax.random.key(1), (2000, 2), sch,
                                num_steps=4, temperature=0.2))
    hot = np.asarray(sample_pd(denoise, jax.random.key(1), (2000, 2), sch,
                               num_steps=4, temperature=2.0))
    assert hot.std() > cold.std() * 1.5


def test_sample_pd_one_step_is_x0_prediction():
    """num_steps=1: the chain is a single x0-extrapolation from t=T-1."""
    sch = get_diffusion_schedule(50)
    denoise = _perfect_denoiser(0.0)(sch)
    key = jax.random.key(7)
    out = np.asarray(sample_pd(denoise, key, (8, 4), sch, num_steps=1))
    x = jax.random.normal(key, (8, 4))
    t = jnp.full((8,), 49, jnp.int32)
    eps = denoise(x, t)
    ab = sch.alpha_bar[49]
    want = (x - jnp.sqrt(1 - ab) * eps) / jnp.sqrt(ab)
    np.testing.assert_allclose(out, np.asarray(want), atol=1e-5)


def test_vector_temperature_per_dimension():
    """A (D,) temperature vector tempers each sample dimension
    independently, and a vector of ones is exactly the scalar program."""
    import jax
    import jax.numpy as jnp

    from ertdx.diffusion import (get_diffusion_schedule, sample_ancestral,
                                 sample_pd)

    sch = get_diffusion_schedule(20)
    zero_fn = lambda x, t: jnp.zeros_like(x)
    key = jax.random.key(7)
    temps = jnp.asarray([0.25, 1.0, 3.0], jnp.float32)

    x = sample_ancestral(zero_fn, key, (4096, 3), sch, temperature=temps)
    sds = np.std(np.asarray(x), axis=0)
    assert sds[0] < sds[1] < sds[2]

    ones = sample_ancestral(zero_fn, key, (4096, 3), sch,
                            temperature=jnp.ones(3))
    scalar = sample_ancestral(zero_fn, key, (4096, 3), sch,
                              temperature=1.0)
    np.testing.assert_allclose(np.asarray(ones), np.asarray(scalar),
                               rtol=1e-6)

    # deterministic few-step chain: the vector tempers the PRIOR draw
    xp = sample_pd(zero_fn, key, (4096, 3), sch, num_steps=2,
                   temperature=temps)
    sds_p = np.std(np.asarray(xp), axis=0)
    assert sds_p[0] < sds_p[1] < sds_p[2]


def test_posterior_ensemble_rejects_bad_temperature_shape():
    import types

    import pytest

    from ertdx.configs import SampleConfig
    from ertdx.sample import posterior_ensemble

    model = types.SimpleNamespace(param_dim=29)
    with pytest.raises(ValueError, match="length-29"):
        posterior_ensemble(model, None, None, None, None,
                           scfg=SampleConfig(temperature=(1.0, 2.0)))


def test_min_snr_weight_formula():
    """min-SNR-gamma weights vs the hand formula (arXiv:2303.09556):
    eps -> min(SNR,g)/SNR, v -> min(SNR,g)/(SNR+1)."""
    from ertdx.diffusion import min_snr_weight

    sch = get_diffusion_schedule(10)
    t = jnp.arange(10, dtype=jnp.int32)
    ab = np.asarray(sch.alpha_bar)
    snr = ab / (1.0 - ab)
    gamma = 5.0

    w_eps = np.asarray(min_snr_weight(t, sch.alpha_bar, "eps", gamma))
    np.testing.assert_allclose(w_eps, np.minimum(snr, gamma) / snr,
                               rtol=1e-6)
    # clamps only the high-SNR (low-t) side; unweighted where SNR <= g
    assert (w_eps <= 1.0 + 1e-6).all()
    np.testing.assert_allclose(w_eps[snr <= gamma], 1.0, rtol=1e-6)
    assert (w_eps[snr > gamma] < 1.0).all()

    w_v = np.asarray(min_snr_weight(t, sch.alpha_bar, "v", gamma))
    np.testing.assert_allclose(w_v, np.minimum(snr, gamma) / (snr + 1.0),
                               rtol=1e-6)

    with pytest.raises(ValueError, match="parameterization"):
        min_snr_weight(t, sch.alpha_bar, "x0", gamma)


def test_cosine_schedule_closed_form():
    """Cosine alpha_bar matches Nichol & Dhariwal Eq. 17 (f(t)/f(0),
    s=0.008) wherever the 0.999 beta clip is inactive; the triple stays
    self-consistent (alpha_bar == cumprod(1-betas)) even where it clips."""
    T = 50
    sch = get_diffusion_schedule(T, kind="cosine")
    s = 0.008
    tt = np.arange(T + 1) / T
    f = np.cos((tt + s) / (1 + s) * np.pi / 2) ** 2
    abar_cf = f[1:] / f[0]
    betas_cf = 1.0 - f[1:] / f[:-1]
    unclipped = betas_cf < 0.999
    np.testing.assert_allclose(np.asarray(sch.alpha_bar)[unclipped],
                               abar_cf[unclipped], rtol=2e-5)
    b = np.asarray(sch.betas)
    assert (b > 0).all() and (b <= 0.999 + 1e-7).all()
    ab = np.asarray(sch.alpha_bar)
    assert (np.diff(ab) < 0).all() and ab[0] < 1.0 and ab[-1] > 0.0
    np.testing.assert_allclose(ab, np.cumprod(1.0 - b), rtol=1e-6)

    with pytest.raises(ValueError, match="schedule kind"):
        get_diffusion_schedule(T, kind="quadratic")


def test_cosine_schedule_samplers_and_config_plumbing():
    """Every sampler family runs on a cosine schedule (the triple is
    consumed generically), and schedule_from_config builds the kind the
    DiffusionConfig names."""
    from ertdx.configs import DiffusionConfig
    from ertdx.diffusion import schedule_from_config

    sch = schedule_from_config(DiffusionConfig(T=20, schedule="cosine"))
    np.testing.assert_allclose(
        np.asarray(sch.betas),
        np.asarray(get_diffusion_schedule(20, kind="cosine").betas))
    lin = schedule_from_config(DiffusionConfig(T=20))
    np.testing.assert_allclose(
        np.asarray(lin.betas), np.asarray(get_diffusion_schedule(20).betas))

    def zero_fn(x, t):
        return jnp.zeros_like(x)

    key = jax.random.key(0)
    for fn, kw in [(sample_ancestral, {}), (sample_ddim, dict(num_steps=5)),
                   (sample_dpmpp_2m, dict(num_steps=5)),
                   (sample_pd, dict(num_steps=4))]:
        x = fn(zero_fn, key, (8, 3), sch, **kw)
        assert np.isfinite(np.asarray(x)).all(), fn.__name__
