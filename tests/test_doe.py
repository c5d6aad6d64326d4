import numpy as np

from ertdx.doe import ParameterSampler, SurrogateDataGenerator
from ertdx.params import ParameterSpace


def test_mean_parameters_matches_reference():
    sp = ParameterSpace()
    ps = ParameterSampler(sp)
    expected = np.array([np.average(sp.plims[i]) for i in range(29)])
    np.testing.assert_allclose(ps.get_mean_parameters(), expected)


def test_uniform_sample_in_bounds():
    sp = ParameterSpace()
    ps = ParameterSampler(sp, rng=np.random.default_rng(0))
    for _ in range(20):
        pm = ps.sample()
        assert sp.contains(pm[None, :]).all()


def test_log_uniform_marginal():
    """Log params should be ~log-uniform: median of log10 near mid-range."""
    sp = ParameterSpace()
    ps = ParameterSampler(sp, rng=np.random.default_rng(1))
    draws = np.array([ps.sample() for _ in range(800)])
    i = 1  # Hanford horizontal permeability, bounds [2e-13, 1e-7]
    logs = np.log10(draws[:, i])
    mid = (np.log10(2e-13) + np.log10(1e-7)) / 2
    assert abs(np.median(logs) - mid) < 0.25
    # a linear-uniform draw would have median ~ 5e-8 -> log10 ~ -7.3
    assert np.median(logs) < -9


def test_build_mod_in():
    sp = ParameterSpace()
    ps = ParameterSampler(sp, rng=np.random.default_rng(2))
    means = ps.get_mean_parameters()
    # psdevs are ABSOLUTE per-param stddevs (the reference's log-space rule
    # sd = |log10(mean)*psdev/mean| assumes they scale with the mean)
    out = ps.build_mod_in(means, 0.05 * means, 10)
    assert out.shape == (10, 29)
    np.testing.assert_array_equal(out[0], means)     # row 0 is the mean
    assert sp.contains(out).all()                    # all rows in bounds
    # scalar sdev also accepted (matches reference isinstance check);
    # use an O(1)-scale space so one scalar makes sense for every param
    import dataclasses
    small = dataclasses.replace(
        sp, plims=np.tile([[0.0, 1.0]], (29, 1)).astype(float),
        logparms=())
    ps2 = ParameterSampler(small, rng=np.random.default_rng(3))
    out2 = ps2.build_mod_in(np.full(29, 0.5), 0.1, 4)
    assert out2.shape == (4, 29)
    assert small.contains(out2).all()


def test_sobol_lhs_designs():
    sp = ParameterSpace()
    for method in ("sobol", "lhs"):
        gen = SurrogateDataGenerator(sp, seed=3)
        params = gen.generate_training_samples(64, method=method)
        assert params.shape == (64, 29)
        assert sp.contains(params).all()
        # log param spread spans orders of magnitude
        logs = np.log10(params[:, 1])
        assert logs.max() - logs.min() > 3


def test_invalid_method():
    import pytest
    with pytest.raises(ValueError):
        SurrogateDataGenerator().generate_training_samples(8, method="bad")
