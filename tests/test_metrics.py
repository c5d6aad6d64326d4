import numpy as np
import pytest

from ertdx import metrics as M


def test_wsse_hand_computed():
    obs = np.array([1.0, -2.0])
    pred = np.array([1.5, -1.0])
    # sd = 0.1*|obs| + 0.01 -> [0.11, 0.21]; wse = (diff/sd)^2
    wsse, wse = M.wsse_metric(0.1, 0.01, pred, obs)
    np.testing.assert_allclose(wse, [(0.5 / 0.11) ** 2, (1.0 / 0.21) ** 2])
    np.testing.assert_allclose(wsse, wse.mean())


def test_wsse_per_simulation_matches_loop(rng):
    sim = rng.normal(size=(6, 10, 4))
    cond = rng.normal(size=(10, 4))
    out = M.wsse_per_simulation(sim, cond)
    assert out.shape == (6, 4)
    # the reference's per-(sim, survey) loop
    for s in range(6):
        for es in range(4):
            w, _ = M.wsse_metric(0.1, 0.01, sim[s][:, es], cond[:, es])
            np.testing.assert_allclose(out[s, es], w, rtol=1e-12)


def test_mode_kde_matches_scipy(rng):
    from scipy import stats
    x = np.concatenate([rng.normal(0, 1, 300), rng.normal(4, 0.3, 400)])
    ours = M.mode_kde_calculation(x)
    grid = np.linspace(x.min(), x.max(), 1000)
    ref = grid[np.argmax(stats.gaussian_kde(x)(grid))]
    assert abs(ours - ref) < 0.05


def test_batched_kde_mode_matches_scipy(rng):
    from scipy import stats
    sim = rng.normal(2.0, 0.5, size=(40, 6, 3))
    ours = M.batched_kde_mode(sim, grid_points=500)
    grid = np.linspace(sim.min(), sim.max(), 500)
    for i in range(6):
        for j in range(3):
            ref = grid[np.argmax(stats.gaussian_kde(sim[:, i, j])(grid))]
            assert abs(ours[i, j] - ref) < (grid[1] - grid[0]) * 2 + 1e-6


def test_wasserstein_matches_scipy(rng):
    from scipy.stats import wasserstein_distance
    u = rng.normal(0, 1, 500)
    v = rng.normal(0.5, 2, 300)
    np.testing.assert_allclose(M.wasserstein_1d(u, v),
                               wasserstein_distance(u, v), rtol=1e-9)


def test_ensemble_statistics(rng):
    sim = rng.normal(5.0, 1.0, size=(30, 8, 4))
    cond = rng.normal(5.0, 1.0, size=(8, 4))
    st = M.ensemble_statistics(sim, cond)
    np.testing.assert_allclose(st["mean"], sim.mean(axis=0))
    np.testing.assert_allclose(st["p50"], np.percentile(sim, 50, axis=0))
    assert st["mse_per_sim"].shape == (30,)
    assert st["rmse_mean"] == pytest.approx(np.sqrt(st["mse_mean"]))
    assert np.isfinite(st["wasserstein_mean"])
    assert st["mode"].shape == (8, 4)


# ---------------------------------------------------------------------------
# UQ coverage metrics vs hand-computed cases
# ---------------------------------------------------------------------------

def test_perfect_coverage_scores():
    """Truth at the exact median of a wide symmetric ensemble ->
    coverage 1 at every p -> accuracy = integral(1) = p-range."""
    rng = np.random.default_rng(0)
    pred = rng.normal(0, 1, size=(4001, 50))
    true = np.median(pred, axis=0)  # inside every symmetric interval
    sc = M.uq_scores(pred, true)
    # accuracy == full integral of 1 over [0.01, 0.99] = 0.98
    assert sc["accuracy"] == pytest.approx(0.98, abs=1e-6)
    # xi-bar == 1 everywhere -> precision = 1 - 2*int(1 - p) dp
    probs = sc["prob_array"]
    expected_prec = 1 - 2 * np.trapezoid(1 - probs, probs)
    assert sc["precision"] == pytest.approx(expected_prec, abs=1e-6)


def test_zero_coverage_scores():
    """Truth far outside the ensemble -> coverage 0, accuracy 0,
    precision defined as 0."""
    pred = np.random.default_rng(1).normal(0, 0.1, size=(200, 20))
    true = np.full(20, 100.0)
    sc = M.uq_scores(pred, true)
    assert sc["accuracy"] == 0.0
    assert sc["precision"] == 0.0
    # goodness for a(p)=0: 1 - int(-2 * (0 - p)) dp = 1 - int(2p) dp
    probs = sc["prob_array"]
    expected_good = 1 - np.trapezoid(2 * probs, probs)
    assert sc["goodness"] == pytest.approx(expected_good, abs=1e-6)


def test_well_calibrated_gaussian():
    """Ensemble and truth from the same distribution -> xi-bar ~ p,
    goodness near 1."""
    rng = np.random.default_rng(2)
    pred = rng.normal(0, 1, size=(2000, 500))
    true = rng.normal(0, 1, size=500)
    sc = M.uq_scores(pred, true)
    assert sc["goodness"] > 0.95
    np.testing.assert_allclose(sc["avg_proportion"], sc["prob_array"],
                               atol=0.06)


def test_indicator_and_reference_names():
    probs = np.linspace(0.01, 0.99, 30)
    avg = probs + 0.01
    a_p = M.avg_prop_indicator_function(avg, probs)
    np.testing.assert_array_equal(a_p, np.ones(30, int))
    # reference-parity alias exists (sic)
    assert M.preccision_score is M.precision_score


def test_per_parameter_uq(rng):
    pred = rng.normal(0, 1, size=(100, 40, 29))
    true = rng.normal(0, 1, size=(40, 29))
    rows = M.per_parameter_uq(pred, true)
    assert len(rows) == 29
    assert rows[0]["Parameter"] == "Hanford Fm porosity"
    for r in rows:
        assert 0 <= r["Accuracy"] <= 1


def test_batched_kde_mode_constant_pixel():
    """A zero-variance pixel's mode is its constant value, not the grid
    minimum (the clamped bandwidth underflows its density to zero)."""
    from ertdx.metrics import batched_kde_mode

    rng = np.random.default_rng(0)
    samples = rng.uniform(0.0, 10.0, size=(20, 3, 2))
    samples[:, 1, 0] = 5.0                    # constant ensemble
    modes = batched_kde_mode(samples, grid_points=256)
    assert modes.shape == (3, 2)
    assert modes[1, 0] == pytest.approx(5.0)
    assert 0.0 < modes[0, 0] < 10.0


def test_coverage_proportions_vectorized_matches_loop():
    from ertdx.metrics import coverage_proportions

    rng = np.random.default_rng(3)
    pred = rng.normal(size=(40, 17, 5))
    true = rng.normal(size=(17, 5))
    avg, probs = coverage_proportions(pred, true)
    # reference-style per-p loop (ERT_Conditional_Diffusion.py:1121-1132)
    for i, p in enumerate(probs):
        low = np.percentile(pred, (1 - p) / 2 * 100, axis=0)
        upp = np.percentile(pred, (1 + p) / 2 * 100, axis=0)
        expect = np.mean(((low < true) & (true <= upp)).astype(int))
        assert avg[i] == pytest.approx(expect)
    assert (np.diff(probs) > 0).all()


def test_crps_ensemble_matches_bruteforce_and_is_proper():
    from ertdx.metrics import crps_ensemble

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(7, 5, 3))
    true = rng.normal(size=(5, 3))

    # brute-force definition per cell
    for fair in (True, False):
        got = crps_ensemble(pred, true, fair=fair)
        assert got.shape == (5, 3)
        R = pred.shape[0]
        denom = R * (R - 1) if fair else R * R
        for n in range(5):
            for p in range(3):
                x = pred[:, n, p]
                mae = np.mean(np.abs(x - true[n, p]))
                spread = np.abs(x[:, None] - x[None, :]).sum() / denom
                np.testing.assert_allclose(got[n, p], mae - 0.5 * spread,
                                           rtol=1e-12)

    # propriety sanity: ensembles drawn from the true distribution score
    # better (lower) than shifted or over-dispersed ones, on average
    rng = np.random.default_rng(1)
    y = rng.normal(size=(4000,))
    good = rng.normal(size=(50, 4000))
    shifted = good + 2.0
    wide = rng.normal(scale=4.0, size=(50, 4000))
    c_good = crps_ensemble(good, y).mean()
    assert c_good < crps_ensemble(shifted, y).mean()
    assert c_good < crps_ensemble(wide, y).mean()

    import pytest
    with pytest.raises(ValueError, match="ensemble members"):
        crps_ensemble(good[:1], y)


def test_sbc_ranks_and_uniformity():
    from ertdx.metrics import sbc_ranks, sbc_uniformity

    # hand case: 3 draws, rank = #draws strictly below truth
    pred = np.array([[1.0], [3.0], [5.0]])
    assert sbc_ranks(pred, np.array([0.5]))[0] == 0
    assert sbc_ranks(pred, np.array([4.0]))[0] == 2
    assert sbc_ranks(pred, np.array([9.0]))[0] == 3

    rng = np.random.default_rng(0)
    R, M = 49, 3000
    truth = rng.normal(size=(M,))
    calibrated = rng.normal(size=(R, M))
    under = 0.3 * rng.normal(size=(R, M))          # too sharp
    biased = rng.normal(size=(R, M)) + 1.5

    d_cal = sbc_uniformity(sbc_ranks(calibrated, truth), R)
    d_und = sbc_uniformity(sbc_ranks(under, truth), R)
    d_bia = sbc_uniformity(sbc_ranks(biased, truth), R)
    assert d_cal < 0.05                       # uniform within noise
    assert d_und > 3 * d_cal and d_bia > 3 * d_cal

    # per-parameter axis: (M, P) ranks -> (P,) statistics
    ranks2 = np.stack([sbc_ranks(calibrated, truth),
                       sbc_ranks(under, truth)], axis=1)
    d2 = sbc_uniformity(ranks2, R)
    assert d2.shape == (2,)
    np.testing.assert_allclose(d2, [d_cal, d_und])


def test_accuracy_cliff_vs_graded_sbc():
    """The reference accuracy metric is a CLIFF, not a graded score.

    accuracy = trapz(1[coverage(p) >= p], p) (ERT_Conditional_Diffusion.
    py:1089-1100) scores 0.0 whenever empirical coverage sits a hair
    BELOW nominal at every level — which a finite R-member ensemble
    drawn from the EXACTLY correct predictive distribution does, because
    empirical central percentiles of R draws under-cover slightly at
    every p. SBC KS stays near 0 on the same data (ranks of an
    exchangeable truth are uniform regardless of R). This pins why the
    framework reports CRPS/SBC alongside the reference triple: an
    "accuracy 0.000" posterior can be anywhere from catastrophically
    collapsed (KS ~ 0.3) to nearly calibrated (KS < 0.1).
    """
    from ertdx.metrics import sbc_ranks, sbc_uniformity, uq_scores

    rng = np.random.default_rng(0)
    R, N = 50, 4000
    mu_err = rng.normal(size=(N,))            # model's point error, sd 1
    truth = np.zeros((N,))
    # predictive dist per cell = N(mu_err, 1): truth exchangeable with
    # draws -> perfectly calibrated in the SBC sense
    calibrated = mu_err[None] + rng.normal(size=(R, N))
    sc = uq_scores(calibrated[:, :, None], truth[:, None])
    ks = float(np.mean(sbc_uniformity(sbc_ranks(calibrated, truth), R)))
    assert sc["accuracy"] == 0.0              # the cliff
    assert ks < 0.06                          # the graded truth

    # a genuinely collapsed posterior is distinguishable by KS alone
    collapsed = mu_err[None] + 0.3 * rng.normal(size=(R, N))
    ks_col = float(np.mean(sbc_uniformity(sbc_ranks(collapsed, truth),
                                          R)))
    sc_col = uq_scores(collapsed[:, :, None], truth[:, None])
    assert sc_col["accuracy"] == 0.0          # same cliff reading...
    assert ks_col > 3 * ks                    # ...very different truth
