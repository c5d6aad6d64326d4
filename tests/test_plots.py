import numpy as np

from ertdx import metrics as M
from ertdx import plots


def test_all_figure_families(tmp_path, rng):
    sim = rng.normal(5.0, 1.0, size=(12, 20, 4))
    cond = rng.normal(5.0, 1.0, size=(20, 4))

    plots.plot_loss_curves([1.0, 0.5, 0.3], [1.1, 0.6, 0.4],
                           path=str(tmp_path / "loss.png"))
    plots.plot_param_histograms(rng.uniform(size=(50, 29)),
                                rng.normal(size=(50, 29)), 0,
                                path=str(tmp_path / "hist.png"))
    plots.plot_ert_heatmap(cond, path=str(tmp_path / "ert.png"))

    reals = rng.normal(0.5, 0.1, size=(30, 8, 29))
    true = rng.normal(0.5, 0.1, size=(8, 29))
    plots.plot_posterior_param(reals, true, 0, sample_idx=(0, 5),
                               path=str(tmp_path / "post.png"))

    wsse = M.wsse_per_simulation(sim, cond)
    plots.plot_wsse_per_survey(wsse, path=str(tmp_path / "wsse.png"))
    plots.plot_best_sim_panels(sim, cond, wsse.sum(axis=1), best_n=2,
                               path=str(tmp_path / "best.png"))

    stats = M.ensemble_statistics(sim, cond)
    plots.plot_ensemble_grid(stats, cond, path=str(tmp_path / "grid.png"))

    pred = rng.normal(0, 1, size=(100, 40))
    plots.plot_coverage(pred, rng.normal(0, 1, size=40),
                        path=str(tmp_path / "cov.png"))

    plots.plot_sampling_diagnostics(rng.uniform(size=(64, 29)),
                                    output_dir=str(tmp_path))

    # standalone identity scatters + per-sim MSE KDE (ref :905-938)
    plots.plot_estimate_vs_conditional(stats["mean"], cond, "Ensemble Mean",
                                       path=str(tmp_path / "mean_sc.png"))
    plots.plot_estimate_vs_conditional(stats["mode"], cond, "Ensemble Mode",
                                       path=str(tmp_path / "mode_sc.png"))
    plots.plot_mse_distribution(sim, cond,
                                path=str(tmp_path / "mse_kde.png"))

    expected = ["loss.png", "hist.png", "ert.png", "post.png", "wsse.png",
                "best.png", "grid.png", "cov.png",
                "sampling_diagnostics.png", "parameter_correlations.png",
                "mean_sc.png", "mode_sc.png", "mse_kde.png"]
    for name in expected:
        f = tmp_path / name
        assert f.exists() and f.stat().st_size > 1000, name
