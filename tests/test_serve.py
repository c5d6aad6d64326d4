"""Posterior-inversion service: checkpoint -> HTTP JSON round trip.

The reference has no serving story (scripts end at .npy files,
ERT_Conditional_Diffusion.py:1036-1086); this is a new-framework
capability (STATUS.md / SURVEY.md §5 production axis).
"""
import http.client
import json
import threading

import numpy as np
import pytest

from ertdx import configs, data as data_lib
from ertdx.serve import PosteriorService, make_server
from ertdx.train import train


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    import dataclasses

    from ertdx.doe import SurrogateDataGenerator

    tmp = tmp_path_factory.mktemp("serve_ckpt")
    params_phys = SurrogateDataGenerator(seed=3).generate_training_samples(
        64, "sobol")
    rng = np.random.default_rng(3)
    ert = rng.normal(50.0, 10.0, size=(64, 96, 4)).astype(np.float32)
    ds = data_lib.prepare_dataset(params_phys[..., None], ert)
    cfg = configs.ExperimentConfig(
        diffusion=configs.DiffusionConfig(T=10),
        model=dataclasses.replace(configs.ModelConfig(), cond_length=96,
                                  cond_channels=4),
        train=dataclasses.replace(configs.TrainConfig(), num_epochs=3,
                                  batch_size=16,
                                  checkpoint_dir=str(tmp / "ckpt"),
                                  log_every=100))
    train(cfg, ds)
    return str(tmp / "ckpt"), cfg, ert


def test_posterior_service_direct(trained_ckpt):
    ckpt, cfg, ert = trained_ckpt
    svc = PosteriorService(ckpt, cfg, max_batch=4)
    out = svc.posterior(ert[:3], n_realizations=5, seed=1)
    assert np.asarray(out["mean"]).shape == (3, 29)
    assert np.asarray(out["p50"]).shape == (3, 29)
    assert len(out["param_names"]) == 29
    assert 0.0 <= out["valid_fraction"] <= 1.0
    # physical draws land inside (or get masked against) the real bounds
    out2 = svc.posterior(ert[:2], n_realizations=4, seed=1,
                         return_draws=True)
    draws = np.asarray(out2["draws"])
    assert draws.shape == (4, 2, 29)
    # same seed -> deterministic response
    out3 = svc.posterior(ert[:2], n_realizations=4, seed=1,
                         return_draws=True)
    np.testing.assert_array_equal(draws, np.asarray(out3["draws"]))
    # over-max batch is a clean error, not a recompile
    with pytest.raises(ValueError):
        svc.posterior(ert[:5], n_realizations=2)


def test_posterior_service_http(trained_ckpt):
    ckpt, cfg, ert = trained_ckpt
    svc = PosteriorService(ckpt, cfg, max_batch=4)
    server = make_server(svc, port=0)          # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1",
                                          server.server_port, timeout=120)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["status"] == "ok"

        body = json.dumps({"conditions": ert[:2].tolist(),
                           "n_realizations": 4, "seed": 2,
                           "sampler": "ddim", "ddim_steps": 5})
        conn.request("POST", "/posterior", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200, r.read()
        out = json.loads(r.read())
        assert np.asarray(out["mean"]).shape == (2, 29)
        assert out["n_realizations"] == 4

        # dpmpp sampler through the request surface
        body = json.dumps({"conditions": ert[:2].tolist(),
                           "n_realizations": 4, "seed": 2,
                           "sampler": "dpmpp", "dpmpp_steps": 4,
                           "temperature": 1.3})
        conn.request("POST", "/posterior", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200, r.read()
        out = json.loads(r.read())
        assert np.asarray(out["mean"]).shape == (2, 29)

        # malformed request -> 400, server stays alive
        conn.request("POST", "/posterior", body=json.dumps({"nope": 1}),
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        _ = r.read()
        assert r.status == 400
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        _ = r.read()
        assert r.status == 200
    finally:
        server.shutdown()
        server.server_close()


def test_scfg_from_request_gate():
    """Any sampler-relevant key must build a SampleConfig — a request
    carrying only guidance_scale/temperature was silently ignored once."""
    from ertdx.serve import scfg_from_request

    assert scfg_from_request({"conditions": [], "n_realizations": 8}) is None
    for key, val, attr in (("guidance_scale", 2.0, "guidance_scale"),
                           ("temperature", 1.5, "temperature"),
                           ("dpmpp_steps", 8, "dpmpp_steps"),
                           ("ddim_eta", 1.0, "ddim_eta"),
                           ("sampler", "ddim", "sampler"),
                           ("ddim_steps", 25, "ddim_steps")):
        scfg = scfg_from_request({"conditions": [], key: val})
        assert scfg is not None and getattr(scfg, attr) == val
    # per-parameter vector tempering arrives as a JSON list -> tuple
    # (SampleConfig must stay hashable)
    scfg = scfg_from_request({"conditions": [], "temperature": [1.0, 2.5]})
    assert scfg.temperature == (1.0, 2.5)
    hash(scfg)
    scfg = scfg_from_request({"conditions": [],
                              "guidance_interval": [0.2, 0.8]})
    assert scfg.guidance_interval == (0.2, 0.8)
    hash(scfg)


def test_masked_posterior_stats():
    """Serving statistics ignore out-of-bounds draws (the reference
    drops them before analyzing); zero-valid conditions fall back to
    all-draw stats."""
    from ertdx.serve import masked_posterior_stats

    rng = np.random.default_rng(0)
    phys = rng.normal(0.0, 1.0, size=(40, 3, 2))
    phys[:20, 0] += 100.0                       # half the draws are junk
    mask = np.ones((40, 3), bool)
    mask[:20, 0] = False                        # ...and flagged invalid
    mask[:, 2] = False                          # condition 2: none valid

    st = masked_posterior_stats(phys, mask)
    # condition 0: junk excluded -> mean near 0, not near 50
    assert abs(st["mean"][0].mean()) < 1.0
    # condition 1: all valid -> plain stats
    np.testing.assert_allclose(st["mean"][1], phys[:, 1].mean(axis=0))
    np.testing.assert_allclose(st["p50"][1],
                               np.percentile(phys[:, 1], 50, axis=0))
    # condition 2: zero valid -> all-draw fallback, finite
    np.testing.assert_allclose(st["mean"][2], phys[:, 2].mean(axis=0))
    for v in st.values():
        assert np.isfinite(v).all()
