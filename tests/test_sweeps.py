"""Sweep-space and local-runner tests."""
import numpy as np
import pytest

from svtpu.sweeps.spaces import (CONTRASTIVE_SPACE, METRIC, SPACES,
                                 TRIPLET_SPACE, sample, to_wandb_config)


def test_sample_respects_bounds():
    rng = np.random.default_rng(0)
    for _ in range(20):
        c = sample(CONTRASTIVE_SPACE, rng)
        assert 1e-5 <= c["learning_rate"] <= 1e-2
        assert c["batch_size"] in (16, 32, 64)
        assert c["latent_dim"] in (25, 50, 75, 100)
        assert 1.0 <= c["init_temperature"] <= 5.0
        assert 550 <= c["num_temp_updates"] <= 1100
        assert c["bernoulli_p"] == 0.1
        assert c["objective"] == "contrastive"


def test_triplet_space_differences():
    rng = np.random.default_rng(1)
    c = sample(TRIPLET_SPACE, rng)
    assert 0.3 <= c["bernoulli_p"] <= 0.7
    assert 0.01 <= c["alpha"] <= 1.0
    assert c["num_epochs"] == 30
    assert METRIC["triplet"] == ("best_val_loss", "minimize")


def test_contrastive_z_space():
    from svtpu.sweeps.spaces import CONTRASTIVE_Z_SPACE

    rng = np.random.default_rng(2)
    c = sample(CONTRASTIVE_Z_SPACE, rng)
    assert c["contrast_on"] == "z"
    assert c["select_by"] == "combined"
    assert 0.5 <= c["margin"] <= 4.0
    assert 0.02 <= c["beta_kl"] <= 1.0
    assert METRIC["contrastive_z"] == ("best_combined_score", "maximize")
    assert "contrastive_z" in SPACES


def test_contrastive_p_space():
    from svtpu.sweeps.spaces import CONTRASTIVE_P_SPACE

    c = sample(CONTRASTIVE_P_SPACE, np.random.default_rng(3))
    assert c["contrast_on"] == "p"
    assert c["select_by"] == "combined"
    assert METRIC["contrastive_p"] == ("best_combined_score", "maximize")
    assert "contrastive_p" in SPACES


def test_wandb_config_shape():
    cfg = to_wandb_config(CONTRASTIVE_SPACE, METRIC["contrastive"])
    assert cfg["method"] == "bayes"
    assert cfg["metric"] == {"name": "best_consistency_score",
                             "goal": "maximize"}
    assert cfg["parameters"]["learning_rate"]["distribution"] == \
        "log_uniform_values"
    assert cfg["parameters"]["batch_size"]["values"] == [16, 32, 64]
    assert cfg["parameters"]["num_epochs"]["value"] == 100


def test_local_sweep_end_to_end(tmp_path):
    """One-trial local random search over a tiny synthetic video."""
    from svtpu.config import VideoMeta
    from svtpu.sweeps import runner
    from svtpu.sweeps.spaces import Space

    class ArrayStore:
        def __init__(self):
            rng = np.random.default_rng(0)
            self.array = rng.integers(0, 255, (48, 16, 16, 3),
                                      dtype=np.uint8)

        @property
        def item_shape(self):
            return self.array.shape[1:]

        def gather(self, idx):
            return self.array[np.asarray(idx)]

    meta = VideoMeta("t", flags=(16, 32), last_frame=47, grey_out=0)
    # Shrink the space for test speed.
    tiny_space = dict(runner.SPACES["contrastive"])
    tiny_space.update({
        "latent_dim": ("const", 6), "batch_size": ("const", 4),
        "num_epochs": ("const", 1),
    })
    runner.SPACES = dict(runner.SPACES, contrastive=tiny_space)
    try:
        res = runner.run_sweep("contrastive", ArrayStore(), meta, count=1,
                               seed=0, save_dir=str(tmp_path),
                               use_wandb=False)
    finally:
        runner.SPACES = SPACES
    assert res["metric"] == "best_consistency_score"
    assert len(res["trials"]) == 1
    assert (tmp_path / "sweep_results.json").exists()


def test_local_sweep_contrastive_z(tmp_path):
    """contrastive_z space maps to the contrastive model, trains with
    contrast_on='z', and optimizes the combined score."""
    from svtpu.config import VideoMeta
    from svtpu.sweeps import runner

    class ArrayStore:
        def __init__(self):
            rng = np.random.default_rng(0)
            self.array = rng.integers(0, 255, (48, 16, 16, 3),
                                      dtype=np.uint8)

        @property
        def item_shape(self):
            return self.array.shape[1:]

        def gather(self, idx):
            return self.array[np.asarray(idx)]

    meta = VideoMeta("t", flags=(16, 32), last_frame=47, grey_out=0)
    tiny = dict(runner.SPACES["contrastive_z"])
    tiny.update({"latent_dim": ("const", 6), "batch_size": ("const", 4),
                 "num_epochs": ("const", 1)})
    runner.SPACES = dict(runner.SPACES, contrastive_z=tiny)
    try:
        res = runner.run_sweep("contrastive_z", ArrayStore(), meta, count=1,
                               seed=0, save_dir=str(tmp_path),
                               use_wandb=False)
    finally:
        runner.SPACES = SPACES
    assert res["metric"] == "best_combined_score"
    t = res["trials"][0]
    assert t["config"]["contrast_on"] == "z"
    assert np.isfinite(t["best_combined_score"])


def test_wandb_sweep_branch_with_mock(tmp_path, monkeypatch):
    """Exercise the W&B Bayesian-sweep branch end-to-end against a mocked
    ``wandb`` module (the environment is zero-egress, so the real agent
    can never run here). The mock plays the sweep controller: it samples
    each trial's config from the submitted sweep ``parameters`` — exactly
    what ``wandb.agent`` does remotely — so ``run_sweep(use_wandb=True)``
    drives real training through ``train_with_config``. Mirrors the
    reference's sweep entry (``contrastive_RBVAE_wandb_sweep.py:248-257``:
    ``wandb.sweep`` + ``wandb.agent(..., count)``)."""
    import sys
    import types

    from svtpu.config import VideoMeta
    from svtpu.sweeps import runner

    class ArrayStore:
        def __init__(self):
            rng = np.random.default_rng(0)
            self.array = rng.integers(0, 255, (48, 16, 16, 3),
                                      dtype=np.uint8)

        @property
        def item_shape(self):
            return self.array.shape[1:]

        def gather(self, idx):
            return self.array[np.asarray(idx)]

    calls = {"sweep": [], "init": 0, "log": [], "save": [], "finish": 0}
    rng = np.random.default_rng(7)

    def _sample_from_wandb_params(params):
        cfg = {}
        for name, spec in params.items():
            if "value" in spec:
                cfg[name] = spec["value"]
            elif "values" in spec:
                cfg[name] = spec["values"][int(rng.integers(
                    len(spec["values"])))]
            elif spec.get("distribution") == "log_uniform_values":
                lo, hi = np.log(spec["min"]), np.log(spec["max"])
                cfg[name] = float(np.exp(rng.uniform(lo, hi)))
            elif spec.get("distribution") == "int_uniform":
                cfg[name] = int(rng.integers(spec["min"], spec["max"] + 1))
            else:  # uniform
                cfg[name] = float(rng.uniform(spec["min"], spec["max"]))
        return cfg

    class FakeRun:
        def __init__(self, config, idx):
            self.config = config
            self.name = f"mock_{idx}"
            self.id = f"id_{idx}"

        def finish(self):
            calls["finish"] += 1

    mock = types.ModuleType("wandb")

    def fake_sweep(cfg, project=None):
        calls["sweep"].append((cfg, project))
        return "sweep_123"

    def fake_init():
        cfg = _sample_from_wandb_params(calls["sweep"][-1][0]["parameters"])
        run = FakeRun(cfg, calls["init"])
        calls["init"] += 1
        return run

    def fake_agent(sweep_id, function=None, count=1):
        assert sweep_id == "sweep_123"
        for _ in range(count):
            function()

    mock.sweep = fake_sweep
    mock.init = fake_init
    mock.agent = fake_agent
    mock.log = lambda d: calls["log"].append(d)
    mock.save = lambda p: calls["save"].append(p)
    monkeypatch.setitem(sys.modules, "wandb", mock)

    meta = VideoMeta("t", flags=(16, 32), last_frame=47, grey_out=0)
    tiny = dict(runner.SPACES["contrastive"])
    tiny.update({"latent_dim": ("const", 6), "batch_size": ("const", 4),
                 "num_epochs": ("const", 1)})
    monkeypatch.setitem(runner.SPACES, "contrastive", tiny)

    res = runner.run_sweep("contrastive", ArrayStore(), meta, count=2,
                           seed=0, save_dir=str(tmp_path), use_wandb=True)

    assert res == {"sweep_id": "sweep_123"}
    # The sweep config reached wandb.sweep in the reference's shape.
    sweep_cfg, project = calls["sweep"][0]
    assert project == "svtpu_contrastive_sweep"
    assert sweep_cfg["method"] == "bayes"
    assert sweep_cfg["metric"]["name"] == "best_consistency_score"
    # Two agent trials ran real training, logged the metric, saved, finished.
    assert calls["init"] == 2 and calls["finish"] == 2
    assert len(calls["log"]) == 2
    assert all(np.isfinite(d["best_consistency_score"])
               for d in calls["log"])
    assert len(calls["save"]) == 2
    assert (tmp_path / "best_model_mock_0").exists()


def test_local_sweep_resume(tmp_path, monkeypatch):
    """A re-run over the same save_dir reuses recorded trial summaries
    instead of retraining (interrupted-sweep resume)."""
    from svtpu.config import VideoMeta
    from svtpu.sweeps import runner

    class ArrayStore:
        def __init__(self):
            rng = np.random.default_rng(0)
            self.array = rng.integers(0, 255, (48, 16, 16, 3),
                                      dtype=np.uint8)

        @property
        def item_shape(self):
            return self.array.shape[1:]

        def gather(self, idx):
            return self.array[np.asarray(idx)]

    meta = VideoMeta("t", flags=(16, 32), last_frame=47, grey_out=0)
    tiny_space = dict(runner.SPACES["contrastive"])
    tiny_space.update({"latent_dim": ("const", 6),
                       "batch_size": ("const", 4),
                       "num_epochs": ("const", 1)})
    monkeypatch.setitem(runner.SPACES, "contrastive", tiny_space)

    first = runner.run_sweep("contrastive", ArrayStore(), meta, count=1,
                             seed=5, save_dir=str(tmp_path),
                             use_wandb=False)

    def boom(*a, **k):
        raise AssertionError("resumed sweep must not retrain")

    monkeypatch.setattr(runner, "train_with_config", boom)
    second = runner.run_sweep("contrastive", ArrayStore(), meta, count=1,
                              seed=5, save_dir=str(tmp_path),
                              use_wandb=False)
    assert second["best"] == first["best"]
    assert second["best_config"] == first["best_config"]
