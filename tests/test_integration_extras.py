"""Integration extras: in-training EIG eval hook, low-discrepancy sampling,
benchmark-task OOD curves, plotting smoke tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aline_tpu.config import parse_overrides
from aline_tpu.models import build_model
from aline_tpu.tasks import BenchmarkTask, GPTask, build_task
from aline_tpu.train.loop import Trainer


@pytest.mark.slow
class TestEIGEvalHookDuringTraining:
    def test_location_finding_with_eig_hook(self, tmp_path):
        cfg = parse_overrides([
            "task=location_finding", "task.n_query_init=6",
            "batch_size=4", "min_T=3", "T=3", "max_epoch=2",
            "burning_epoch=0", "checkpoint=0", "verbose=1", "eval=bed",
            "eval.L=64", "eval.M=4", "eval.batch_size=2"])
        cfg.output_dir = str(tmp_path)
        trainer = Trainer(cfg)

        from aline_tpu.eval.eig import eval_boed

        calls = []

        def hook(tr, epoch):
            b = eval_boed(tr.model, tr.params, tr.task,
                          cfg.T - cfg.task.n_context_init, cfg.eval.L,
                          cfg.eval.M, cfg.eval.batch_size,
                          jax.random.key(epoch))
            calls.append(epoch)
            return {"pce_mean": float(b["pce_mean"]),
                    "nmc_mean": float(b["nmc_mean"])}

        trainer.train(eval_hook=hook)
        assert calls == [0, 1]


class TestSobolSampling:
    def test_low_discrepancy_coverage(self, rng_key):
        cfg = parse_overrides(["task=al_mix", "task.dim_x=2",
                               "task.n_target_theta=3"]).task
        task = GPTask(cfg)
        pts = task.sample_data_sobol(rng_key, 2, 256)
        assert pts.shape == (2, 256, 2)
        p = np.asarray(pts)
        assert p.min() >= -task.design_scale and p.max() <= task.design_scale
        # coverage: each of 4x4 cells should contain points
        for b in range(2):
            u = (p[b] + task.design_scale) / (2 * task.design_scale)
            hist, *_ = np.histogram2d(u[:, 0], u[:, 1], bins=4,
                                      range=[[0, 1], [0, 1]])
            assert (hist > 0).all(), "empty cell in low-discrepancy design"


@pytest.mark.slow
class TestBenchmarkOODEval:
    def test_mix_mode_benchmark_curves(self, rng_key):
        from aline_tpu.config import BenchmarkTaskConfig
        from aline_tpu.eval.al_curves import al_rollout_curves
        cfg = parse_overrides(["task=al_mix", "task.dim_x=1",
                               "task.n_target_theta=2",
                               "task.n_context_init=1",
                               "task.n_query_init=8",
                               "task.n_target_data=4"])
        model = build_model(cfg)
        task = GPTask(cfg.task)
        params = model.init(rng_key, task.sample_batch(rng_key, 2),
                            training=False)
        bcfg = BenchmarkTaskConfig(
            name="Benchmark", dim_x=1, embedding_type="mix",
            n_context_init=1, n_query_init=8, n_target_data=4,
            n_target_theta=2, design_scale=5.0, noise_scale=0.0,
            benchmark_name="forrester")
        btask = BenchmarkTask(bcfg)
        bbatch = btask.sample_batch(rng_key, 3, mode="mix")
        out = al_rollout_curves(model, params, bbatch, T=4, key=rng_key)
        assert out["rmse"].shape == (3, 5)
        assert np.isfinite(np.asarray(out["rmse"])).all()


class TestPlotting:
    def test_al_curves_plot(self, tmp_path, np_rng):
        from aline_tpu.utils.plotting import plot_al_curves
        curves = {"aline": np_rng.normal(size=(8, 11)),
                  "random": np_rng.normal(size=(8, 11))}
        p = str(tmp_path / "curves.png")
        plot_al_curves(curves, metric="rmse", save_path=p)
        assert os.path.exists(p) and os.path.getsize(p) > 0

    def test_eig_bounds_plot(self, tmp_path, np_rng):
        from aline_tpu.utils.plotting import plot_eig_bounds
        m = np.cumsum(np_rng.uniform(size=10))
        p = str(tmp_path / "bounds.png")
        plot_eig_bounds(m, m * 0.05, m + 0.3, m * 0.05, save_path=p)
        assert os.path.exists(p)

    def test_gp_posterior_plot(self, tmp_path, np_rng):
        from aline_tpu.utils.plotting import plot_gp_1d_posterior
        xg = np.linspace(-1, 1, 50)
        p = str(tmp_path / "gp.png")
        plot_gp_1d_posterior(np.array([0.0]), np.array([0.5]), xg,
                             np.sin(xg), 0.1 * np.ones(50),
                             x_query=xg, scores=np.cos(xg) ** 2,
                             save_path=p)
        assert os.path.exists(p)
