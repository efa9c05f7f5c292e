"""Data-parallel training tests on the 8-device virtual CPU mesh."""
import jax
import numpy as np
import pytest

from aline_tpu.config import parse_overrides
from aline_tpu.train.loop import Trainer


def dp_cfg(tmp, batch_size, mesh_data=0):
    cfg = parse_overrides([
        "task=al_mix", "task.dim_x=1", "task.n_target_theta=2",
        "task.n_context_init=1", "task.n_query_init=8",
        "task.n_target_data=4", f"batch_size={batch_size}", "min_T=3",
        "T=3", "max_epoch=4", "burning_epoch=2", "checkpoint=0",
        "verbose=100", f"mesh_data={mesh_data}"])
    cfg.output_dir = str(tmp)
    return cfg


class TestDataParallelTraining:
    def test_eight_device_mesh_used(self, tmp_path):
        cfg = dp_cfg(tmp_path / "dp8", batch_size=16)
        trainer = Trainer(cfg)
        assert trainer.mesh.devices.size == 8
        for e in range(4):
            m = trainer.train_epoch(e)
        assert np.isfinite(float(m["loss"]))

    def test_dp_matches_single_device(self, tmp_path):
        """Same seed → DP-sharded training must produce the same losses and
        parameters as single-device (the psum just reorders the reduction)."""
        cfg1 = dp_cfg(tmp_path / "d1", batch_size=16, mesh_data=1)
        t1 = Trainer(cfg1)
        losses1 = [float(t1.train_epoch(e)["loss"]) for e in range(3)]

        cfg8 = dp_cfg(tmp_path / "d8", batch_size=16, mesh_data=8)
        t8 = Trainer(cfg8)
        losses8 = [float(t8.train_epoch(e)["loss"]) for e in range(3)]

        np.testing.assert_allclose(losses1, losses8, rtol=1e-4, atol=1e-5)
        # Adam's rsqrt amplifies reduction-order noise; compare params with
        # a tolerance that still catches any real divergence
        for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                        jax.tree_util.tree_leaves(t8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)

    def test_indivisible_batch_falls_back(self, tmp_path):
        cfg = dp_cfg(tmp_path / "odd", batch_size=6)
        trainer = Trainer(cfg)
        assert trainer.mesh.devices.size == 1
        m = trainer.train_epoch(0)
        assert np.isfinite(float(m["loss"]))
