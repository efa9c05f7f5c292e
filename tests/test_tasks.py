"""Simulator tests (SURVEY.md §4(c)): batch shapes/semantics, GP sample
covariance vs analytic kernel, likelihood vs density, select_design."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from aline_tpu.config import (
    CESTaskConfig,
    GPTaskConfig,
    HPOTaskConfig,
    LocationFindingConfig,
    PsychometricConfig,
    parse_overrides,
)
from aline_tpu.tasks import (
    BenchmarkTask,
    CESTask,
    GPTask,
    HiddenLocation,
    HPOTask,
    PsychometricTask,
    build_task,
    select_design,
)
from aline_tpu.tasks.gp import kernel_stack, scaled_sq_dists


def small_gp_cfg(**kw):
    base = dict(name="AL_mix", dim_x=1, embedding_type="mix",
                n_context_init=2, n_query_init=10, n_target_data=6,
                n_target_theta=2, design_scale=5.0, noise_scale=0.01)
    base.update(kw)
    return GPTaskConfig(**base)


class TestBatchSemantics:
    def test_sample_batch_shapes(self, rng_key):
        task = GPTask(small_gp_cfg())
        b = task.sample_batch(rng_key, 4)
        assert b.x.shape == (4, 12, 1)
        assert b.y.shape == (4, 12, 1)
        assert b.ctx_mask.shape == (4, 12)
        assert b.target_x.shape == (4, 6, 1)
        assert b.target_all.shape == (4, 8, 1)   # 6 data + 2 theta
        assert b.theta.shape == (4, 2, 1)
        # initial context flags
        np.testing.assert_array_equal(np.asarray(b.ctx_mask[:, :2]), True)
        np.testing.assert_array_equal(np.asarray(b.ctx_mask[:, 2:]), False)

    def test_select_design_moves_point(self, rng_key):
        task = GPTask(small_gp_cfg())
        b = task.sample_batch(rng_key, 3)
        idx = jnp.array([2, 5, 11])
        b2, x_sel, y_sel = select_design(b, idx)
        for i, j in enumerate([2, 5, 11]):
            assert bool(b2.ctx_mask[i, j])
            np.testing.assert_array_equal(np.asarray(x_sel[i]),
                                          np.asarray(b.x[i, j]))
            np.testing.assert_array_equal(np.asarray(y_sel[i]),
                                          np.asarray(b.y[i, j]))
        # exactly one new context point each
        assert int(b2.ctx_mask.sum() - b.ctx_mask.sum()) == 3

    def test_theta_mode_has_no_target_x(self, rng_key):
        task = GPTask(small_gp_cfg(embedding_type="theta", n_target_data=0))
        b = task.sample_batch(rng_key, 2)
        assert b.target_x.shape == (2, 0, 1)
        assert b.target_all.shape == (2, 2, 1)

    def test_data_mode(self, rng_key):
        task = GPTask(small_gp_cfg(embedding_type="data", n_target_theta=0))
        b = task.sample_batch(rng_key, 2)
        assert b.target_all.shape == (2, 6, 1)

    def test_mix_requires_dimx_plus_1(self):
        with pytest.raises(ValueError):
            GPTask(small_gp_cfg(dim_x=2))  # n_target_theta=2 != 3


class TestGPStatistics:
    def test_kernel_stack_formulas(self, np_rng):
        x = jnp.asarray(np_rng.normal(size=(7, 2)), jnp.float32)
        ls = jnp.array([0.7, 1.3])
        d2 = scaled_sq_dists(x, x, ls)
        ks = np.asarray(kernel_stack(d2, jnp.array(0.8)))
        d2n = np.asarray(d2)
        r = np.sqrt(d2n)
        np.testing.assert_allclose(ks[0], 0.8 * np.exp(-0.5 * d2n), rtol=1e-5)
        np.testing.assert_allclose(ks[1], 0.8 * np.exp(-r), rtol=1e-5)
        np.testing.assert_allclose(
            ks[2], 0.8 * (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r),
            rtol=1e-5)
        np.testing.assert_allclose(
            ks[3], 0.8 * (1 + np.sqrt(5) * r + 5 / 3 * d2n)
            * np.exp(-np.sqrt(5) * r), rtol=1e-5)

    def test_gp_sample_covariance_matches_kernel(self, rng_key):
        """Empirical covariance of many GP draws at fixed x ≈ K (RBF only)."""
        cfg = small_gp_cfg(kernel_weights=[1.0, 0.0, 0.0, 0.0], p_iso=1.0,
                           noise_scale=0.0)
        task = GPTask(cfg)
        x = jnp.linspace(-1.0, 1.0, 5)[None, :, None]       # [1, 5, 1]
        theta = jnp.array([[[0.9], [0.6]]])                  # ls=0.9, scale=0.6
        B = 4000
        xs = jnp.tile(x, (B, 1, 1))
        thetas = jnp.tile(theta, (B, 1, 1))
        y = task.generate_gp_data(rng_key, xs, thetas)       # [B, 5, 1]
        emp_cov = np.cov(np.asarray(y[..., 0]).T)
        d2 = np.asarray(scaled_sq_dists(x[0], x[0], jnp.array([0.9])))
        K = 0.6 * np.exp(-0.5 * d2)
        np.testing.assert_allclose(emp_cov, K, atol=0.05)

    def test_theta_prior_bounds_and_iso(self, rng_key):
        cfg = small_gp_cfg(dim_x=3, n_target_theta=4, p_iso=1.0)
        task = GPTask(cfg)
        th = task.sample_theta(rng_key, (100,))
        assert th.shape == (100, 4, 1)
        ls = np.asarray(th[:, :3, 0])
        # isotropic: all dims equal
        np.testing.assert_allclose(ls[:, 0], ls[:, 1])
        np.testing.assert_allclose(ls[:, 0], ls[:, 2])
        lo, hi = task.lengthscale_lower, task.lengthscale_upper
        assert ls.min() >= lo and ls.max() <= hi
        scale = np.asarray(th[:, 3, 0])
        assert scale.min() >= 0.1 and scale.max() <= 1.0

    def test_cholesky_fallback_on_hard_matrix(self, rng_key):
        """Duplicated inputs make K rank-deficient; the jittered retry must
        still return finite draws (reference fallback :401-412)."""
        task = GPTask(small_gp_cfg(noise_scale=0.0))
        x = jnp.zeros((2, 8, 1))  # all points identical → K singular
        theta = jnp.tile(jnp.array([[[0.5], [1.0]]]), (2, 1, 1))
        y = task.generate_gp_data(rng_key, x, theta)
        assert np.isfinite(np.asarray(y)).all()


class TestLocationFinding:
    def _task(self, **kw):
        cfg = parse_overrides(["task=location_finding"]).task
        for k, v in kw.items():
            setattr(cfg, k, v)
        cfg.n_query_init = 10
        return HiddenLocation(cfg)

    def test_batch_and_shapes(self, rng_key):
        task = self._task()
        b = task.sample_batch(rng_key, 3)
        assert b.x.shape == (3, 11, 2)
        assert b.target_all.shape == (3, 2, 1)
        assert b.theta.shape == (3, 1, 2)

    def test_log_likelihood_matches_normal_density(self, rng_key):
        task = self._task()
        xi = jnp.array([[0.3, 0.4]])
        theta = jnp.array([[[0.6, 0.7]]])
        y = jnp.array([[0.5]])
        got = float(task.log_likelihood(y, xi, theta)[0, 0])
        sig = float(task.total_density(xi, theta)[0, 0])
        ref = sps.norm(sig, 0.5).logpdf(0.5)
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_log_likelihood_broadcasts_contrastive_axis(self, rng_key):
        task = self._task()
        L, B = 7, 3
        thetas = task.sample_theta(rng_key, (L, B))          # [L, B, K, D]
        xi = jnp.ones((1, B, 2)) * 0.5
        y = jnp.zeros((1, B, 1))
        lp = task.log_likelihood(y, xi, thetas)
        assert lp.shape == (L, B, 1)

    def test_signal_formula(self):
        task = self._task()
        xi = jnp.array([0.0, 0.0])
        theta = jnp.array([[1.0, 0.0]])
        got = float(task.total_density(xi, theta)[0])
        ref = np.log(0.1 + 1.0 / (1e-4 + 1.0))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_ntheta_assertion(self):
        cfg = parse_overrides(["task=location_finding"]).task
        cfg.n_target_theta = 5
        with pytest.raises(ValueError):
            HiddenLocation(cfg)


class TestCES:
    def _task(self):
        cfg = parse_overrides(["task=ces"]).task
        cfg.n_query_init = 8
        return CESTask(cfg)

    def test_theta_prior(self, rng_key):
        task = self._task()
        th = np.asarray(task.sample_theta(rng_key, (500,)))
        assert th.shape == (500, 5)
        rho, alpha, log_u = th[:, 0], th[:, 1:4], th[:, 4]
        assert rho.min() >= 0.01 and rho.max() <= 1.0
        np.testing.assert_allclose(alpha.sum(-1), 1.0, rtol=1e-5)
        assert abs(log_u.mean() - 1.0) < 0.5
        assert abs(log_u.std() - 3.0) < 0.5

    def test_batch_outcomes_in_unit_interval(self, rng_key):
        task = self._task()
        b = task.sample_batch(rng_key, 4)
        y = np.asarray(b.y)
        assert (y >= task.epsilon).all() and (y <= 1 - task.epsilon).all()
        assert b.x.shape == (4, 9, 6)

    def test_log_likelihood_finite_and_broadcast(self, rng_key):
        task = self._task()
        L, B = 5, 3
        k1, k2, k3 = jax.random.split(rng_key, 3)
        thetas = task.sample_theta(k1, (L, B))               # [L, B, 5]
        xi = task.sample_data(k2, B, 1)[:, 0]                # [B, 6]
        y = task.simulate(k3, xi, thetas[0])                 # [B, 1]
        lp = task.log_likelihood(y[None], xi[None], thetas)
        assert lp.shape == (L, B, 1)
        assert np.isfinite(np.asarray(lp)).all()

    def test_utility_formula(self):
        x = jnp.array([2.0, 3.0, 4.0])
        rho = jnp.array([0.5])
        alpha = jnp.array([0.2, 0.3, 0.5])
        got = float(CESTask.utility(x, rho, alpha)[0])
        ref = (0.2 * 2 ** 0.5 + 0.3 * 3 ** 0.5 + 0.5 * 4 ** 0.5) ** 2
        np.testing.assert_allclose(got, ref, rtol=1e-5)


class TestPsychometric:
    def _task(self):
        cfg = parse_overrides(["task=psychometric"]).task
        cfg.n_query_init = 12
        return PsychometricTask(cfg)

    def test_priors_in_bounds(self, rng_key):
        task = self._task()
        th = np.asarray(task.sample_theta(rng_key, (300,)))[..., 0]
        assert th.shape == (300, 4)
        for i, (lo, hi) in enumerate([(-3, 3), (0.1, 2.0), (0.1, 0.9),
                                      (0.0, 0.5)]):
            assert th[:, i].min() >= lo and th[:, i].max() <= hi

    def test_psychometric_function_formula(self):
        task = self._task()
        theta = jnp.array([[0.5], [1.0], [0.2], [0.1]])      # [4, 1]
        x = jnp.array([1.5])
        p = float(task.psychometric_function(x, theta)[0])
        F = 1 - np.exp(-10 ** ((1.5 - 0.5) / 1.0))
        ref = 0.1 * 0.2 + 0.9 * F
        np.testing.assert_allclose(p, ref, rtol=1e-5)

    def test_binary_outcomes_and_likelihood(self, rng_key):
        task = self._task()
        b = task.sample_batch(rng_key, 4)
        y = np.asarray(b.y)
        assert set(np.unique(y)).issubset({0.0, 1.0})
        lp = task.log_likelihood(b.y[:, 0], b.x[:, 0], b.theta)
        assert np.isfinite(np.asarray(lp)).all()

    def test_bernoulli_rate_matches_p(self, rng_key):
        task = self._task()
        theta = jnp.tile(jnp.array([[0.0], [1.0], [0.5], [0.2]]),
                         (5000, 1, 1))
        x = jnp.zeros((5000, 1))
        p_true = float(task.psychometric_function(x, theta)[0, 0])
        y = task.simulate(rng_key, x, theta)
        assert abs(float(y.mean()) - p_true) < 0.02


class TestBenchmarks:
    def test_all_functions_evaluate(self, rng_key):
        from aline_tpu.config import BenchmarkTaskConfig
        from aline_tpu.tasks.benchmarks import BENCHMARKS
        for name, spec in BENCHMARKS.items():
            cfg = BenchmarkTaskConfig(
                name="Benchmark", dim_x=spec["dim"], embedding_type="data",
                n_context_init=2, n_query_init=5, n_target_data=3,
                design_scale=5.0, noise_scale=0.0, benchmark_name=name)
            task = BenchmarkTask(cfg)
            b = task.sample_batch(rng_key, 2)
            assert b.x.shape == (2, 7, spec["dim"])
            assert np.isfinite(np.asarray(b.y)).all()

    def test_forrester_value(self, rng_key):
        from aline_tpu.config import BenchmarkTaskConfig
        cfg = BenchmarkTaskConfig(dim_x=1, n_context_init=1, n_query_init=1,
                                  n_target_data=0, design_scale=5.0,
                                  noise_scale=0.0, benchmark_name="forrester")
        task = BenchmarkTask(cfg)
        # x_norm = 0 → domain midpoint 0.5 → f = (6*0.5-2)^2 sin(12*0.5-4)/5
        y = task.simulate(rng_key, jnp.zeros((1, 1, 1)))
        ref = (6 * 0.5 - 2) ** 2 * np.sin(12 * 0.5 - 4) / 5
        np.testing.assert_allclose(float(y[0, 0, 0]), ref, rtol=1e-5)


class TestHPO:
    @pytest.fixture
    def hpo_dir(self, tmp_path, np_rng):
        d = tmp_path / "HPOB"
        d.mkdir()
        data = {}
        for did in ["101", "102"]:
            X = np_rng.uniform(size=(40, 3)).tolist()
            y = np_rng.uniform(size=(40, 1)).tolist()
            data[did] = {"X": X, "y": y}
        (d / "ranger.json").write_text(json.dumps(data))
        return str(tmp_path)

    def test_sample_batch(self, hpo_dir, np_rng):
        cfg = HPOTaskConfig(
            name="HPO", dim_x=3, embedding_type="data", n_context_init=3,
            n_query_init=20, n_target_data=5, meta_dataset="ranger",
            data_path=hpo_dir)
        task = HPOTask(cfg)
        assert task.dim_x == 3
        b = task.sample_batch(np_rng, 4)
        assert b.x.shape == (4, 23, 3)
        assert b.target_all.shape == (4, 5, 1)

    def test_missing_data_graceful(self):
        cfg = HPOTaskConfig(name="HPO", dim_x=3, embedding_type="data",
                            meta_dataset="ranger", data_path="/nonexistent")
        task = HPOTask(cfg)
        assert task.hpob is None
        with pytest.raises(RuntimeError):
            task.sample_batch(np.random.default_rng(0), 2)


def test_build_task_registry():
    cfg = parse_overrides(["task=location_finding"])
    task = build_task(cfg.task)
    assert isinstance(task, HiddenLocation)
    with pytest.raises(KeyError):
        cfg.task.target = "bogus"
        build_task(cfg.task)


class TestNativeHPOBLoader:
    def test_native_matches_json(self, tmp_path, np_rng):
        import json as _json
        from aline_tpu.tasks import hpob_native as hn
        data = {}
        for did in ["11", "22"]:
            X = np_rng.uniform(size=(17, 4)).round(6).tolist()
            y = np_rng.uniform(size=(17, 1)).round(6).tolist()
            data[did] = {"X": X, "y": y}
        p = tmp_path / "mini.json"
        p.write_text(_json.dumps(data))
        arrays = hn.load_hpob_arrays(str(p))
        assert set(arrays) == {"11", "22"}
        for did in data:
            X_ref = np.asarray(data[did]["X"], np.float32)
            y_ref = np.asarray(data[did]["y"], np.float32)
            np.testing.assert_allclose(arrays[did][0], X_ref, rtol=1e-6)
            np.testing.assert_allclose(arrays[did][1], y_ref, rtol=1e-6)

    def test_native_extension_built_and_faster_path_used(self):
        from aline_tpu.tasks import hpob_native as hn
        # in this repo the extension is built by native/build.py; if it is
        # not available the loader must still work via json (covered above)
        assert hn.native_available() in (True, False)

    def test_native_rejects_malformed(self, tmp_path):
        from aline_tpu.tasks import hpob_native as hn
        if not hn.native_available():
            pytest.skip("native extension not built")
        import hpob_native
        p = tmp_path / "bad.json"
        p.write_text('{"1": {"X": [[1, 2], [3]], "y": [[1], [2]]}}')  # ragged
        with pytest.raises(ValueError):
            hpob_native.load(str(p))


class TestHPOBHandler:
    @pytest.fixture
    def hpob_bench_dir(self, tmp_path, np_rng):
        d = tmp_path
        test_data = {"space1": {"d1": {"X": np_rng.uniform(
            size=(12, 3)).tolist(), "y": np_rng.uniform(
            size=(12, 1)).tolist()}}}
        (d / "meta-test-dataset.json").write_text(json.dumps(test_data))
        bo = {"space1": {"d1": {f"test{i}": [0, 1, 2] for i in range(5)}}}
        (d / "bo-initializations.json").write_text(json.dumps(bo))
        return str(d)

    def test_v3_test_mode(self, hpob_bench_dir):
        from aline_tpu.tasks import HPOBHandler
        h = HPOBHandler(root_dir=hpob_bench_dir, mode="v3-test")
        assert h.get_search_spaces() == ["space1"]
        assert h.get_datasets("space1") == ["d1"]
        assert h.get_search_space_dim("space1") == 3
        assert len(h.get_seeds()) == 5

    def test_normalize(self):
        from aline_tpu.tasks import HPOBHandler
        y = HPOBHandler.normalize([1.0, 2.0, 3.0])
        np.testing.assert_allclose(y, [0.0, 0.5, 1.0])
        y2 = HPOBHandler.normalize([1.0, 2.0], y_min=0.0, y_max=4.0)
        np.testing.assert_allclose(y2, [0.25, 0.5])

    def test_invalid_mode(self, hpob_bench_dir):
        from aline_tpu.tasks import HPOBHandler
        with pytest.raises(ValueError):
            HPOBHandler(root_dir=hpob_bench_dir, mode="bogus")

    def test_v3_full_layout_roundtrip(self, tmp_path, np_rng):
        """The REAL HPO-B v3 file layout (meta-train/validation/test +
        bo-initializations, numeric space ids, ragged dataset sizes)
        round-trips through HPOBHandler unchanged: v3 keeps the splits
        separate, v2 merges them into one test view (reference:
        tasks/hpo.py:46-102). Guards that dropping in the real 1.4 GB
        benchmark JSONs requires zero code changes."""
        import json as _json

        from aline_tpu.tasks import HPOBHandler

        def ds(n, dim):
            return {"X": np_rng.uniform(size=(n, dim)).round(6).tolist(),
                    "y": np_rng.uniform(size=(n, 1)).round(6).tolist()}

        d = tmp_path
        # ragged dataset sizes within each space, like the real benchmark
        train = {"5971": {"a": ds(40, 6), "b": ds(17, 6)},
                 "7609": {"c": ds(23, 6)}}
        valid = {"5971": {"v": ds(11, 6)}}
        test = {"5971": {"t1": ds(30, 6), "t2": ds(9, 6)}}
        (d / "meta-train-dataset.json").write_text(_json.dumps(train))
        (d / "meta-train-dataset-augmented.json").write_text(
            _json.dumps(train))
        (d / "meta-validation-dataset.json").write_text(_json.dumps(valid))
        (d / "meta-test-dataset.json").write_text(_json.dumps(test))
        bo = {"5971": {"t1": {f"test{i}": [0, 1, 2] for i in range(5)},
                       "t2": {f"test{i}": [0, 1, 2] for i in range(5)}}}
        (d / "bo-initializations.json").write_text(_json.dumps(bo))

        h3 = HPOBHandler(root_dir=str(d), mode="v3")
        assert set(h3.meta_train_data) == {"5971", "7609"}
        np.testing.assert_array_equal(
            np.asarray(h3.meta_train_data["5971"]["a"]["X"]),
            np.asarray(train["5971"]["a"]["X"]))  # exact round-trip
        assert h3.get_search_space_dim("5971") == 6
        assert [len(v["X"]) for v in
                h3.meta_train_data["5971"].values()] == [40, 17]

        h2 = HPOBHandler(root_dir=str(d), mode="v2")
        # v1/v2 merge: test view holds train + test + validation datasets
        assert set(h2.meta_test_data["5971"]) == {"a", "b", "v", "t1", "t2"}
        assert h2.meta_train_data is None

    def test_shift_slice_end_to_end(self):
        """The committed dataset-shift OOD slice (ragged test sizes, bo
        inits keyed by slice name) loads through the SAME production path
        as the canonical spaces."""
        import os

        from aline_tpu.tasks import HPOB
        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data")
        if not os.path.exists(os.path.join(root, "HPOB",
                                           "ranger_shift.json")):
            pytest.skip("ranger_shift slice not generated")
        hpob = HPOB(meta_dataset="ranger_shift", data_path=root)
        assert hpob.dim_x == 6
        cx, cy, qx, qy, tx, ty = hpob.sample_test_set(
            n_context=5, n_query=100, n_target=100)
        assert cx.shape == (30, 5, 6)      # 6 ragged datasets x 5 seeds
        assert qx.shape == (30, 100, 6)
        assert np.isfinite(qy).all() and np.isfinite(ty).all()


class TestHPOBTestSetProtocol:
    def test_sample_test_set(self, tmp_path, np_rng):
        from aline_tpu.tasks import HPOB
        d = tmp_path / "HPOB"
        d.mkdir()
        # meta-dataset for the loader ctor
        data = {"9": {"X": np_rng.uniform(size=(30, 2)).tolist(),
                      "y": np_rng.uniform(size=(30, 1)).tolist()}}
        (d / "ranger.json").write_text(json.dumps(data))
        # test split + fixed BO initializations (reference :187-243)
        test_data = {"d7": {"X": np_rng.uniform(size=(25, 2)).tolist(),
                            "y": np_rng.uniform(size=(25, 1)).tolist()}}
        (d / "ranger_test.json").write_text(json.dumps(test_data))
        bo = {"7609": {"d7": {f"test{i}": [0, 3, 5] for i in range(5)}}}
        (d / "bo-initializations.json").write_text(json.dumps(bo))

        hpob = HPOB(meta_dataset="ranger", data_path=str(tmp_path))
        cx, cy, qx, qy, tx, ty = hpob.sample_test_set(
            n_context=3, n_query=10, n_target=5)
        # 1 dataset x 5 seeds
        assert cx.shape == (5, 3, 2)
        assert qx.shape == (5, 10, 2)
        assert tx.shape == (5, 5, 2)
        # context rows are exactly the BO initialization rows
        X = np.asarray(test_data["d7"]["X"], np.float32)
        np.testing.assert_allclose(cx[0], X[[0, 3, 5]], rtol=1e-6)
        # query/target rows exclude the initialization rows
        init_rows = {tuple(r) for r in X[[0, 3, 5]].round(5).tolist()}
        for row in qx[0].round(5).tolist():
            assert tuple(row) not in init_rows


class TestSobol:
    def test_base_sequence_matches_scipy(self):
        """Pure-JAX Sobol base sequence is bit-exact vs scipy's Joe-Kuo
        table (reference uses torch SobolEngine, same construction;
        reference: tasks/gaussian_process.py:123-165)."""
        import scipy.stats.qmc as qmc
        from aline_tpu.ops.sobol import sobol_base
        for d in (1, 2, 3, 6, 16):
            ours = np.asarray(sobol_base(128, d))
            ref = qmc.Sobol(d=d, scramble=False).random(128)
            np.testing.assert_array_equal(ours, ref.astype(np.float32))

    def test_scrambled_uniformity_and_determinism(self, rng_key):
        from aline_tpu.ops.sobol import sample_sobol
        pts = sample_sobol(rng_key, 8, 512, 2)
        assert pts.shape == (8, 512, 2)
        p = np.asarray(pts)
        assert (p >= 0).all() and (p < 1).all()
        # digital-shift scrambling preserves stratification: each of the
        # 16 half-open 1/16 bins per dim gets exactly 512/16 points
        for b in range(8):
            for d in range(2):
                counts = np.histogram(p[b, :, d], bins=16,
                                      range=(0, 1))[0]
                assert (counts == 32).all(), counts
        # distinct batch elements get distinct scrambles
        assert not np.allclose(p[0], p[1])
        # same key -> same points
        p2 = np.asarray(sample_sobol(rng_key, 8, 512, 2))
        np.testing.assert_array_equal(p, p2)

    def test_gp_data_gen_config_dispatch(self, rng_key):
        from aline_tpu.config import parse_overrides
        from aline_tpu.tasks import build_task
        for gen in ("uniform", "sobol", "lattice"):
            cfg = parse_overrides([
                "task=al_mix", "task.dim_x=1", "task.n_target_theta=2",
                f"task.data_gen={gen}"])
            task = build_task(cfg.task)
            batch = jax.jit(
                lambda k, t=task: t.sample_batch(k, 4, n_query=8))(rng_key)
            x = np.asarray(batch.x)
            assert np.isfinite(x).all()
            assert (np.abs(x) <= task.design_scale + 1e-5).all()
