"""HPO-B hyperparameter-optimization lookup task.

Capability parity with the reference HPO stack (reference: tasks/hpo.py:
11-406): a host-side JSON loader for the HPO-B meta-datasets plus a Task
adapter that serves random context/query/target splits of the real data.

This is the one task whose data generation is inherently host-side (real
tabular data, ragged dataset sizes).  The split indices are drawn with
numpy per epoch and the gathered batch is shipped to the device once —
the rollout itself then runs fully on-device like every other task.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aline_tpu.tasks.base import Batch, Task

DATASET_IDS = {"ranger": "7609", "glmnet": "5860", "svm": "5891",
               "rpart": "5859", "xgboost": "5971"}


class HPOBHandler:
    """Full HPO-B benchmark loader (reference: tasks/hpo.py:11-122):
    v1/v2/v3 splits, augmented meta-train, surrogate summary stats, and
    the standard test seeds."""

    SEEDS = ["test0", "test1", "test2", "test3", "test4"]

    def __init__(self, root_dir: str = "HPOB/", mode: str = "v3-test",
                 surrogates_dir: str = "saved-surrogates/"):
        self.mode = mode
        self.surrogates_dir = surrogates_dir
        self.seeds = list(self.SEEDS)
        if mode == "v3-test":
            self.load_data(root_dir, only_test=True)
        elif mode == "v3-train-augmented":
            self.load_data(root_dir, only_test=False, augmented_train=True)
        elif mode in ("v1", "v2", "v3"):
            self.load_data(root_dir, version=mode, only_test=False)
        else:
            raise ValueError("Provide a valid mode")
        stats = os.path.join(surrogates_dir, "summary-stats.json")
        if os.path.isfile(stats):
            with open(stats) as f:
                self.surrogates_stats = json.load(f)

    def load_data(self, rootdir: str = "", version: str = "v3",
                  only_test: bool = True, augmented_train: bool = False):
        """(reference :46-102)."""
        paths = {
            "train_aug": os.path.join(rootdir,
                                      "meta-train-dataset-augmented.json"),
            "train": os.path.join(rootdir, "meta-train-dataset.json"),
            "test": os.path.join(rootdir, "meta-test-dataset.json"),
            "valid": os.path.join(rootdir, "meta-validation-dataset.json"),
            "bo_init": os.path.join(rootdir, "bo-initializations.json"),
        }
        with open(paths["test"]) as f:
            self.meta_test_data = json.load(f)
        with open(paths["bo_init"]) as f:
            self.bo_initializations = json.load(f)
        self.meta_train_data = None
        self.meta_validation_data = None
        if not only_test:
            train_path = (paths["train_aug"]
                          if augmented_train or version == "v1"
                          else paths["train"])
            with open(train_path) as f:
                self.meta_train_data = json.load(f)
            with open(paths["valid"]) as f:
                self.meta_validation_data = json.load(f)
        if version != "v3" and self.meta_train_data is not None:
            # v1/v2: merge all splits into one test view (reference :78-95)
            merged = {}
            for space, datasets in self.meta_train_data.items():
                merged[space] = dict(datasets)
                if space in self.meta_test_data:
                    merged[space].update(self.meta_test_data[space])
                    merged[space].update(
                        self.meta_validation_data.get(space, {}))
            self.meta_train_data = None
            self.meta_validation_data = None
            self.meta_test_data = merged
        self.search_space_dims = {}
        for space, datasets in self.meta_test_data.items():
            first = next(iter(datasets.values()))
            self.search_space_dims[space] = len(first["X"][0])

    @staticmethod
    def normalize(y, y_min=None, y_max=None):
        """(reference :104-109)."""
        y = np.asarray(y, np.float64)
        if y_min is None:
            return (y - y.min()) / (y.max() - y.min())
        return (y - y_min) / (y_max - y_min)

    def get_search_spaces(self):
        return list(self.meta_test_data.keys())

    def get_datasets(self, search_space):
        return list(self.meta_test_data[search_space].keys())

    def get_seeds(self):
        return self.seeds

    def get_search_space_dim(self, search_space):
        return self.search_space_dims[search_space]


class HPOB:
    """Per-meta-dataset loader (reference: tasks/hpo.py:124-249)."""

    def __init__(self, meta_dataset: str = "glmnet",
                 data_path: Optional[str] = None):
        from aline_tpu.tasks.hpob_native import load_hpob_arrays
        self.meta_dataset = meta_dataset
        self.path = data_path or os.path.join(
            os.path.dirname(os.path.realpath(__file__)), "..", "..", "data")
        # dense arrays parsed by the native C++ loader when built
        # (native/hpob_loader.cpp), else the json fallback
        arrays = load_hpob_arrays(
            os.path.join(self.path, "HPOB", f"{meta_dataset}.json"))
        self._X = {k: v[0] for k, v in arrays.items()}
        self._y = {k: v[1] for k, v in arrays.items()}
        self.dataset_ids = list(arrays.keys())
        self.n_dataset = len(self.dataset_ids)
        self.min_data_size = min(x.shape[0] for x in self._X.values())
        self.dim_x = self._X[self.dataset_ids[0]].shape[1]

    def sample(self, rng: np.random.Generator, batch_size: int = 16,
               n_context: Optional[int] = None, n_query: Optional[int] = None,
               n_target: int = 10, min_n_context: int = 5,
               max_n_context: int = 10):
        """Random context/query/target splits (reference :137-169)."""
        n_context = n_context or int(rng.integers(min_n_context,
                                                  max_n_context))
        n_query = n_query or self.min_data_size - n_context - n_target

        cx = np.zeros((batch_size, n_context, self.dim_x), np.float32)
        cy = np.zeros((batch_size, n_context, 1), np.float32)
        qx = np.zeros((batch_size, n_query, self.dim_x), np.float32)
        qy = np.zeros((batch_size, n_query, 1), np.float32)
        tx = np.zeros((batch_size, n_target, self.dim_x), np.float32)
        ty = np.zeros((batch_size, n_target, 1), np.float32)
        need = n_context + n_query + n_target
        too_small = [d for d in self.dataset_ids
                     if self._X[d].shape[0] < need]
        if too_small:
            raise ValueError(
                f"HPO-B sample needs n_context+n_query+n_target={need} "
                f"rows but datasets {too_small[:5]} have fewer (the "
                f"reference crashes identically on short datasets, "
                f"tasks/hpo.py:158-168); lower n_query/n_target or drop "
                f"the short datasets")
        for i in range(batch_size):
            did = self.dataset_ids[int(rng.integers(self.n_dataset))]
            X, y = self._X[did], self._y[did]
            perm = rng.permutation(X.shape[0])
            c = perm[:n_context]
            q = perm[n_context: n_context + n_query]
            t = perm[n_context + n_query: n_context + n_query + n_target]
            cx[i], cy[i] = X[c], y[c]
            qx[i], qy[i] = X[q], y[q]
            tx[i], ty[i] = X[t], y[t]
        return cx, cy, qx, qy, tx, ty

    # -- test-set protocol (reference :171-243) ---------------------------
    def get_test_set(self) -> Dict:
        with open(os.path.join(self.path, "HPOB",
                               f"{self.meta_dataset}_test.json")) as f:
            return json.load(f)

    def get_bo_initializations(self) -> Dict:
        with open(os.path.join(self.path, "HPOB",
                               "bo-initializations.json")) as f:
            return json.load(f)

    def sample_test_set(self, n_context: int, n_query: int, n_target: int):
        """Fixed BO-initialization splits for every (dataset, seed) pair
        (reference :187-243)."""
        seeds = [f"test{i}" for i in range(5)]
        inits = self.get_bo_initializations()
        data = self.get_test_set()
        rows = []
        # custom slices (e.g. the dataset-shift surrogate 'ranger_shift')
        # key bo-initializations by their slice name instead of a numeric
        # HPO-B space id
        space_key = DATASET_IDS.get(self.meta_dataset, self.meta_dataset)
        for dataset_id in data.keys():
            dataset = data[dataset_id]
            X = np.asarray(dataset["X"], np.float32)
            y = np.asarray(dataset["y"], np.float32).reshape(-1, 1)
            for seed in seeds:
                init_ids = inits[space_key][dataset_id][seed]
                mask = np.ones(X.shape[0], bool)
                mask[init_ids] = False
                Xr, yr = X[mask], y[mask]
                rows.append((X[init_ids], y[init_ids],
                             Xr[:n_query], yr[:n_query],
                             Xr[n_query:n_query + n_target],
                             yr[n_query:n_query + n_target]))
        stack = lambda i: np.stack([r[i] for r in rows], axis=0)
        return tuple(stack(i) for i in range(6))


class HPOTask(Task):
    """Task adapter around HPOB (reference: tasks/hpo.py:252-406).

    ``sample_batch`` takes a host numpy Generator instead of a JAX key —
    it is the only non-jittable sampler in the framework (real data)."""

    def __init__(self, cfg):
        try:
            self.hpob = HPOB(meta_dataset=cfg.meta_dataset,
                             data_path=cfg.data_path)
            actual_dim_x = self.hpob.dim_x
            if cfg.dim_x != actual_dim_x:
                print(f"Warning: config dim_x ({cfg.dim_x}) differs from "
                      f"dataset dim_x ({actual_dim_x}); using dataset value.")
            cfg.dim_x = actual_dim_x
            cfg.dim_y = 1
        except (FileNotFoundError, OSError) as e:
            print(f"Error loading HPO-B dataset {cfg.meta_dataset!r}: {e}\n"
                  f"Expected file: data/HPOB/{cfg.meta_dataset}.json")
            self.hpob = None

        super().__init__(cfg)
        if self.embedding_type != "data":
            raise ValueError("HPO tasks only support 'data' embedding type")
        self.meta_dataset = cfg.meta_dataset
        self.min_n_context = cfg.min_n_context
        self.max_n_context = cfg.max_n_context
        self.normalize_y = cfg.normalize_y
        self.n_target_theta = 0
        self.design_scale = 1.0

    def to_design_space(self, xi):
        return xi

    def normalise_outcomes(self, y):
        """Optional per-batch min-max normalization (reference :328-338)."""
        if not self.normalize_y:
            return y
        y_min = y.min(axis=1, keepdims=True)
        y_max = y.max(axis=1, keepdims=True)
        rng = np.where(y_max - y_min == 0, 1.0, y_max - y_min)
        return (y - y_min) / rng

    def simulate(self, key, x, theta=None):
        raise NotImplementedError(
            "HPO task uses real data, not generated data "
            "(reference: tasks/hpo.py:340-345)")

    def sample_batch(self, rng: np.random.Generator, batch_size: int,
                     n_query: Optional[int] = None) -> Batch:
        if self.hpob is None:
            raise RuntimeError(
                "HPO-B data not loaded; cannot sample batch. "
                "Please check data files under data/HPOB/.")
        n_query = self.n_query_init if n_query is None else n_query
        cx, cy, qx, qy, tx, ty = self.hpob.sample(
            rng, batch_size=batch_size, n_context=self.n_context_init,
            n_query=n_query, n_target=self.n_target_data,
            min_n_context=self.min_n_context,
            max_n_context=self.max_n_context)
        if self.normalize_y:
            all_y = np.concatenate([cy, qy, ty], axis=1)
            all_y = self.normalise_outcomes(all_y)
            nc, nq = cy.shape[1], qy.shape[1]
            cy, qy, ty = (all_y[:, :nc], all_y[:, nc:nc + nq],
                          all_y[:, nc + nq:])
        x = jnp.asarray(np.concatenate([cx, qx], axis=1))
        y = jnp.asarray(np.concatenate([cy, qy], axis=1))
        theta_tokens = jnp.zeros((batch_size, 0, 1))
        return self._pack_batch(x, y, jnp.asarray(tx), jnp.asarray(ty),
                                theta_tokens, None)
