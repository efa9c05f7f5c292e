"""Seed-prefix discovery in the paired-stats / figure tooling.

The eval scripts key the first eval seed's curves unprefixed and every
later seed by VALUE (``seed{N}_``), so with a non-contiguous seed list
(e.g. ``--seeds 0,5,7``) index-based enumeration silently drops seeds
(round-4 advisor finding, low). These tests pin the key-driven
discovery that replaced it.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import make_figures  # noqa: E402
import paired_al_stats  # noqa: E402


def fake_artifact(seeds=(0, 5, 7), B=8, T=4):
    """npz-style dict with eval-script key conventions + seeds metadata."""
    rng = np.random.default_rng(1)
    d = {"seeds": np.array(seeds)}
    for i, s in enumerate(seeds):
        pre = "" if i == 0 else f"seed{s}_"
        for strat, off in (("aline", 0.5), ("random", 0.0)):
            d[f"{pre}{strat}_log_prob"] = rng.normal(off, 1, (B, T + 1))
            d[f"{pre}{strat}_rmse"] = rng.uniform(0, 1, (B, T + 1))
    return d


class TestSeedPrefixDiscovery:
    def test_noncontiguous_seeds_all_included(self):
        d = fake_artifact(seeds=(0, 5, 7), B=8)
        pres = paired_al_stats.seed_prefixes(d)
        assert pres == ["", "seed5_", "seed7_"]
        dll = paired_al_stats.paired_final_deltas(
            d, "aline", "random", "log_prob")
        assert dll.shape[0] == 3 * 8  # every seed's problems, not 1*8

    def test_seeds_metadata_key_is_not_a_prefix(self):
        # the 'seeds' pairing-metadata array must not be mistaken for a
        # seed prefix or a strategy
        d = fake_artifact(seeds=(0, 1))
        assert paired_al_stats.seed_prefixes(d) == ["", "seed1_"]

    def test_exact_delta_values(self):
        d = {
            "aline_log_prob": np.full((2, 3), 2.0),
            "random_log_prob": np.full((2, 3), 0.5),
            "seed9_aline_log_prob": np.full((2, 3), 3.0),
            "seed9_random_log_prob": np.full((2, 3), 1.0),
        }
        dll = paired_al_stats.paired_final_deltas(
            d, "aline", "random", "log_prob")
        np.testing.assert_allclose(sorted(dll), [1.5, 1.5, 2.0, 2.0])


class TestPoolSeeds:
    def test_pools_noncontiguous(self):
        d = fake_artifact(seeds=(0, 5, 7), B=4)
        pooled = make_figures._pool_seeds(d, "aline_log_prob")
        assert pooled.shape == (12, 5)

    def test_missing_key_returns_none(self):
        assert make_figures._pool_seeds({"seeds": np.array([0])},
                                        "nope_log_prob") is None
