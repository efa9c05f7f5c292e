"""Tests for target-mask creation/selection and the NLL weight vectors
(modernizing the reference's stale __main__ tests,
reference: utils/target_mask.py:158-294)."""
import random

import numpy as np
import pytest

from aline_tpu.ops.target_mask import (
    create_target_mask,
    masking_description,
    select_targets_by_mask,
    target_weight_vectors,
)


class TestCreateTargetMask:
    def test_all(self):
        m = create_target_mask("all", "mix", 3, 2)
        np.testing.assert_array_equal(m, np.ones(5, bool))

    def test_none(self):
        m = create_target_mask("none", "data", 5, 0)
        np.testing.assert_array_equal(m, np.zeros(5, bool))

    def test_partial_count(self):
        rng = random.Random(0)
        m = create_target_mask("partial", "data", 5, 0,
                               n_selected_targets=2, rng=rng)
        assert m.sum() == 2

    def test_predefined_by_index(self):
        masks = [[True, False, True, False]]
        m = create_target_mask("predefined", "theta", 0, 4,
                               predefined_masks=masks, mask_index=0)
        np.testing.assert_array_equal(m, [True, False, True, False])

    def test_predefined_weighted(self):
        rng = random.Random(0)
        masks = [[False, False, True, True], [True, True, False, False]]
        m = create_target_mask("predefined", "theta", 0, 4,
                               predefined_masks=masks,
                               predefined_mask_weights=[1.0, 0.0], rng=rng)
        np.testing.assert_array_equal(m, [False, False, True, True])

    def test_split_data_and_theta(self):
        m = create_target_mask("split", "mix", 3, 2, attend_to="data")
        np.testing.assert_array_equal(m, [True, True, True, False, False])
        m = create_target_mask("split", "mix", 3, 2, attend_to="theta")
        np.testing.assert_array_equal(m, [False, False, False, True, True])

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            create_target_mask("bogus", "data", 1, 0)


class TestSelectTargetsByMask:
    def test_shapes_and_content(self, np_rng):
        x = np_rng.normal(size=(2, 5, 3))
        mask = np.array([True, False, True, False, True])
        sel = select_targets_by_mask(x, mask)
        assert sel.shape == (2, 3, 3)
        np.testing.assert_array_equal(sel[:, 0], x[:, 0])
        np.testing.assert_array_equal(sel[:, 1], x[:, 2])
        np.testing.assert_array_equal(sel[:, 2], x[:, 4])


class TestTargetWeightVectors:
    """The weight vectors must reproduce the reference NLL averaging
    (train_aline.py:92-110) for every (embedding_type, mask_type) combo."""

    def _ll(self, np_rng, n):
        return np_rng.normal(size=(4, n)).astype(np.float32)

    def test_non_mix_masked_mean(self, np_rng):
        n_data, n_theta = 5, 0
        mask = np.array([True, False, True, True, False])
        wq, wp = target_weight_vectors(mask, "data", "all", n_data, n_theta)
        ll = self._ll(np_rng, 5)
        got_q = -(ll * wq).sum(-1)
        ref_q = -ll[:, mask].mean(-1)
        np.testing.assert_allclose(got_q, ref_q, rtol=1e-5, atol=1e-6)
        got_p = -(ll * wp).sum(-1)
        np.testing.assert_allclose(got_p, -ll.mean(-1), rtol=1e-5, atol=1e-6)

    def test_mix_all_separate_part_means(self, np_rng):
        n_data, n_theta = 3, 2
        mask = np.ones(5, bool)
        wq, wp = target_weight_vectors(mask, "mix", "all", n_data, n_theta)
        ll = self._ll(np_rng, 5)
        ref = -(ll[:, :3].mean(-1) + ll[:, 3:].mean(-1))
        np.testing.assert_allclose(-(ll * wq).sum(-1), ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(-(ll * wp).sum(-1), ref, rtol=1e-5, atol=1e-6)

    def test_mix_split_mask(self, np_rng):
        n_data, n_theta = 3, 2
        mask = np.array([False, False, False, True, True])  # theta split
        wq, wp = target_weight_vectors(mask, "mix", "split", n_data, n_theta)
        ll = self._ll(np_rng, 5)
        # query: plain masked mean (reference else-branch :103)
        np.testing.assert_allclose(-(ll * wq).sum(-1), -ll[:, 3:].mean(-1),
                                   rtol=1e-5, atol=1e-6)
        # prediction: mix-mode two-part mean (reference :107)
        ref_p = -(ll[:, :3].mean(-1) + ll[:, 3:].mean(-1))
        np.testing.assert_allclose(-(ll * wp).sum(-1), ref_p, rtol=1e-5, atol=1e-6)

    def test_none_mask_zero_weights(self):
        wq, wp = target_weight_vectors(np.zeros(5, bool), "data", "none", 5, 0)
        assert wq.sum() == 0
        assert wp.sum() == pytest.approx(1.0)


def test_masking_description():
    assert masking_description("all", "data") == "Attending to all targets"
    assert "2 randomly" in masking_description("partial", "data",
                                               n_selected_targets=2)
    assert "#1" in masking_description("predefined", "theta", mask_index=1)
    assert "data targets" in masking_description("split", "mix",
                                                 attend_to="data")
