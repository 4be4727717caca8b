"""Golden parity tests for the contrastive memory engine and HCMoCo losses.

`tests/golden/contrast_golden.npz` was generated once by running the
reference torch math (`pycontrast/memory/mem_bank.py`,
`pycontrast/learning/contrast_trainer.py`) on CPU with fixed inputs and a
pinned multinomial sample (see SURVEY.md §4's prescription (2)).

Note: the reference `accuracy` helper reports percentages (learning/util.py,
`mul_(100/bsz)`); ours reports fractions — tests scale accordingly.
Feature maps here are NCHW in the golden file and transposed to NHWC.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcmoco_tpu.contrast.memory import (
    MemoryState, init_memory, sample_negative_indices, memory_logits,
    update_memory, cmc3_forward, init_moco, moco_logits, moco_enqueue,
)
from hcmoco_tpu.contrast.losses import (
    nce_loss_and_acc, compute_loss_accuracy, soft_pri3d_loss,
    joints_pri3d_loss, cross_subject_scl_loss,
)

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden",
                              "contrast_golden.npz"))


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


class TestMemoryBank:
    def test_logits_match_reference(self):
        bank = jnp.asarray(GOLDEN["bank0"])
        x = jnp.asarray(GOLDEN["x"])
        idx = jnp.asarray(GOLDEN["idx"])
        for dense in (True, False):
            lg = memory_logits(x, bank, idx, 0.07, dense_scores=dense)
            np.testing.assert_allclose(np.asarray(lg), GOLDEN["logits"],
                                       rtol=1e-4, atol=1e-5)

    def test_update_matches_reference_with_duplicates(self):
        bank = jnp.asarray(GOLDEN["bank0"])
        new_bank = update_memory(bank, jnp.asarray(GOLDEN["x"]),
                                 jnp.asarray(GOLDEN["y"]), m=0.5)
        # y has a duplicate index (3): torch index_copy_ keeps the last
        # write; jnp .at[].set does too.
        np.testing.assert_allclose(np.asarray(new_bank),
                                   GOLDEN["bank_updated"],
                                   rtol=1e-5, atol=1e-6)

    def test_negative_sampling_positive_in_col0(self):
        y = jnp.arange(5)
        idx = sample_negative_indices(jax.random.PRNGKey(0), y, 100, 16)
        assert idx.shape == (5, 17)
        np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(5))
        assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 100).all()

    def test_cmc3_forward_shapes_and_update(self):
        rng = jax.random.PRNGKey(0)
        state = init_memory(rng, 3, 64, 8)
        feats = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 8))
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        y = jnp.array([0, 1, 2, 3])
        logits, new_state = cmc3_forward(
            state, feats, y, feats, y, jax.random.PRNGKey(2),
            k=15, temperature=0.07)
        assert len(logits) == 6
        assert all(l.shape == (4, 16) for l in logits)
        # banks changed at the updated rows and rows stay unit-norm
        assert not np.allclose(np.asarray(new_state.banks[0][0]),
                               np.asarray(state.banks[0][0]))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(new_state.banks), axis=-1), 1.0,
            rtol=1e-5)


class TestCMC3LogitModes:
    """hybrid / dense / gather are the same math: identical logits AND
    identical feature gradients (the hybrid path has a custom VJP)."""

    def _run(self, mode, kp1_big):
        rng = jax.random.PRNGKey(0)
        n_data, dim, bsz = 96, 16, 5
        k = kp1_big  # parametrized: covers all three backward branches
        state = init_memory(rng, 3, n_data, dim)
        feats = jax.random.normal(jax.random.PRNGKey(1), (3, bsz, dim))
        y = jnp.arange(bsz)
        idx = sample_negative_indices(jax.random.PRNGKey(3), y, n_data, k)

        def loss(f):
            logits, _ = cmc3_forward(
                state, f, y, f, y, jax.random.PRNGKey(2),
                k=k, temperature=0.07, neg_idx=idx, mode=mode)
            return sum(jnp.sum(jnp.tanh(l)) for l in logits), logits

        (val, logits), grad = jax.value_and_grad(loss, has_aux=True)(feats)
        return np.asarray(val), [np.asarray(l) for l in logits], \
            np.asarray(grad)

    # 12: single-gather; 2048: even-chunk dynamic-slice (nce_k=16384 shape);
    # 1500: ragged pad+transpose fallback
    @pytest.mark.parametrize("kp1_big", [12, 1500, 2048])
    def test_modes_agree(self, kp1_big):
        v_h, l_h, g_h = self._run("hybrid", kp1_big)
        v_d, l_d, g_d = self._run("dense", kp1_big)
        v_g, l_g, g_g = self._run("gather", kp1_big)
        for a, b in zip(l_h, l_d):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
        for a, b in zip(l_h, l_g):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
        # chunked-scan vs one-shot summation order: f32 accumulation noise
        np.testing.assert_allclose(g_h, g_d, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(g_h, g_g, rtol=1e-3, atol=1e-3)


class TestCountsFormulation:
    """Gather-free count-weighted NCE (bank_logits='counts'): given the SAME
    draw multiset, per-sample loss, top-1 correctness, AND feature gradients
    must exactly match the indexed dense formulation."""

    def test_counts_match_indexed_losses_and_grads(self):
        from hcmoco_tpu.contrast.memory import cmc3_losses_counts
        from hcmoco_tpu.contrast.losses import per_sample_nce

        rng = jax.random.PRNGKey(0)
        n_data, dim, bsz, k = 64, 16, 6, 200
        state = init_memory(rng, 3, n_data, dim)
        feats = jax.random.normal(jax.random.PRNGKey(1), (3, bsz, dim))
        y = jnp.arange(bsz)
        idx = sample_negative_indices(jax.random.PRNGKey(3), y, n_data, k)
        # multiset counts of the SAME negative draw (cols 1..K)
        counts = np.zeros((bsz, n_data), np.float32)
        for b in range(bsz):
            np.add.at(counts[b], np.asarray(idx[b, 1:]), 1.0)
        counts = jnp.asarray(counts)

        def counts_loss(f):
            per = cmc3_losses_counts(f, state.banks, y,
                                     jax.random.PRNGKey(9), k, 0.07,
                                     counts=counts)
            return sum(ce.sum() for ce, _ in per), per

        def indexed_loss(f):
            logits, _ = cmc3_forward(state, f, y, f, y,
                                     jax.random.PRNGKey(9), k=k,
                                     temperature=0.07, neg_idx=idx,
                                     mode="dense")
            per = [per_sample_nce(lg) for lg in logits]
            return sum(ce.sum() for ce, _ in per), per

        (lc, pc), gc = jax.value_and_grad(counts_loss, has_aux=True)(feats)
        (li, pi), gi = jax.value_and_grad(indexed_loss, has_aux=True)(feats)
        np.testing.assert_allclose(float(lc), float(li), rtol=1e-5)
        for (ce_c, cor_c), (ce_i, cor_i) in zip(pc, pi):
            np.testing.assert_allclose(np.asarray(ce_c), np.asarray(ce_i),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(cor_c),
                                          np.asarray(cor_i))
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gi),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("n_data,k", [(64, 500), (48, 333), (6, 17)])
    def test_multinomial_counts_sampler(self, n_data, k):
        from hcmoco_tpu.contrast.memory import sample_negative_counts

        c = np.asarray(sample_negative_counts(jax.random.PRNGKey(0),
                                              128, n_data, k))
        assert c.shape == (128, n_data)
        assert (c >= 0).all()
        np.testing.assert_array_equal(c.sum(axis=1), float(k))
        # uniform marginals: per-bin mean is k/n_data; loose 5-sigma bound
        mean = c.mean(axis=0)
        exp = k / n_data
        sigma = np.sqrt(k * (1 / n_data) * (1 - 1 / n_data) / 128)
        assert np.abs(mean - exp).max() < 5 * sigma + 1e-6


class TestMoCoQueue:
    def test_logits_layout(self):
        q = jnp.ones((2, 4))
        k = jnp.ones((2, 4))
        queue = jnp.zeros((8, 4))
        lg = moco_logits(q, k, queue, 1.0)
        assert lg.shape == (2, 9)
        np.testing.assert_allclose(np.asarray(lg[:, 0]), 4.0)
        np.testing.assert_allclose(np.asarray(lg[:, 1:]), 0.0)

    def test_ring_pointer_wraps(self):
        state = init_moco(jax.random.PRNGKey(0), 1, k=8, dim=4)
        keys = jnp.arange(1, 25, dtype=jnp.float32).reshape(1, 6, 4) / 10
        s1 = moco_enqueue(state, keys)
        assert int(s1.ptr) == 6
        s2 = moco_enqueue(s1, keys)
        assert int(s2.ptr) == 4  # (6+6) % 8
        # second batch wraps: positions (6,7,0,1,2,3) <- keys[0..5]
        np.testing.assert_allclose(np.asarray(s2.queues[0, 0]),
                                   np.asarray(keys[0, 2]))
        np.testing.assert_allclose(np.asarray(s2.queues[0, 6]),
                                   np.asarray(keys[0, 0]))


class TestComputeLossAccuracy:
    def test_use_depth_masking_matches_reference(self):
        logits = [jnp.asarray(l) for l in GOLDEN["ca_logits"]]
        losses, accs = compute_loss_accuracy(
            logits, use_depth=jnp.asarray(GOLDEN["use_depth"]))
        np.testing.assert_allclose(np.asarray(jnp.stack(losses)),
                                   GOLDEN["ca_losses"], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.stack(accs)) * 100,
                                   GOLDEN["ca_accs"], rtol=1e-4)

    def test_use_rgb_and_depth_masking_matches_reference(self):
        logits = [jnp.asarray(l) for l in GOLDEN["ca_logits"]]
        losses, accs = compute_loss_accuracy(
            logits,
            use_depth=jnp.asarray(GOLDEN["use_depth"]),
            use_rgb=jnp.asarray(GOLDEN["use_rgb"]))
        np.testing.assert_allclose(np.asarray(jnp.stack(losses)),
                                   GOLDEN["ca2_losses"], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.stack(accs)) * 100,
                                   GOLDEN["ca2_accs"], rtol=1e-4)

    def test_all_depth_missing_gives_zero_for_masked(self):
        logits = [jnp.asarray(l) for l in GOLDEN["ca_logits"]]
        losses, _ = compute_loss_accuracy(
            logits, use_depth=jnp.zeros(3, jnp.int32))
        for l in losses[:4]:
            np.testing.assert_allclose(float(l), 0.0, atol=1e-7)
        for l in losses[4:]:
            assert float(l) > 0


class TestSoftPri3D:
    def test_matches_reference(self):
        losses, accs = soft_pri3d_loss(
            jax.random.PRNGKey(0),
            nhwc(GOLDEN["m1"]), nhwc(GOLDEN["m2"]),
            jnp.asarray(GOLDEN["dmask"]),
            num_samples=6, temperature=0.07,
            use_depth=jnp.asarray(GOLDEN["use_depth"]),
            sample_ind=jnp.asarray(GOLDEN["fixed_ind"]),
        )
        np.testing.assert_allclose(float(losses[0]), GOLDEN["sp_loss0"],
                                   rtol=1e-4)
        np.testing.assert_allclose(float(losses[1]), GOLDEN["sp_loss1"],
                                   rtol=1e-4)
        np.testing.assert_allclose(float(accs[0]), GOLDEN["sp_acc0"],
                                   rtol=1e-4)
        np.testing.assert_allclose(float(accs[1]), GOLDEN["sp_acc1"],
                                   rtol=1e-4)

    def test_no_valid_depth_gives_zero(self):
        losses, accs = soft_pri3d_loss(
            jax.random.PRNGKey(0),
            nhwc(GOLDEN["m1"]), nhwc(GOLDEN["m2"]),
            jnp.zeros_like(jnp.asarray(GOLDEN["dmask"])),
            num_samples=6, temperature=0.07,
        )
        assert float(losses[0]) == 0.0 and float(losses[1]) == 0.0

    def test_sampling_only_picks_valid_pixels(self):
        b, h, w = 2, 8, 8
        mask = np.zeros((b, 32, 32), np.float32)
        mask[:, :4, :4] = 1  # maps to feature pixel (0, 0) only
        m = jnp.ones((b, h, w, 4))
        losses, _ = soft_pri3d_loss(
            jax.random.PRNGKey(1), m, m, jnp.asarray(mask),
            num_samples=4, temperature=0.07)
        # all sampled pixels identical -> soft target uniform, logits equal
        assert np.isfinite(float(losses[0]))


class TestJointsPri3D:
    def test_matches_reference(self):
        losses, accs = joints_pri3d_loss(
            nhwc(GOLDEN["m1"]), nhwc(GOLDEN["m2"]),
            jnp.asarray(GOLDEN["joint_feat"]),
            jnp.asarray(GOLDEN["joints2d"]),
            jnp.asarray(GOLDEN["joints_vis"]),
            temperature=0.07,
            use_depth=jnp.asarray(GOLDEN["use_depth"]),
        )
        np.testing.assert_allclose(float(losses[0]), GOLDEN["j_loss0"],
                                   rtol=1e-4)
        np.testing.assert_allclose(float(losses[1]), GOLDEN["j_loss1"],
                                   rtol=1e-4)
        np.testing.assert_allclose(float(accs[0]), GOLDEN["j_acc0"],
                                   rtol=1e-4)
        np.testing.assert_allclose(float(accs[1]), GOLDEN["j_acc1"],
                                   rtol=1e-4)


class TestCrossSubjectSCL:
    def test_matches_reference(self):
        loss = cross_subject_scl_loss(
            nhwc(GOLDEN["m1"]), nhwc(GOLDEN["m2"]),
            jnp.asarray(GOLDEN["joints2d"]),
            use_depth=jnp.asarray(GOLDEN["use_depth"]),
            use_rgb=jnp.asarray(GOLDEN["use_rgb"]),
            temperature=0.07,
        )
        np.testing.assert_allclose(float(loss), GOLDEN["scl_loss"],
                                   rtol=1e-4)

    def test_zero_when_no_depth(self):
        loss = cross_subject_scl_loss(
            nhwc(GOLDEN["m1"]), nhwc(GOLDEN["m2"]),
            jnp.asarray(GOLDEN["joints2d"]),
            use_depth=jnp.zeros(3, jnp.int32),
            use_rgb=jnp.asarray(GOLDEN["use_rgb"]),
            temperature=0.07,
        )
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)
