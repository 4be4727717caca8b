"""Versatility (segment) step unit tests: weighted seg CE semantics, head
selection, IoU counters."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hcmoco_tpu.train.segment_step import (
    weighted_seg_ce, seg_counts, calc_seg_metrics, NTU_SEG_CLASS_WEIGHTS,
)
from hcmoco_tpu.utils.meters import AverageMeter, MetricLogger
from hcmoco_tpu.utils.summary import param_table, count_params


def torch_style_weighted_ce(logits, labels, w, ignore=255):
    """Independent numpy model of torch CE(weight, ignore_index)."""
    b, h, wd, c = logits.shape
    lo = logits.reshape(-1, c)
    la = labels.reshape(-1)
    keep = la != ignore
    lo, la = lo[keep], la[keep]
    logp = lo - np.log(np.exp(lo - lo.max(1, keepdims=True)).sum(1,
                       keepdims=True)) - lo.max(1, keepdims=True)
    ce = -logp[np.arange(len(la)), la]
    ww = w[la]
    return (ce * ww).sum() / ww.sum()


class TestWeightedSegCE:
    def test_matches_torch_semantics(self):
        rng = np.random.default_rng(0)
        logits = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
        labels = rng.integers(0, 5, (2, 8, 8)).astype(np.int32)
        labels[0, :2] = 255
        w = (rng.random(5) + 0.5).astype(np.float32)
        got = float(weighted_seg_ce(jnp.asarray(logits),
                                    jnp.asarray(labels), jnp.asarray(w)))
        want = torch_style_weighted_ce(logits, labels, w)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_sample_mask_excludes_unlabeled_frames(self):
        rng = np.random.default_rng(1)
        logits = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
        labels = rng.integers(0, 3, (2, 4, 4)).astype(np.int32)
        w = np.ones(3, np.float32)
        full = float(weighted_seg_ce(jnp.asarray(logits),
                                     jnp.asarray(labels), jnp.asarray(w),
                                     sample_mask=jnp.array([1, 1])))
        only0 = float(weighted_seg_ce(jnp.asarray(logits),
                                      jnp.asarray(labels), jnp.asarray(w),
                                      sample_mask=jnp.array([1, 0])))
        ref0 = torch_style_weighted_ce(logits[:1], labels[:1], w)
        np.testing.assert_allclose(only0, ref0, rtol=1e-5)
        assert abs(full - only0) > 1e-6

    def test_class_weights_table(self):
        assert len(NTU_SEG_CLASS_WEIGHTS) == 25
        assert NTU_SEG_CLASS_WEIGHTS[0] == pytest.approx(1.448)


class TestSegCounts:
    def test_counts_vs_bruteforce(self):
        rng = np.random.default_rng(2)
        pred = rng.integers(0, 4, (2, 8, 8))
        label = rng.integers(0, 4, (2, 8, 8))
        label[0, 0] = 255
        ai, au, ap, al = seg_counts(jnp.asarray(pred), jnp.asarray(label),
                                    4)
        valid = label != 255
        for c in range(4):
            inter = ((pred == c) & (label == c) & valid).sum()
            assert int(ai[c]) == inter
            assert int(ap[c]) == ((pred == c) & valid).sum()
            assert int(al[c]) == ((label == c) & valid).sum()
        aacc, miou, macc, iou, acc = calc_seg_metrics(
            ai.astype(jnp.float32), au.astype(jnp.float32),
            ap.astype(jnp.float32), al.astype(jnp.float32))
        assert 0 <= float(miou) <= 1


class TestUtils:
    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0, 2)
        m.update(3.0, 2)
        assert m.avg == pytest.approx(2.0)
        assert m.val == 3.0

    def test_metric_logger_tsv(self, tmp_path):
        lg = MetricLogger(str(tmp_path), print_freq=100)
        lg.update({"loss": 1.0})
        lg.update({"loss": 3.0})
        lg.write_epoch(1)
        content = open(tmp_path / "metrics.tsv").read()
        assert "loss" in content and "2.0" in content

    def test_metric_logger_tensorboard_events(self, tmp_path):
        """write_epoch emits browsable TB scalars (base_trainer.py:75-78
        logger.log_value analog); readable back via tensorboard's reader."""
        lg = MetricLogger(str(tmp_path), print_freq=100)
        if lg._tb is None:
            pytest.skip("tensorboardX not available")
        lg.update({"loss": 1.0})
        lg.update({"loss": 3.0})
        lg.write_epoch(1)
        lg.close()
        files = [f for f in (tmp_path / "tb").iterdir()
                 if "tfevents" in f.name]
        assert files
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
        acc = EventAccumulator(str(tmp_path / "tb"))
        acc.Reload()
        assert "loss" in acc.Tags()["scalars"]
        ev = acc.Scalars("loss")[0]
        assert ev.step == 1 and ev.value == pytest.approx(2.0)

    def test_param_table_and_count(self):
        params = {"enc": {"w": np.zeros((3, 4)), "b": np.zeros(4)},
                  "head": {"w": np.zeros((4, 2))}}
        assert count_params(params) == 12 + 4 + 8
        table = param_table(params)
        assert "TOTAL" in table and "24" in table
