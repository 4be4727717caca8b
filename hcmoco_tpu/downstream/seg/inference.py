"""Multi-scale sliding-window inference with flip TTA.

Behavioral spec: `lib/datasets/base_dataset.py:147-229` — per scale: resize,
pad to crop size, tile with stride = 2/3 crop, average window predictions
(softmax-exp domain), optional horizontal-flip TTA (with the depth sets'
left-right class-pair swap, nturgbd_d.py:239-259), upsample to original
size, sum over scales.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _predict(apply_fn, image: jnp.ndarray,
             flip_pairs: Optional[np.ndarray], flip: bool) -> jnp.ndarray:
    """softmax-prob prediction at input resolution (inference,
    nturgbd_d.py:239-259: upsample logits, log_softmax, optional flip TTA
    averaged, exp)."""
    h, w = image.shape[1], image.shape[2]
    logits = apply_fn(image)
    logits = jax.image.resize(
        logits.astype(jnp.float32),
        (logits.shape[0], h, w, logits.shape[-1]), method="bilinear")
    pred = jax.nn.log_softmax(logits, axis=-1)
    if flip:
        fl = apply_fn(image[:, :, ::-1, :])
        fl = jax.image.resize(
            fl.astype(jnp.float32), (fl.shape[0], h, w, fl.shape[-1]),
            method="bilinear")
        fl = jax.nn.log_softmax(fl, axis=-1)
        if flip_pairs is not None:
            perm = np.arange(fl.shape[-1])
            for a, b in flip_pairs:
                perm[a], perm[b] = b, a
            fl = fl[..., perm]
        pred = 0.5 * (pred + fl[:, :, ::-1, :])
    return jnp.exp(pred)


def sliding_window_inference(
    apply_fn, image: np.ndarray, num_classes: int,
    crop_size: Tuple[int, int] = (473, 473),
    scales: Sequence[float] = (1.0,), flip: bool = False,
    flip_pairs: Optional[np.ndarray] = None,
    pad_value: Optional[np.ndarray] = None,
) -> np.ndarray:
    """image: (H, W, 3) normalized; returns (H, W, num_classes) probs."""
    import cv2

    oh, ow = image.shape[:2]
    ch, cw = crop_size
    stride_h, stride_w = int(ch * 2 / 3), int(cw * 2 / 3)
    final = np.zeros((oh, ow, num_classes), np.float32)
    if pad_value is None:
        pad_value = np.zeros(image.shape[-1], np.float32)

    for scale in scales:
        long_size = int(max(oh, ow) * scale + 0.5)
        if oh > ow:
            nh, nw = long_size, int(ow * long_size / oh + 0.5)
        else:
            nw, nh = long_size, int(oh * long_size / ow + 0.5)
        img = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)

        if max(nh, nw) <= min(ch, cw):
            padded = np.full((ch, cw, image.shape[-1]), pad_value,
                             np.float32)
            padded[:nh, :nw] = img
            pred = np.asarray(_predict(
                apply_fn, jnp.asarray(padded)[None], flip_pairs, flip))[0]
            pred = pred[:nh, :nw]
        else:
            ph, pw = max(nh, ch), max(nw, cw)
            padded = np.full((ph, pw, image.shape[-1]), pad_value,
                             np.float32)
            padded[:nh, :nw] = img
            rows = int(math.ceil((ph - ch) / stride_h)) + 1
            cols = int(math.ceil((pw - cw) / stride_w)) + 1
            acc = np.zeros((ph, pw, num_classes), np.float32)
            cnt = np.zeros((ph, pw, 1), np.float32)
            for r in range(rows):
                for c in range(cols):
                    h0, w0 = r * stride_h, c * stride_w
                    h1, w1 = min(h0 + ch, ph), min(w0 + cw, pw)
                    h0, w0 = h1 - ch, w1 - cw
                    win = padded[h0:h1, w0:w1]
                    p = np.asarray(_predict(
                        apply_fn, jnp.asarray(win)[None], flip_pairs,
                        flip))[0]
                    acc[h0:h1, w0:w1] += p
                    cnt[h0:h1, w0:w1] += 1
            pred = (acc / cnt)[:nh, :nw]
        pred = cv2.resize(pred, (ow, oh), interpolation=cv2.INTER_LINEAR)
        final += pred
    return final
