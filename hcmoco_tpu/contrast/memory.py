"""Contrastive negatives engine: memory banks and MoCo queues.

Behavioral spec: `pycontrast/memory/mem_bank.py` (BaseMem/RGBMem/CMCMem/
CMCMem3) and `pycontrast/memory/mem_moco.py` (RGBMoCo/CMCMoCo), with
AliasMethod uniform negative sampling (`alias_multinomial.py` — built from
`torch.ones(n_data)`, i.e. exactly uniform, so we sample with
`jax.random.randint`).

TPU-native design:
  * banks live in the train state as one (n_modal, n_data, dim) array,
    replicated across the data mesh axis; every shard applies the identical
    functional update from all-gathered features — same invariant the
    reference relies on (broadcast-once + identical `index_copy_`,
    contrast_trainer.py:81-91, mem_bank.py:15-28).
  * logits: rather than gathering (bsz, K+1, dim) rows from HBM (the
    reference's `index_select` + bmm, ~2 GB of traffic at K=16384), we
    compute the dense score matrix S = x @ bank.T on the MXU once per modality
    and gather scalars S[b, idx[b,k]] — identical math (the bank rows are
    constants w.r.t. gradients), far less HBM traffic.  Set
    `dense_scores=False` to get the literal gather+bmm formulation.
  * EMA update: w = normalize(m*w_old + (1-m)*x), scattered back with
    last-write-wins for duplicate indices (torch `index_copy_` semantics).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MemoryState:
    """Non-parametric memory banks, one per modality."""

    banks: jnp.ndarray  # (n_modal, n_data, dim) float32, rows L2-normalized

    @property
    def n_data(self) -> int:
        return self.banks.shape[1]


def _l2norm(x, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def init_memory(rng: jax.Array, n_modal: int, n_data: int,
                dim: int = 128) -> MemoryState:
    """randn + L2-normalize rows (mem_bank.py:50-52,104-107,166-171)."""
    banks = jax.random.normal(rng, (n_modal, n_data, dim), jnp.float32)
    return MemoryState(banks=_l2norm(banks))


def sample_negative_indices(rng: jax.Array, y: jnp.ndarray, n_data: int,
                            k: int) -> jnp.ndarray:
    """Uniform (bsz, K+1) negative indices with the positive forced into
    column 0 (mem_bank.py:68-70: `idx.select(1, 0).copy_(y)`)."""
    bsz = y.shape[0]
    idx = jax.random.randint(rng, (bsz, k + 1), 0, n_data)
    return idx.at[:, 0].set(y)


def sample_negative_counts(rng: jax.Array, bsz: int, n_data: int,
                           k: int, replicated=None) -> jnp.ndarray:
    """(bsz, n_data) multiplicity counts of k uniform negative draws.

    Exactly the distribution of `bincount(randint(0, n_data, (k,)))` — i.e.
    Multinomial(k, uniform) — sampled WITHOUT forming the k indices, via
    recursive binary binomial splitting (log2(n_data) vectorized
    jax.random.binomial levels).  This is the gather-free TPU formulation of
    AliasMethod negative sampling (alias_multinomial.py with uniform probs):
    the NCE loss and gradient depend on the draw only through these counts
    (see cmc3_losses_counts).

    replicated: optional fully-replicated `NamedSharding(mesh, P())`.  Under
    a multi-device mesh this MUST be passed: it pins every splitting level
    (and the binomial rejection `while` loops inside) to replicated
    compute.  Otherwise GSPMD shards the loops over bsz and inserts a
    cross-device all-reduce into EVERY loop-condition evaluation — dozens
    of per-iteration collectives (deadlock-prone on the XLA:CPU rendezvous
    path, and a per-step latency tax on real meshes).  The sampler is
    O(bsz * n_data) elementwise — replicating it is free."""
    def pin(x):
        return (jax.lax.with_sharding_constraint(x, replicated)
                if replicated is not None else x)

    counts = jnp.full((bsz, 1), float(k))
    sizes = np.array([n_data], np.int64)
    while sizes.shape[0] < n_data:
        left = (sizes + 1) // 2
        p = jnp.asarray(left / np.maximum(sizes, 1), jnp.float32)  # (segs,)
        rng, sub = jax.random.split(rng)
        left_counts = pin(jax.random.binomial(sub, pin(counts), p[None, :]))
        counts = jnp.stack([left_counts, counts - left_counts],
                           axis=-1).reshape(bsz, -1)
        sizes = np.stack([left, sizes - left], axis=-1).reshape(-1)
    counts = pin(counts)
    # drop zero-size padding segments (non-power-of-two n_data)
    keep = sizes > 0
    if not keep.all():
        counts = counts[:, np.nonzero(keep)[0]]
    return counts


def cmc3_losses_counts(feats: jnp.ndarray, banks: jnp.ndarray,
                       y: jnp.ndarray, rng: jax.Array, k: int,
                       temperature: float, counts: jnp.ndarray = None,
                       replicated=None):
    """Per-sample (ce, correct) for the six CMCMem3 directions WITHOUT
    materializing sampled logits: the count-weighted identity

        sum_k exp(s[b, idx[b,k]]/T)  ==  sum_n c[b,n] * exp(s[b,n]/T)

    turns the 1.8M-element scalar gathers (22%% of the round-2 profiled
    step) into dense [bsz, n_data] elementwise math on top of the s = f @
    bank.T matmuls.  Given the same draw multiset this is EXACTLY the
    reference loss (mem_bank.py:176-193 + CE-to-0); the draw itself is the
    same Multinomial(k, uniform) distribution, sampled as counts.
    Top-1 correctness: positive-at-column-0 wins ties under torch argmax, so
    correct = s[b,y] >= max over drawn negatives."""
    banks = jax.lax.stop_gradient(banks)
    bsz = y.shape[0]
    n_data = banks.shape[1]
    if counts is None:
        counts = sample_negative_counts(rng, bsz, n_data, k,
                                        replicated=replicated)
    c = jax.lax.stop_gradient(counts.astype(jnp.float32))
    pos_onehot = jax.nn.one_hot(y, n_data, dtype=jnp.float32)
    c_total = c + pos_onehot  # forced positive at column 0 (mem_bank.py:70)
    neg_inf = jnp.float32(-jnp.inf)

    out = []
    for qi, bi in _CMC3_DIRS:
        s = (feats[qi].astype(jnp.float32) @ banks[bi].T) / temperature
        pos = jnp.take_along_axis(s, y[:, None], axis=1)[:, 0]
        z = jax.scipy.special.logsumexp(s, axis=-1, b=c_total)
        ce = z - pos
        max_neg = jnp.max(jnp.where(c > 0, s, neg_inf), axis=-1)
        correct = (pos >= max_neg).astype(jnp.float32)
        out.append((ce, correct))
    return out


def memory_logits(x: jnp.ndarray, bank: jnp.ndarray, idx: jnp.ndarray,
                  temperature: float, dense_scores: bool = True):
    """(bsz, K+1) contrastive logits against one bank.

    Math parity with `BaseMem._compute_logit` (mem_bank.py:30-40):
    logits[b,k] = <bank[idx[b,k]], x[b]> / T.  Bank rows carry no gradient
    (torch buffers); we stop_gradient accordingly.
    """
    bank = jax.lax.stop_gradient(bank)
    x = x.astype(jnp.float32)
    if dense_scores:
        # S: (bsz, n_data) on the MXU, then scalar gather — O(bsz*K) bytes
        # of gather traffic instead of O(bsz*K*dim).
        s = x @ bank.T
        logits = jnp.take_along_axis(s, idx, axis=1)
    else:
        w = bank[idx]  # (bsz, K+1, dim)
        logits = jnp.einsum("bkd,bd->bk", w, x)
    return logits / temperature


def update_memory(bank: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                  m: float) -> jnp.ndarray:
    """EMA + renormalize + scatter (BaseMem._update_memory,
    mem_bank.py:15-28).  x is the globally-gathered feature batch; the update
    is deterministic so every replica computes the same new bank."""
    x = jax.lax.stop_gradient(x.astype(jnp.float32))
    w_old = bank[y]
    w_new = _l2norm(m * w_old + (1.0 - m) * x)
    return bank.at[y].set(w_new)


def _cmc3_logits_gather(banks: jnp.ndarray, feats: jnp.ndarray,
                        idx: jnp.ndarray, temperature: float,
                        chunk: int = 1024) -> Tuple[jnp.ndarray, ...]:
    """Six cross-modal logit matrices via row-gather + einsum, chunked
    over K.

    Round-1 profiling showed the dense-score `take_along_axis` and its
    backward scatter cost ~37% of the flagship step; the reference's
    gather+bmm form (mem_bank.py:176-191) has no scatter at all (bank rows
    are buffers).  Materializing all (bsz, K+1, dim) rows OOMs at large
    batch, so we gather K in chunks, share one gather across the three
    banks, and jax.checkpoint each chunk so the backward pass recomputes
    the gather instead of saving it."""
    banks = jax.lax.stop_gradient(banks)
    f1, f2, f3 = (feats[i].astype(jnp.float32) for i in range(3))
    bsz, kp1 = idx.shape
    if kp1 <= chunk:
        w = jnp.take(banks, idx, axis=1)  # (3, bsz, kp1, dim)
        fs = (f1, f2, f3)
        return tuple(
            jnp.einsum("bkd,bd->bk", w[bank_i], fs[feat_i]) / temperature
            for feat_i, bank_i in
            ((0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)))

    # lax.scan serializes the chunks so only one (3, bsz, chunk, dim)
    # gather is live at a time (an unrolled loop kept them all live and
    # OOMed at batch 128); jax.checkpoint re-gathers in the backward.
    nchunks = -(-kp1 // chunk)
    pad = nchunks * chunk - kp1
    idx_c = jnp.pad(idx, ((0, 0), (0, pad))).reshape(
        bsz, nchunks, chunk).transpose(1, 0, 2)  # (n, bsz, chunk)

    @jax.checkpoint
    def body(carry, ic):
        w = jnp.take(banks, ic, axis=1)  # (3, bsz, chunk, dim)
        fs = (f1, f2, f3)
        outs = jnp.stack([
            jnp.einsum("bkd,bd->bk", w[bank_i], fs[feat_i])
            for feat_i, bank_i in
            ((0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0))])
        return carry, outs  # (6, bsz, chunk)

    _, parts = jax.lax.scan(body, 0, idx_c)  # (n, 6, bsz, chunk)
    full = parts.transpose(1, 2, 0, 3).reshape(6, bsz, nchunks * chunk)
    return tuple(full[i, :, :kp1] / temperature for i in range(6))


# (query feat index, bank index) for the six CMCMem3 directions
# 12, 21, 23, 32, 13, 31 (mem_bank.py:176-191)
_CMC3_DIRS = ((0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0))


@jax.custom_vjp
def _cmc3_logits_hybrid(feats: jnp.ndarray, banks: jnp.ndarray,
                        idx: jnp.ndarray) -> jnp.ndarray:
    """Six (bsz, K+1) un-scaled logit matrices, stacked: (6, bsz, K+1).

    TPU-first hybrid formulation (round-2 profile-driven):
      * forward: dense score matrices S = f @ bank.T on the MXU + a scalar
        take_along_axis — no (bsz, K+1, dim) row materialization.  The naive
        dense formulation's weakness is its BACKWARD (the take_along_axis
        VJP scatters (bsz, K+1) grads into (bsz, n_data), ~37% of the
        round-1 step), and the row-gather formulation's weakness is its
        forward+recompute (2x ~3 GB of gather traffic, ~23% of the round-1
        step, profile: tools/xplane_top_ops.py).
      * backward (custom VJP below): df_q[b] = sum_k g[b,k] * bank[idx[b,k]]
        — ONE chunked row-gather pass shared by all three banks and all six
        directions, no scatter anywhere.
    Identical math to BaseMem._compute_logit (mem_bank.py:30-40); bank rows
    carry no gradient (torch buffers)."""
    f = feats.astype(jnp.float32)
    b = jax.lax.stop_gradient(banks)
    return jnp.stack([
        jnp.take_along_axis(f[qi] @ b[bi].T, idx, axis=1)
        for qi, bi in _CMC3_DIRS])


def _cmc3_hybrid_fwd(feats, banks, idx):
    # zero-size dtype token: custom_vjp residuals must be JAX types
    tok = jnp.zeros((0,), feats.dtype)
    return _cmc3_logits_hybrid(feats, banks, idx), (banks, idx, tok)


def _cmc3_hybrid_bwd(res, g, chunk: int = 1024):
    banks, idx, feats_tok = res
    feats_dtype = feats_tok.dtype
    bsz, kp1 = idx.shape
    dim = banks.shape[-1]
    g = g.astype(jnp.float32)

    def accumulate(w, g_c):
        # w: (3, bsz, c, dim) gathered rows; g_c: (6, bsz, c)
        df = [0.0, 0.0, 0.0]
        for d, (qi, bi) in enumerate(_CMC3_DIRS):
            df[qi] = df[qi] + jnp.einsum("bk,bkd->bd", g_c[d], w[bi])
        return jnp.stack(df)

    if kp1 <= chunk:
        w = jnp.take(banks, idx, axis=1)
        df = accumulate(w, g)
    elif (kp1 - 1) % chunk == 0:
        # common case (K+1 = nce_k+1, nce_k % chunk == 0): positive column
        # handled directly, then clean chunks sliced in-place — no padded /
        # transposed copies of the ~50 MB g tensor (bs128 @K16384 OOMed
        # with them on the 16 GB chip)
        w0 = jnp.take(banks, idx[:, 0], axis=1)  # (3, bsz, dim)
        df = jnp.stack([
            sum(g[d][:, 0:1] * w0[bi]
                for d, (qi, bi) in enumerate(_CMC3_DIRS) if qi == q)
            for q in range(3)])

        def body(acc, start):
            ic = jax.lax.dynamic_slice_in_dim(idx, start, chunk, axis=1)
            gc = jax.lax.dynamic_slice_in_dim(g, start, chunk, axis=2)
            w = jnp.take(banks, ic, axis=1)  # one gather, 3 banks
            return acc + accumulate(w, gc), None

        starts = 1 + chunk * jnp.arange((kp1 - 1) // chunk)
        df, _ = jax.lax.scan(body, df, starts)
    else:
        nchunks = -(-kp1 // chunk)
        pad = nchunks * chunk - kp1
        idx_c = jnp.pad(idx, ((0, 0), (0, pad))).reshape(
            bsz, nchunks, chunk).transpose(1, 0, 2)
        g_c = jnp.pad(g, ((0, 0), (0, 0), (0, pad))).reshape(
            6, bsz, nchunks, chunk).transpose(2, 0, 1, 3)

        def body(acc, args):
            ic, gc = args
            w = jnp.take(banks, ic, axis=1)  # one gather, 3 banks
            return acc + accumulate(w, gc), None

        df, _ = jax.lax.scan(
            body, jnp.zeros((3, bsz, dim), jnp.float32), (idx_c, g_c))
    return (df.astype(feats_dtype), jnp.zeros_like(banks),
            np.zeros(idx.shape, dtype=jax.dtypes.float0))


_cmc3_logits_hybrid.defvjp(_cmc3_hybrid_fwd, _cmc3_hybrid_bwd)


def cmc3_forward(
    state: MemoryState,
    feats: jnp.ndarray,  # (3, bsz, dim) local features f1,f2,f3
    y: jnp.ndarray,  # (bsz,) local sample indices
    all_feats: jnp.ndarray,  # (3, global_bsz, dim) gathered
    all_y: jnp.ndarray,  # (global_bsz,)
    rng: jax.Array,
    k: int,
    temperature: float,
    m: float = 0.5,
    dense_scores: bool = True,
    neg_idx: jnp.ndarray = None,
    mode: str = None,
) -> Tuple[Tuple[jnp.ndarray, ...], MemoryState]:
    """CMCMem3.forward (mem_bank.py:172-205): 6 cross-modal logit matrices
    (12,21,23,32,13,31) with label 0, then EMA-update all three banks from
    the gathered global batch.

    neg_idx: optional precomputed (bsz, K+1) indices (positive in col 0)
    overriding the uniform draw — used by the reference-parity harness to
    pin the multinomial sample on both frameworks.

    mode selects the logits formulation ('hybrid' | 'dense' | 'gather');
    default 'hybrid' (falls back to dense_scores for back-compat when mode
    is None and dense_scores=True). All three are the same math."""
    idx = (neg_idx if neg_idx is not None
           else sample_negative_indices(rng, y, state.n_data, k))
    if mode is None:
        mode = "dense" if dense_scores else "hybrid"

    if mode == "hybrid":
        logits = tuple(_cmc3_logits_hybrid(feats, state.banks, idx)
                       / temperature)
    elif mode == "dense":
        def lg(x, bank_i):
            return memory_logits(x, state.banks[bank_i], idx, temperature,
                                 dense_scores=True)

        f1, f2, f3 = feats[0], feats[1], feats[2]
        logits = (
            lg(f1, 1), lg(f2, 0), lg(f2, 2), lg(f3, 1), lg(f1, 2),
            lg(f3, 0),
        )
    else:
        logits = _cmc3_logits_gather(state.banks, feats, idx, temperature)
    new_banks = jnp.stack([
        update_memory(state.banks[i], all_feats[i], all_y, m)
        for i in range(3)
    ])
    return logits, MemoryState(banks=new_banks)


# ---------------------------------------------------------------------------
# MoCo FIFO queue (mem_moco.py)
# ---------------------------------------------------------------------------


@struct.dataclass
class MoCoState:
    """Ring-buffer queue(s): (n_modal, K, dim) + write pointer."""

    queues: jnp.ndarray  # (n_modal, K, dim)
    ptr: jnp.ndarray  # () int32


def init_moco(rng: jax.Array, n_modal: int, k: int,
              dim: int = 128) -> MoCoState:
    """randn rows L2-normalized (RGBMoCo/CMCMoCo __init__,
    mem_moco.py:56-58,95-98: `F.normalize(torch.randn(K, n_dim))`)."""
    q = jax.random.normal(rng, (n_modal, k, dim), jnp.float32)
    return MoCoState(queues=_l2norm(q), ptr=jnp.zeros((), jnp.int32))


def moco_logits(q: jnp.ndarray, k_pos: jnp.ndarray, queue: jnp.ndarray,
                temperature: float) -> jnp.ndarray:
    """[pos | negatives-from-queue] logits (RGBMoCo.forward,
    mem_moco.py:24-40): out[:,0] = <q, k+>, out[:,1:] = q @ queue.T."""
    queue = jax.lax.stop_gradient(queue)
    k_pos = jax.lax.stop_gradient(k_pos)
    pos = jnp.sum(q * k_pos, axis=-1, keepdims=True)
    neg = q @ queue.T
    return jnp.concatenate([pos, neg], axis=1) / temperature


def moco_enqueue(state: MoCoState, all_keys: jnp.ndarray) -> MoCoState:
    """Ring-pointer FIFO update from all-gathered keys (`_update_memory`,
    mem_moco.py:42-49). all_keys: (n_modal, global_bsz, dim)."""
    k = state.queues.shape[1]
    n = all_keys.shape[1]
    pos = (state.ptr + jnp.arange(n)) % k
    queues = state.queues.at[:, pos].set(
        jax.lax.stop_gradient(all_keys.astype(jnp.float32)))
    return MoCoState(queues=queues, ptr=(state.ptr + n) % k)
