"""Semantic GCN (SemGCN) skeleton encoder in Flax.

Behavioral spec: `pycontrast/networks/SGCN/` — `SemGraphConv`
(sem_graph_conv.py:9-51, two weight matrices + learned edge weights
softmax-normalized over the skeleton adjacency), `_GraphConv`/`_ResGraphConv`
stacks (sem_gcn.py:8-44), `SemGCN` (sem_gcn.py:60-95), adjacency built from
parent lists (skeleton_meta.py:3-23, graph_utils.py:27-45).

`create_sgcn(name, 128, 4)` (create_SGCN.py:6-14) maps to
`SemGCN(adj, hidden_dim=128, num_layers=4)` here; input is (B, J, 2)
normalized 2D joints, output (B, J, hidden_dim).

Tiny graphs (J=16 or 13): everything fits in registers/VMEM, so each graph
conv is two small matmuls — we keep them fp32 (negligible cost) for
numerically stable adjacency softmax.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# parent lists (skeleton_meta.py:3-23)
SKELETON_PARENTS = {
    "mpii": [1, 2, 6, 6, 3, 4, -1, 6, 7, 8, 11, 12, 8, 8, 13, 14],
    "coco_reduce": [1, 2, 9, 10, 3, 4, -1, 8, 9, 6, 6, 10, 11],
}


def skeleton_adjacency(name: str) -> np.ndarray:
    """Dense normalized adjacency from a parent list.

    Mirrors `adj_mx_from_skeleton` (graph_utils.py:42-45): symmetrize the
    child->parent edge matrix, add self-loops, row-normalize.
    """
    parents = SKELETON_PARENTS[name]
    j = len(parents)
    a = np.zeros((j, j), dtype=np.float32)
    for child, parent in enumerate(parents):
        if parent >= 0:
            a[child, parent] = 1.0
    # symmetric max-combine (adj + adj.T masked, graph_utils.py:33)
    a = np.maximum(a, a.T)
    a = a + np.eye(j, dtype=np.float32)
    rowsum = a.sum(axis=1, keepdims=True)
    inv = np.where(rowsum > 0, 1.0 / rowsum, 0.0)
    return (a * inv).astype(np.float32)


class SemGraphConv(nn.Module):
    """Semantic graph conv (sem_graph_conv.py:9-51).

    out = (A_sm * I) @ (x W0) + (A_sm * (1-I)) @ (x W1) + b, where A_sm is a
    row-softmax over learned edge logits placed at the adjacency's nonzeros.
    """

    out_features: int
    adj: np.ndarray  # (J, J) normalized adjacency (>0 marks edges)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        j = self.adj.shape[0]
        in_features = x.shape[-1]
        mask = jnp.asarray(self.adj > 0)

        w = self.param(
            "W",
            nn.initializers.xavier_uniform(),
            (2, in_features, self.out_features),
            jnp.float32,
        )
        n_edges = int((self.adj > 0).sum())
        e = self.param("e", nn.initializers.ones, (n_edges,), jnp.float32)

        x = x.astype(jnp.float32)
        h0 = x @ w[0]
        h1 = x @ w[1]

        # scatter learned edge logits into the adjacency mask (row-major
        # nonzero order, matching torch .nonzero()); softmax over rows.
        rows, cols = np.nonzero(self.adj > 0)
        logits = jnp.full((j, j), -9e15, dtype=jnp.float32)
        logits = logits.at[rows, cols].set(e)
        a = nn.softmax(logits, axis=1)

        eye = jnp.eye(j, dtype=jnp.float32)
        out = (a * eye) @ h0 + (a * (1.0 - eye)) @ h1
        if self.use_bias:
            stdv = 1.0 / np.sqrt(self.out_features)
            b = self.param(
                "bias",
                nn.initializers.uniform(scale=2 * stdv),
                (self.out_features,),
                jnp.float32,
            )
            out = out + (b - stdv)  # uniform(-stdv, stdv) like torch
        return out


class GraphConvBlock(nn.Module):
    """SemGraphConv + BatchNorm1d + ReLU (_GraphConv, sem_gcn.py:8-28)."""

    out_features: int
    adj: np.ndarray

    @nn.compact
    def __call__(self, x, train: bool):
        x = SemGraphConv(self.out_features, self.adj, name="gconv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)
        return nn.relu(x)


class ResGraphConv(nn.Module):
    """Two GraphConvBlocks with a residual (sem_gcn.py:31-43)."""

    hid_dim: int
    adj: np.ndarray

    @nn.compact
    def __call__(self, x, train: bool):
        out = GraphConvBlock(self.hid_dim, self.adj, name="gconv1")(x, train)
        out = GraphConvBlock(self.hid_dim, self.adj, name="gconv2")(out, train)
        return x + out


class GraphNonLocal(nn.Module):
    """1-D non-local block, concatenation pairwise function.

    Behavioral spec: `graph_non_local.py:7-113` (`_NonLocalBlock` with
    dimension=1, wrapped by `GraphNonLocal`).  Ships in the reference but is
    unused by HCMoCo's experiments (`create_SGCN.py:13` passes
    `nodes_group=None`); ported for inventory completeness and reachable via
    `SemGCN(nodes_group=...)`.

    Channels-last (B, J, C).  The reference's 1x1 Conv1d g/theta/phi are
    Denses over C; its `concat_project` (2*ic -> 1 conv + ReLU, no bias)
    factorizes as f[b,i,k] = relu(theta[b,i]@wt + phi[b,k]@wp), so the
    (B, 2ic, J, J') concat tensor never materializes — the pairwise map is
    a broadcast add, TPU-friendly.  With bn_layer=True the output BN is
    zero-init (graph_non_local.py:66-68), so the block is the identity at
    init — pinned by tests/test_models.py.
    """

    inter_channels: Optional[int] = None
    sub_sample: int = 1   # max-pool factor on g/phi over the joint axis
    bn_layer: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, j, c = x.shape
        ic = self.inter_channels if self.inter_channels else c // 2
        assert ic > 0
        kaiming = nn.initializers.kaiming_normal()
        x = x.astype(jnp.float32)

        g = nn.Dense(ic, kernel_init=kaiming, name="g")(x)
        theta = nn.Dense(ic, kernel_init=kaiming, name="theta")(x)
        phi = nn.Dense(ic, kernel_init=kaiming, name="phi")(x)
        if self.sub_sample > 1:
            # torch MaxPool1d(kernel=sub_sample): stride = kernel,
            # truncating; grouped orders are exact multiples so reshape-max
            jp = j // self.sub_sample
            g = jnp.max(
                g[:, : jp * self.sub_sample].reshape(b, jp, self.sub_sample,
                                                     ic), axis=2)
            phi = jnp.max(
                phi[:, : jp * self.sub_sample].reshape(
                    b, jp, self.sub_sample, ic), axis=2)

        # concat_project: (2ic -> 1) conv, no bias, ReLU
        w = self.param("concat_project", kaiming, (2 * ic, 1), jnp.float32)
        ft = theta @ w[:ic]   # (B, J, 1)
        fp = phi @ w[ic:]     # (B, J', 1)
        f = nn.relu(ft + jnp.swapaxes(fp, 1, 2))  # (B, J, J')
        f = f / f.shape[-1]   # f_div_C (graph_non_local.py:103-104)

        y = f @ g             # (B, J, ic)
        if self.bn_layer:
            y = nn.Dense(c, kernel_init=kaiming, name="W")(y)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                scale_init=nn.initializers.zeros,
                dtype=jnp.float32, name="W_bn")(y)
        else:
            y = nn.Dense(c, kernel_init=nn.initializers.zeros, name="W")(y)
        return x + y


def group_orders(
        nodes_group: Tuple[Tuple[int, ...], ...]) -> Tuple[list, list]:
    """grouped/restored joint orders from a nodes_group (sem_gcn.py:74-81)."""
    grouped = [i for g in nodes_group for i in g]
    restored = [0] * len(grouped)
    for i in range(len(restored)):
        restored[i] = grouped.index(i)
    return grouped, restored


class GroupedNonLocal(nn.Module):
    """Permute joints into group order, non-local, restore
    (`_GraphNonLocal`, sem_gcn.py:46-58)."""

    nodes_group: Tuple[Tuple[int, ...], ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        grouped, restored = group_orders(self.nodes_group)
        out = x[:, jnp.asarray(grouped), :]
        out = GraphNonLocal(sub_sample=len(self.nodes_group[0]),
                            name="nonlocal")(out, train)
        return out[:, jnp.asarray(restored), :]


class SemGCN(nn.Module):
    """Full SemGCN: input block + num_layers residual blocks + output conv.

    coords_dim = (2, hid_dim) per create_sgcn (create_SGCN.py:13).
    nodes_group (default None, as every shipped HCMoCo recipe) interleaves
    grouped non-local blocks per sem_gcn.py:68-87.
    """

    hid_dim: int = 128
    num_layers: int = 4
    skeleton: str = "mpii"
    nodes_group: Optional[Tuple[Tuple[int, ...], ...]] = None

    @nn.compact
    def __call__(self, joints2d: jnp.ndarray, train: bool = True):
        adj = skeleton_adjacency(self.skeleton)
        x = GraphConvBlock(self.hid_dim, adj, name="gconv_input")(
            joints2d, train
        )
        if self.nodes_group is not None:
            assert len(self.nodes_group[0]) > 1  # sem_gcn.py:71-72
            x = GroupedNonLocal(self.nodes_group, name="nl_input")(x, train)
        for i in range(self.num_layers):
            x = ResGraphConv(self.hid_dim, adj, name=f"res{i}")(x, train)
            if self.nodes_group is not None:
                x = GroupedNonLocal(self.nodes_group,
                                    name=f"nl{i}")(x, train)
        x = SemGraphConv(self.hid_dim, adj, name="gconv_output")(x)
        return x
