"""Checkpoint export bridge: Flax HRNet <-> reference torch key layout.

Reference: `pycontrast/transfer_ckpt.py:17-23` / `transfer_ckpt_depth.py`
strip the `module.encoder1.` / `module.encoder2.` prefixes from a pretrain
checkpoint to produce a flat HRNet state dict consumed by the downstream
repos (HRNet-seg `MODEL.PRETRAINED` key matching, seg_hrnet.py:456-480; A2J
`get_hrnet_w18_backbone(pretrain_pth)`, A2J/hrnet/official_hrnet.py:505-515;
DensePose `MODEL.WEIGHTS`).

`export_encoder` produces exactly that flat dict (torch naming, OIHW convs)
from our TrainState, so downstream transfer is unchanged.
`load_imagenet_pretrained` goes the other way (--IN_Pretrain /
--depth_Pretrain in build_backbone.py:547-560).

Name mapping (ours -> torch):
  stem{1,2}/conv|bn                -> conv{1,2} / bn{1,2}
  layer1_block{b}/cb{1..3}|downsample -> layer1.{b}.conv{k}/bn{k}|downsample.{0,1}
  transition{t}_{i}[_{j}]          -> transition{t}.{i}.[{j}.]{0,1}
  stage{s}_module{m}/branch{i}_block{b}/cb{1,2}
                                   -> stage{s}.{m}.branches.{i}.{b}.conv{k}/bn{k}
  stage{s}_module{m}/fuse{i}_{j}[_{k}] -> stage{s}.{m}.fuse_layers.{i}.{j}.[{k}.]{0,1}
Convs transpose HWIO<->OIHW; BN scale/bias<->weight/bias and
batch_stats mean/var <-> running_mean/running_var.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _convbn_torch_names(flax_path: str) -> Optional[str]:
    """Map one of our module path prefixes to the torch prefix for its
    conv/bn pair; returns None if unknown."""
    m = re.fullmatch(r"stem([12])", flax_path)
    if m:
        return f"__stem{m.group(1)}"  # special: conv1/bn1 flat names
    m = re.fullmatch(r"layer1_block(\d+)", flax_path)
    if m:
        return f"layer1.{m.group(1)}"
    m = re.fullmatch(r"transition(\d)_(\d+)_(\d+)", flax_path)
    if m:
        t, i, j = m.groups()
        return f"transition{t}.{i}.{j}"
    m = re.fullmatch(r"transition(\d)_(\d+)", flax_path)
    if m:
        t, i = m.groups()
        return f"transition{t}.{i}"
    m = re.fullmatch(r"stage(\d)_module(\d+)", flax_path)
    if m:
        s, mm = m.groups()
        return f"stage{s}.{mm}"
    return None


def hrnet_flax_to_torch(params: Dict, batch_stats: Dict) -> Dict[str, Any]:
    """Convert one HRNet encoder's params+stats to the reference torch
    state-dict naming.  Returns numpy arrays (caller may torch.save)."""
    flat_p = _flatten(params)
    flat_s = _flatten(batch_stats)
    out: Dict[str, np.ndarray] = {}

    def emit_conv(torch_prefix, arr):
        out[f"{torch_prefix}.weight"] = np.transpose(arr, (3, 2, 0, 1))

    def emit_bn(torch_prefix, path):
        scale = flat_p.get(path + ("scale",))
        bias = flat_p.get(path + ("bias",))
        mean = flat_s.get(path + ("mean",))
        var = flat_s.get(path + ("var",))
        if scale is not None:
            out[f"{torch_prefix}.weight"] = scale
        if bias is not None:
            out[f"{torch_prefix}.bias"] = bias
        if mean is not None:
            out[f"{torch_prefix}.running_mean"] = mean
            out[f"{torch_prefix}.running_var"] = var
            out[f"{torch_prefix}.num_batches_tracked"] = np.asarray(0)

    # ConvBN leaf paths look like (..., 'cbX'|'conv'|'bn', ...)
    # walk unique ConvBN module prefixes
    convbn_prefixes = sorted(
        {p[:-2] for p in flat_p if p[-2] == "conv" and p[-1] == "kernel"}
    )
    for pref in convbn_prefixes:
        # pref is a tuple of module names ending at the ConvBN module
        names = list(pref)
        torch_name = _translate_convbn(names)
        if torch_name is None:
            continue
        emit_conv(torch_name[0], flat_p[pref + ("conv", "kernel")])
        emit_bn(torch_name[1], pref + ("bn",))
    return out


def _translate_convbn(names) -> Optional[tuple]:
    """names: path of module names ending with the ConvBN module.
    Returns (torch_conv_prefix, torch_bn_prefix)."""
    # stem
    if len(names) == 1:
        m = re.fullmatch(r"stem([12])", names[0])
        if m:
            i = m.group(1)
            return (f"conv{i}", f"bn{i}")
        base = _convbn_torch_names(names[0])
        if base and base.startswith("transition"):
            return (f"{base}.0", f"{base}.1")
        return None
    # layer1 bottleneck: ('layer1_block0', 'cb1'|'downsample')
    if names[0].startswith("layer1_block"):
        blk = _convbn_torch_names(names[0])
        leaf = names[1]
        if leaf == "downsample":
            return (f"{blk}.downsample.0", f"{blk}.downsample.1")
        k = leaf[-1]
        return (f"{blk}.conv{k}", f"{blk}.bn{k}")
    # stages: ('stage2_module0', 'branch0_block0', 'cb1') or fuse
    if names[0].startswith("stage"):
        mod = _convbn_torch_names(names[0])
        leaf = names[1]
        m = re.fullmatch(r"branch(\d+)_block(\d+)", leaf)
        if m:
            i, b = m.groups()
            sub = names[2]
            if sub == "downsample":
                return (f"{mod}.branches.{i}.{b}.downsample.0",
                        f"{mod}.branches.{i}.{b}.downsample.1")
            k = sub[-1]
            return (f"{mod}.branches.{i}.{b}.conv{k}",
                    f"{mod}.branches.{i}.{b}.bn{k}")
        m = re.fullmatch(r"fuse(\d+)_(\d+)_(\d+)", leaf)
        if m:
            i, j, k = m.groups()
            return (f"{mod}.fuse_layers.{i}.{j}.{k}.0",
                    f"{mod}.fuse_layers.{i}.{j}.{k}.1")
        m = re.fullmatch(r"fuse(\d+)_(\d+)", leaf)
        if m:
            i, j = m.groups()
            return (f"{mod}.fuse_layers.{i}.{j}.0",
                    f"{mod}.fuse_layers.{i}.{j}.1")
    return None


def _unflatten_set(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def hrnet_torch_to_flax(state_dict: Dict[str, Any], params: Dict,
                        batch_stats: Dict):
    """Load a torch HRNet state dict (e.g. ImageNet pretrain) into copies of
    our (params, batch_stats) trees.  Unknown/missing keys are skipped, like
    the reference's filtered load (official_hrnet.py:461-473)."""
    flat_p = dict(_flatten(params))
    flat_s = dict(_flatten(batch_stats))
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    convbn_prefixes = sorted(
        {p[:-2] for p in flat_p if p[-2] == "conv" and p[-1] == "kernel"}
    )
    n_loaded = 0
    for pref in convbn_prefixes:
        tn = _translate_convbn(list(pref))
        if tn is None:
            continue
        cw = sd.get(f"{tn[0]}.weight")
        if cw is not None and cw.ndim == 4:
            want = flat_p[pref + ("conv", "kernel")].shape
            got = np.transpose(cw, (2, 3, 1, 0))
            if got.shape == want:
                flat_p[pref + ("conv", "kernel")] = got
                n_loaded += 1
        for ours, theirs, store in (
            (("bn", "scale"), f"{tn[1]}.weight", flat_p),
            (("bn", "bias"), f"{tn[1]}.bias", flat_p),
            (("bn", "mean"), f"{tn[1]}.running_mean", flat_s),
            (("bn", "var"), f"{tn[1]}.running_var", flat_s),
        ):
            v = sd.get(theirs)
            key = pref + ours
            if v is not None and key in store and v.shape == store[key].shape:
                store[key] = v

    new_p, new_s = {}, {}
    for path, v in flat_p.items():
        _unflatten_set(new_p, path, v)
    for path, v in flat_s.items():
        _unflatten_set(new_s, path, v)
    return new_p, new_s, n_loaded


def _sgcn_torch_to_flax(sd: Dict[str, np.ndarray], params: Dict,
                        batch_stats: Dict, torch_prefix: str = "encoder3."):
    """Load the reference SemGCN state dict (create_SGCN.py / sem_gcn.py /
    sem_graph_conv.py) into our SemGCN params+batch_stats trees.

    Name map (torch -> ours):
      gconv_input.0.{gconv,bn}       -> gconv_input/{gconv,bn}
      gconv_layers.{i}.gconv{1,2}.*  -> res{i}/gconv{1,2}/*
      gconv_output.{W,e,bias}        -> gconv_output/{W,e,bias}
    SemGraphConv quirks: torch `e` is (1, n_edges) vs our (n_edges,); our
    forward applies `bias - stdv` (uniform-shift init trick), so the flax
    param is torch_bias + stdv, stdv = 1/sqrt(out_features).
    """
    flat_p = dict(_flatten(params))
    flat_s = dict(_flatten(batch_stats))
    n = 0

    def set_gconv(torch_base, our_path):
        nonlocal n
        w = sd.get(torch_prefix + torch_base + ".W")
        if w is None:
            return
        flat_p[our_path + ("W",)] = w
        flat_p[our_path + ("e",)] = sd[
            torch_prefix + torch_base + ".e"].reshape(-1)
        b = sd.get(torch_prefix + torch_base + ".bias")
        if b is not None:
            stdv = 1.0 / np.sqrt(w.shape[2])
            flat_p[our_path + ("bias",)] = b + stdv
        n += 1

    def set_bn(torch_base, our_path):
        flat_p[our_path + ("scale",)] = sd[
            torch_prefix + torch_base + ".weight"]
        flat_p[our_path + ("bias",)] = sd[torch_prefix + torch_base + ".bias"]
        flat_s[our_path + ("mean",)] = sd[
            torch_prefix + torch_base + ".running_mean"]
        flat_s[our_path + ("var",)] = sd[
            torch_prefix + torch_base + ".running_var"]

    set_gconv("gconv_input.0.gconv", ("gconv_input", "gconv"))
    set_bn("gconv_input.0.bn", ("gconv_input", "bn"))
    i = 0
    while f"{torch_prefix}gconv_layers.{i}.gconv1.gconv.W" in sd:
        for g in ("gconv1", "gconv2"):
            set_gconv(f"gconv_layers.{i}.{g}.gconv", (f"res{i}", g, "gconv"))
            set_bn(f"gconv_layers.{i}.{g}.bn", (f"res{i}", g, "bn"))
        i += 1
    set_gconv("gconv_output", ("gconv_output",))

    new_p, new_s = {}, {}
    for path, v in flat_p.items():
        _unflatten_set(new_p, path, v)
    for path, v in flat_s.items():
        _unflatten_set(new_s, path, v)
    return new_p, new_s, n


def hcmoco_torch_to_flax(state_dict: Dict[str, Any], params: Dict,
                         batch_stats: Dict):
    """Load the full reference CMC3HRNetSGCNSingleHead state dict
    (build_backbone.py:186-303) into our HCMoCoModel trees: both HRNet
    encoders, the SemGCN skeleton encoder, the three linear projection
    heads, and (if present) the stage-2 encoder{1,2}_linear 1x1 convs.

    Returns (params, batch_stats, n_loaded).  Used by the reference
    loss-curve parity harness (tools/ref_parity.py) to start both
    frameworks from bit-identical weights."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = dict(params)
    batch_stats = dict(batch_stats)
    total = 0

    for enc in ("encoder1", "encoder2"):
        sub = {k[len(enc) + 1:]: v for k, v in sd.items()
               if k.startswith(enc + ".")}
        p, s, n = hrnet_torch_to_flax(sub, params[enc],
                                      batch_stats.get(enc, {}))
        params[enc] = p
        batch_stats[enc] = s
        total += n

    if "encoder3" in params:
        p, s, n = _sgcn_torch_to_flax(sd, params["encoder3"],
                                      batch_stats.get("encoder3", {}))
        params["encoder3"] = p
        batch_stats["encoder3"] = s
        total += n

    for h in ("head1", "head2", "head3"):
        w = sd.get(f"{h}.0.weight")
        if w is not None and h in params:
            params[h] = dict(params[h])
            params[h]["fc"] = {"kernel": np.transpose(w, (1, 0)),
                               "bias": sd[f"{h}.0.bias"]}
            total += 1

    for lin in ("encoder1_linear", "encoder2_linear"):
        w = sd.get(f"{lin}.weight")
        if w is not None and lin in params:
            params[lin] = {"kernel": np.transpose(w, (2, 3, 1, 0)),
                           "bias": sd[f"{lin}.bias"]}
            total += 1

    return params, batch_stats, total


def fcn_torch_to_flax(state_dict: Dict[str, Any], params: Dict,
                      batch_stats: Dict):
    """Load the reference FCNHead state dict (networks/fcn.py:35-111:
    convs.{i}.conv / convs.{i}.norm_name BN / conv_seg) into our FCNHead
    trees (conv{i} / bn{i} / conv_seg)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    flat_p = dict(_flatten(params))
    flat_s = dict(_flatten(batch_stats))
    n = 0
    i = 0
    while f"convs.{i}.conv.weight" in sd:
        flat_p[(f"conv{i}", "kernel")] = np.transpose(
            sd[f"convs.{i}.conv.weight"], (2, 3, 1, 0))
        if f"convs.{i}.conv.bias" in sd:
            flat_p[(f"conv{i}", "bias")] = sd[f"convs.{i}.conv.bias"]
        bn = f"convs.{i}.norm_name"
        flat_p[(f"bn{i}", "scale")] = sd[f"{bn}.weight"]
        flat_p[(f"bn{i}", "bias")] = sd[f"{bn}.bias"]
        flat_s[(f"bn{i}", "mean")] = sd[f"{bn}.running_mean"]
        flat_s[(f"bn{i}", "var")] = sd[f"{bn}.running_var"]
        n += 1
        i += 1
    if "conv_seg.weight" in sd:
        flat_p[("conv_seg", "kernel")] = np.transpose(
            sd["conv_seg.weight"], (2, 3, 1, 0))
        flat_p[("conv_seg", "bias")] = sd["conv_seg.bias"]
        n += 1
    new_p, new_s = {}, {}
    for path, v in flat_p.items():
        _unflatten_set(new_p, path, v)
    for path, v in flat_s.items():
        _unflatten_set(new_s, path, v)
    return new_p, new_s, n


def _resnet_torch_name(path) -> Optional[tuple]:
    """Map one of our flax ResNet conv/bn module paths to the torch
    (conv_prefix, bn_prefix).  Ours (models/resnet.py): stem_conv/stem_bn,
    layer{s}_block{b}/{c1,c2,c3,ds}_{conv,bn}.  Torch (reference
    resnet.py): conv1/bn1, layer{s}.{b}.conv{k}/bn{k}, downsample.{0,1}."""
    if path[0] == "stem_conv":
        return ("conv1", None)
    if path[0] == "stem_bn":
        return (None, "bn1")
    m = re.fullmatch(r"layer(\d)_block(\d+)", path[0])
    if m and len(path) > 1:
        s, b = m.groups()
        leaf = path[1]
        m2 = re.fullmatch(r"(c\d|ds)_(conv|bn)", leaf)
        if not m2:
            return None
        part, kind = m2.groups()
        if part == "ds":
            t = f"layer{s}.{b}.downsample.{0 if kind == 'conv' else 1}"
        else:
            t = f"layer{s}.{b}.{'conv' if kind == 'conv' else 'bn'}{part[1]}"
        return (t, None) if kind == "conv" else (None, t)
    return None


def resnet_torch_to_flax(state_dict: Dict[str, Any], params: Dict,
                         batch_stats: Dict, torch_prefix: str = ""):
    """Load a reference-ResNet torch state dict into our flax ResNet
    (models/resnet.py) params+batch_stats trees.  Used by the MoCo
    reference-parity harness (RGBSingleHead encoder, build_backbone.py:23)."""
    sd = {k[len(torch_prefix):]: np.asarray(v)
          for k, v in state_dict.items() if k.startswith(torch_prefix)}
    flat_p = dict(_flatten(params))
    flat_s = dict(_flatten(batch_stats))
    n = 0
    seen = set()
    for path in list(flat_p):
        mod = path[:-1]
        if mod in seen:
            continue
        seen.add(mod)
        tn = _resnet_torch_name(mod)
        if tn is None:
            continue
        conv_t, bn_t = tn
        if conv_t is not None:
            w = sd.get(f"{conv_t}.weight")
            if w is not None and w.ndim == 4:
                got = np.transpose(w, (2, 3, 1, 0))
                if got.shape == flat_p[mod + ("kernel",)].shape:
                    flat_p[mod + ("kernel",)] = got
                    n += 1
        else:
            for ours, theirs, store in (
                (("scale",), f"{bn_t}.weight", flat_p),
                (("bias",), f"{bn_t}.bias", flat_p),
                (("mean",), f"{bn_t}.running_mean", flat_s),
                (("var",), f"{bn_t}.running_var", flat_s),
            ):
                v = sd.get(theirs)
                key = mod + ours
                if v is not None and key in store \
                        and v.shape == store[key].shape:
                    store[key] = v
    new_p, new_s = {}, {}
    for path, v in flat_p.items():
        _unflatten_set(new_p, path, v)
    for path, v in flat_s.items():
        _unflatten_set(new_s, path, v)
    return new_p, new_s, n


def single_modal_torch_to_flax(state_dict: Dict[str, Any], params: Dict,
                               batch_stats: Dict):
    """Load a reference RGBSingleHead state dict (resnet encoder + linear
    head, build_backbone.py:14-58) into our SingleModalModel trees."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = dict(params)
    batch_stats = dict(batch_stats)
    p, s, n = resnet_torch_to_flax(sd, params["encoder"],
                                   batch_stats.get("encoder", {}),
                                   torch_prefix="encoder.")
    params["encoder"] = p
    batch_stats["encoder"] = s
    w = sd.get("head.0.weight")
    if w is not None and "head" in params:
        params["head"] = dict(params["head"])
        params["head"]["fc"] = {"kernel": np.transpose(w, (1, 0)),
                                "bias": sd["head.0.bias"]}
        n += 1
    return params, batch_stats, n


def export_encoder(state, encoder_name: str, out_path: str):
    """transfer_ckpt equivalent: write the flat torch-named HRNet state dict
    for `encoder1` (RGB) or `encoder2` (depth) to out_path (.pth)."""
    import torch

    sd = hrnet_flax_to_torch(
        state.params[encoder_name],
        state.batch_stats.get(encoder_name, {}),
    )
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v.copy()))
                for k, v in sd.items()}, out_path)
    return sd


def load_imagenet_pretrained(path: str, params: Dict, batch_stats: Dict,
                             encoder_names=("encoder1", "encoder2")):
    """--IN_Pretrain / --depth_Pretrain analog: initialize HRNet encoders
    from a torch ImageNet checkpoint (build_backbone.py:547-560)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}
    params = dict(params)
    batch_stats = dict(batch_stats)
    total = 0
    for enc in encoder_names:
        if enc not in params:
            continue
        p, s, n = hrnet_torch_to_flax(sd, params[enc],
                                      batch_stats.get(enc, {}))
        params[enc] = p
        batch_stats[enc] = s
        total += n
    return params, batch_stats, total
