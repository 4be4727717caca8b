"""Minimal yacs.config.CfgNode stand-in so the reference HRNet config
(`networks/official_hrnet/default_config.py`) imports on this image (yacs is
not installed).  Supports only what the reference uses: nested attribute
get/set, new_allowed nodes, defrost/freeze no-ops, merge_from_file (yaml),
merge_from_list."""

import sys
import types

import yaml


class CfgNode(dict):
    def __init__(self, *a, new_allowed=False, **k):
        super().__init__(*a, **k)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def defrost(self):
        return self

    def freeze(self):
        return self

    def clone(self):
        import copy
        return copy.deepcopy(self)

    def _merge(self, other):
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), CfgNode):
                self[k]._merge(v)
            elif isinstance(v, dict):
                node = CfgNode()
                node._merge(v)
                self[k] = node
            else:
                self[k] = v

    def merge_from_file(self, path):
        with open(path) as f:
            self._merge(yaml.safe_load(f))

    def merge_from_list(self, opts):
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = value


def install():
    mod = types.ModuleType("yacs")
    cfg = types.ModuleType("yacs.config")
    cfg.CfgNode = CfgNode
    mod.config = cfg
    sys.modules.setdefault("yacs", mod)
    sys.modules.setdefault("yacs.config", cfg)
