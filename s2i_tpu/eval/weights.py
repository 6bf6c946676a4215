"""Port torch InceptionV3 weights → Flax variables.

The reference protocol needs StackGAN's *fine-tuned* Inception checkpoints
(CUB / Oxford), which are external assets not present in this offline
environment (SURVEY.md §7 hard-part 3). This mapper converts any
torchvision-layout ``inception_v3`` state_dict (also the layout pytorch-fid
uses) into the variables of :class:`s2i_tpu.models.inception.InceptionV3`,
whose module names intentionally mirror torchvision's.

Layout conversions: conv OIHW→HWIO; linear [out,in]→[in,out]; BN
running_mean/var → batch_stats.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def load_torch_inception(state_dict: Mapping[str, Any], num_classes: int = 1000):
    """state_dict: name → tensor/ndarray (e.g. ``torch.load(...)``).

    Returns flax ``{'params': ..., 'batch_stats': ...}`` for InceptionV3.
    """
    params: dict = {}
    stats: dict = {}

    def as_np(v) -> np.ndarray:
        return np.asarray(getattr(v, "numpy", lambda: v)())

    def put(tree: dict, path: list[str], leaf: np.ndarray) -> None:
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for name, value in state_dict.items():
        v = as_np(value)
        parts = name.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(params, ["fc", "kernel"], v.T.astype(np.float32))
            else:
                put(params, ["fc", "bias"], v.astype(np.float32))
            continue
        if parts[0].startswith("AuxLogits"):
            continue  # aux head not used for IS/FID
        # e.g. Mixed_5b.branch1x1.conv.weight / ...bn.running_mean
        *mods, layer, leaf_name = parts
        path = mods + [layer]
        if layer == "conv" and leaf_name == "weight":
            put(params, path + ["kernel"], v.transpose(2, 3, 1, 0).astype(np.float32))
        elif layer == "bn":
            if leaf_name == "weight":
                put(params, path + ["scale"], v.astype(np.float32))
            elif leaf_name == "bias":
                put(params, path + ["bias"], v.astype(np.float32))
            elif leaf_name == "running_mean":
                put(stats, path + ["mean"], v.astype(np.float32))
            elif leaf_name == "running_var":
                put(stats, path + ["var"], v.astype(np.float32))
        # num_batches_tracked and anything else: ignored

    return {"params": params, "batch_stats": stats}
