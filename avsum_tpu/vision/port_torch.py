"""Port torchvision backbone weights into the Flax modules.

Used two ways:
1. Production: load a released torchvision checkpoint once and convert, so
   the TPU backbones match the reference's pretrained extractors
   (/root/reference/features/extractors.py:25-26) bit-for-bit in topology.
2. Testing: port a *randomly initialized* torchvision model and assert the
   Flax forward matches torch eval outputs — an architecture-parity proof
   that needs no downloaded weights (tests/test_vision.py).

Conventions: torch convs are OIHW, Flax NHWC convs are HWIO; torch BN
weight/bias -> Flax scale/bias (params), running_mean/var -> batch_stats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _nest(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _convert_conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _resnet_path(torch_key: str) -> str:
    """torchvision resnet key prefix -> our flax module path."""
    parts = torch_key.split(".")
    if parts[0] in ("conv1", "bn1"):
        return parts[0]
    if parts[0].startswith("layer"):
        block = f"{parts[0]}_{parts[1]}"
        if parts[2] == "downsample":
            sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
            return f"{block}/{sub}"
        return f"{block}/{parts[2]}"
    raise KeyError(torch_key)


def resnet50_from_torch(state_dict) -> Tuple[Dict, Dict]:
    """torchvision resnet50 state_dict -> (params, batch_stats) pytrees."""
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}
    for key, tensor in state_dict.items():
        value = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        if key.startswith("fc."):
            continue  # head removed (extractors.py:29)
        if key.endswith("num_batches_tracked"):
            continue
        path = _resnet_path(key[: key.rfind(".")])
        leaf = key.rsplit(".", 1)[1]
        if leaf == "weight" and value.ndim == 4:
            params[f"{path}/kernel"] = _convert_conv(value)
        elif leaf == "weight":
            params[f"{path}/scale"] = value
        elif leaf == "bias":
            params[f"{path}/bias"] = value
        elif leaf == "running_mean":
            stats[f"{path}/mean"] = value
        elif leaf == "running_var":
            stats[f"{path}/var"] = value
        else:
            raise KeyError(key)
    return _nest(params), _nest(stats)


def inception_v3_from_torch(state_dict) -> Tuple[Dict, Dict]:
    """torchvision inception_v3 state_dict -> (params, batch_stats).

    Names map 1:1 (Mixed_5b.branch1x1.conv.weight -> Mixed_5b/branch1x1/
    conv/kernel); fc and AuxLogits are dropped (extractors.py:32-36)."""
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}
    for key, tensor in state_dict.items():
        if key.startswith(("fc.", "AuxLogits.")):
            continue
        if key.endswith("num_batches_tracked"):
            continue
        value = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = key.split(".")
        leaf = parts[-1]
        path = "/".join(parts[:-1])
        if leaf == "weight" and value.ndim == 4:
            params[f"{path}/kernel"] = _convert_conv(value)
        elif leaf == "weight":
            params[f"{path}/scale"] = value
        elif leaf == "bias":
            params[f"{path}/bias"] = value
        elif leaf == "running_mean":
            stats[f"{path}/mean"] = value
        elif leaf == "running_var":
            stats[f"{path}/var"] = value
        else:
            raise KeyError(key)
    return _nest(params), _nest(stats)


def dual_backbone_variables(resnet_state_dict, inception_state_dict) -> Dict:
    """Compose both ported torchvision backbones into the variable tree the
    pipeline's ``DualBackbone`` consumes (submodules ``resnet`` and
    ``inception``). Persist with ``utils.serialization.save_params`` and
    point ``visual.weights`` at the file — the explicit equivalent of the
    reference's implicit pretrained downloads (extractors.py:25-26)."""
    r_params, r_stats = resnet50_from_torch(resnet_state_dict)
    i_params, i_stats = inception_v3_from_torch(inception_state_dict)
    return {
        "params": {"resnet": r_params, "inception": i_params},
        "batch_stats": {"resnet": r_stats, "inception": i_stats},
    }
