"""Port torch-hub VGGish weights into the Flax VGGish module.

The reference loads ``torch.hub.load("harritaylor/torchvggish", "vggish")``
(/root/reference/features/extractors.py:188). That package's module layout:

    features:   Conv2d(1,64) ReLU Pool Conv2d(64,128) ReLU Pool
                Conv2d(128,256) ReLU Conv2d(256,256) ReLU Pool
                Conv2d(256,512) ReLU Conv2d(512,512) ReLU Pool
    embeddings: Linear(512*4*6, 4096) ReLU Linear(4096,4096) ReLU
                Linear(4096,128) ReLU

Index map (torch state_dict key -> flax param name below). Flatten order:
torchvggish's VGG.forward transposes the conv output to (B, 6, 4, 512)
BEFORE flattening (two torch.transpose calls), i.e. (H, W, C) order —
identical to this module's NHWC flatten, so the first Linear ports with a
plain transpose (verified against a torch replica in
tests/test_vggish_port.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# torch features index -> flax conv name
_CONV_MAP = {
    "features.0": "conv1_1",
    "features.3": "conv2_1",
    "features.6": "conv3_1",
    "features.8": "conv3_2",
    "features.11": "conv4_1",
    "features.13": "conv4_2",
}
_FC_MAP = {
    "embeddings.0": "fc1_1",
    "embeddings.2": "fc1_2",
    "embeddings.4": "fc2",
}

# VGGish post-conv feature map is [B, 6, 4, 512] in our NHWC net
_H, _W, _C = 6, 4, 512


def vggish_from_torch(state_dict) -> Dict:
    """torchvggish state_dict -> Flax VGGish params pytree."""
    params: Dict[str, Dict[str, np.ndarray]] = {}

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    for torch_name, flax_name in _CONV_MAP.items():
        w = to_np(state_dict[f"{torch_name}.weight"])  # [O, I, kh, kw]
        b = to_np(state_dict[f"{torch_name}.bias"])
        params[flax_name] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": b,
        }
    for torch_name, flax_name in _FC_MAP.items():
        w = to_np(state_dict[f"{torch_name}.weight"])  # [out, in]
        b = to_np(state_dict[f"{torch_name}.bias"])
        params[flax_name] = {
            "kernel": np.ascontiguousarray(w.T),
            "bias": b,
        }
    return params
