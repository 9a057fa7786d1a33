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


def vit_from_torch(state_dict) -> Tuple[Dict, Dict[str, int]]:
    """torchvision ``vit_b_16``-layout state_dict -> (params, arch).

    Returns the parameter pytree for :class:`avsum_tpu.vision.vit.ViT`
    instantiated with ``cls_token=True`` and the inferred architecture
    kwargs ``{embed_dim, depth, num_heads, patch_size, image_size}`` —
    the "upgraded encoders" pretrained path (BASELINE config 4; the
    pretrained-backbone pattern of extractors.py:25-26).

    Key mapping (torchvision vision_transformer.py layout):
      conv_proj.{weight,bias}                 -> patch_embed/{kernel,bias}
      class_token                             -> cls
      encoder.pos_embedding                   -> pos_embed
      encoder.layers.encoder_layer_i.
        ln_1.{weight,bias}                    -> block{i}/LayerNorm_0
        self_attention.in_proj_{weight,bias}  -> block{i}/MHSA_0/qkv
          (packed [3E, E] rows = q;k;v        ->  kernel [E, 3, H, D])
        self_attention.out_proj.{weight,bias} -> block{i}/MHSA_0/out
          ([E, E]                             ->  kernel [H, D, E])
        ln_2.{weight,bias}                    -> block{i}/LayerNorm_1
        mlp.{0|linear_1}.{weight,bias}        -> block{i}/Dense_0
        mlp.{3|linear_2}.{weight,bias}        -> block{i}/Dense_1
      encoder.ln.{weight,bias}                -> final_norm
      heads.*                                 -> dropped (feature extractor)
    """

    def npy(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    sd = {k: npy(v) for k, v in state_dict.items() if not k.startswith("heads.")}
    embed = int(sd["class_token"].shape[-1])
    n_pos = int(sd["encoder.pos_embedding"].shape[1])
    patch = int(sd["conv_proj.weight"].shape[-1])
    grid = int(round((n_pos - 1) ** 0.5))
    depth = 1 + max(
        int(k.split("encoder_layer_")[1].split(".")[0])
        for k in sd
        if "encoder_layer_" in k
    )
    # heads from the packed qkv: torch stores no head count, but every
    # torchvision ViT uses head_dim 64
    heads = embed // 64

    params: Dict[str, np.ndarray] = {
        "patch_embed/kernel": _convert_conv(sd.pop("conv_proj.weight")),
        "patch_embed/bias": sd.pop("conv_proj.bias"),
        "cls": sd.pop("class_token"),
        "pos_embed": sd.pop("encoder.pos_embedding"),
        "final_norm/scale": sd.pop("encoder.ln.weight"),
        "final_norm/bias": sd.pop("encoder.ln.bias"),
    }
    d = embed // heads
    for i in range(depth):
        src = f"encoder.layers.encoder_layer_{i}."
        dst = f"block{i}/"
        mhsa = dst + "MultiHeadSelfAttention_0/"
        params[dst + "LayerNorm_0/scale"] = sd.pop(src + "ln_1.weight")
        params[dst + "LayerNorm_0/bias"] = sd.pop(src + "ln_1.bias")
        w = sd.pop(src + "self_attention.in_proj_weight")  # [3E, E]
        b = sd.pop(src + "self_attention.in_proj_bias")  # [3E]
        params[mhsa + "qkv/kernel"] = np.ascontiguousarray(
            w.T.reshape(embed, 3, heads, d)
        )
        params[mhsa + "qkv/bias"] = b.reshape(3, heads, d)
        wo = sd.pop(src + "self_attention.out_proj.weight")  # [E, E]
        params[mhsa + "out/kernel"] = np.ascontiguousarray(
            wo.T.reshape(heads, d, embed)
        )
        params[mhsa + "out/bias"] = sd.pop(src + "self_attention.out_proj.bias")
        params[dst + "LayerNorm_1/scale"] = sd.pop(src + "ln_2.weight")
        params[dst + "LayerNorm_1/bias"] = sd.pop(src + "ln_2.bias")
        for flax_name, candidates in (
            ("Dense_0", ("mlp.0", "mlp.linear_1")),
            ("Dense_1", ("mlp.3", "mlp.linear_2")),
        ):
            key = next(
                c for c in candidates if src + c + ".weight" in sd
            )
            params[dst + flax_name + "/kernel"] = np.ascontiguousarray(
                sd.pop(src + key + ".weight").T
            )
            params[dst + flax_name + "/bias"] = sd.pop(src + key + ".bias")
    leftovers = [k for k in sd if "dropout" not in k]
    if leftovers:
        raise KeyError(f"unmapped torchvision ViT keys: {leftovers[:5]}")
    arch = {
        "embed_dim": embed,
        "depth": depth,
        "num_heads": heads,
        "patch_size": patch,
        "image_size": grid * patch,
    }
    return _nest(params), arch
