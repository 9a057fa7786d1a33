"""Scorer model export: serialized StableHLO artifacts for deployment.

``jax.export`` lowers the jitted scorer once (weights baked in as
constants, shot/batch axes symbolic) and serializes it; a serving host
deserializes and calls it without any model code, Flax, or checkpoint
restore — the TPU-native analogue of TorchScript/ONNX deployment export,
a capability the reference entirely lacks (its weights only ever live in
a live process, SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["export_scorer", "load_scorer"]


def export_scorer(
    model,
    params,
    visual_dim: int,
    audio_dim: int,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> bytes:
    """Serialize ``model.apply`` with ``params`` baked in.

    The exported function takes (visual [B,S,Dv], audio [B,S,Da],
    mask [B,S]) with symbolic batch/shot axes, so one artifact serves
    every padded bucket. Returns the serialized bytes (write them
    wherever deployment artifacts live).
    """
    from jax import export as jexport

    params = jax.tree_util.tree_map(jnp.asarray, params)

    def fn(visual, audio, mask):
        return model.apply({"params": params}, visual, audio, mask)

    b, s = jexport.symbolic_shape("b, s")
    args = (
        jax.ShapeDtypeStruct((b, s, visual_dim), jnp.float32),
        jax.ShapeDtypeStruct((b, s, audio_dim), jnp.float32),
        jax.ShapeDtypeStruct((b, s), jnp.float32),
    )
    exported = jexport.export(jax.jit(fn), platforms=tuple(platforms))(*args)
    return exported.serialize()


def load_scorer(blob: bytes) -> Callable[..., np.ndarray]:
    """Deserialize an :func:`export_scorer` artifact into a callable
    ``(visual, audio, mask) -> scores [B, S]`` — no model code needed."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)

    def call(visual, audio, mask):
        return exported.call(
            jnp.asarray(visual, jnp.float32),
            jnp.asarray(audio, jnp.float32),
            jnp.asarray(mask, jnp.float32),
        )

    return call
