"""Parameter-tree save/load (msgpack) for ported/pretrained weights.

The reference gets pretrained encoders implicitly from torchvision /
torch.hub downloads (/root/reference/features/extractors.py:25-26,188).
This framework's equivalents are converted once (vision/port_torch.py,
audio/port_vggish.py) and persisted here, then loaded by path from the
config (``visual.weights`` / ``audio.vggish_weights``) — no network at
run time, and weights become an explicit, versionable artifact.
"""

from __future__ import annotations

from typing import Any

from flax import serialization


def save_params(path: str, tree: Any) -> None:
    """Serialize a (nested dict) parameter pytree to ``path`` (msgpack)."""
    import jax

    tree = jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(tree))


def load_params(path: str) -> Any:
    """Load a parameter pytree written by :func:`save_params`."""
    with open(path, "rb") as fh:
        return serialization.msgpack_restore(fh.read())
