"""Persistent XLA compilation cache wiring.

TPU compiles are expensive — on this image they go through a remote
tunnel and a cold pipeline warmup is minutes of compile time. JAX's
persistent compilation cache stores compiled executables on disk keyed
by (program, topology, compiler version), so every process after the
first starts with warm programs. The reference has no analogue (it has
no compiled programs); for a production TPU service this is standard
deployment hygiene.

Enabled automatically by ``bench.py`` and the CLI; set
``AVSUM_COMPILE_CACHE=off`` to disable or ``AVSUM_COMPILE_CACHE=<dir>``
to relocate (default ``~/.cache/avsum_tpu/xla``).

Caveat: a PJRT backend must support executable serialization for entries
to land. The axon remote-TPU tunnel used in this dev image does not (the
cache dir stays empty there; its remote service keeps its own compile
cache) — on standard Cloud TPU hosts and on CPU this persists normally.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "avsum_tpu", "xla"
)


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path``.

    Returns the cache dir in use, or None when disabled (via the
    ``AVSUM_COMPILE_CACHE=off`` env var). Safe to call more than once.
    Must run before the programs it should capture are compiled (already-
    compiled programs stay in memory either way).
    """
    env = os.environ.get("AVSUM_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "false", "disabled"):
        return None
    if path is None:
        path = env or _DEFAULT

    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_enable_compilation_cache", True)
    # cache anything that took >= 1s to compile (the default threshold
    # skips small programs; through a remote-compile tunnel even those
    # are worth keeping)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
