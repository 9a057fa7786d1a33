"""Multi-host initialization (SURVEY.md §5.8).

On a TPU pod slice each host runs the same program;
``jax.distributed.initialize()`` wires them into one runtime and
``jax.devices()`` becomes the global device list — after which every mesh/
sharding/collective in this framework works unchanged (ICI within a slice,
DCN across slices handled by the runtime). There is no bespoke transport
layer to configure; this module is the thin entry point plus
process-placement helpers.
"""

from __future__ import annotations

from typing import Optional

import jax

from avsum_tpu.utils.logging import get_logger

log = get_logger("avsum.multihost")

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op when single-process).

    With no arguments, jax auto-detects the TPU pod environment (GCE
    metadata / megascale coordinator). Safe to call unconditionally at
    program start; subsequent calls are ignored.
    """
    global _initialized
    if _initialized:
        return
    # NOTE: do NOT touch jax.process_count()/jax.devices() before this
    # call — they instantiate the local backend and make distributed init
    # fail, silently degrading a pod to N single-host runs.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        log.info(
            "multi-host initialized: process %d/%d, %d global devices",
            jax.process_index(),
            jax.process_count(),
            len(jax.devices()),
        )
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            _initialized = True
            return
        raise
    except ValueError as e:  # single-host dev boxes: no coordinator env
        _initialized = True
        log.info("multi-host init skipped, running single-host (%s)", e)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This host's shard of a globally-sharded batch axis."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
