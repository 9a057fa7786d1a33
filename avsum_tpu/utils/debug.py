"""Numerical-safety tooling (SURVEY.md §5.2).

The reference's only "sanitizer" was print statements; the JAX-native
equivalents here are:

- ``checked(fn)``: a checkify-wrapped jit that turns NaN/inf and
  out-of-bounds indexing inside compiled code into raised Python errors
  (instead of silent garbage)
- ``debug_nans()``: context manager enabling global jax_debug_nans
- ``assert_all_finite``: host-side pytree finiteness assertion for tests
  and checkpoint validation
"""

from __future__ import annotations

import contextlib
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap ``fn`` with checkify float + index checks; raises on failure."""
    errs = checkify.float_checks | checkify.index_checks
    cfn = checkify.checkify(fn, errors=errs)
    if jit:
        cfn = jax.jit(cfn)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Temporarily enable jax_debug_nans (every primitive checked)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_all_finite(tree, name: str = "pytree") -> None:
    """Host-side: raise if any leaf of ``tree`` contains NaN/inf."""
    bad = []

    def check(path, leaf):
        arr = jnp.asarray(leaf)
        if arr.dtype.kind == "f" and not bool(jnp.all(jnp.isfinite(arr))):
            bad.append(jax.tree_util.keystr(path))
        return leaf

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise FloatingPointError(f"{name}: non-finite leaves at {bad}")
