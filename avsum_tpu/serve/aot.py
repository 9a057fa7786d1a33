"""AOT artifacts for the EXPENSIVE pipeline programs (embed + audio).

The scorer has shipped as a ``jax.export`` artifact since round 2
(:mod:`avsum_tpu.serve.export`), but the costly programs — the dual-
backbone frame embed and the VGGish+spectral audio front-end, the rebuilt
equivalents of the reference's hot loops
(/root/reference/features/extractors.py:43-115, 195-246) — were compiled
from scratch by every fresh process. On the axon tunnel that is minutes
of cold start per process and the persistent compilation cache provably
does not help (it never serializes TPU executables — README "Warm
starts"). This module closes that gap with two artifact modes:

- ``stablehlo`` (``jax.export``): portable across processes/platforms.
  A fresh process skips Python tracing + lowering of the Flax graphs
  (the host-side minutes on a 1-core machine); the backend still
  compiles the embedded module once per process.
- ``exec`` (``jax.experimental.serialize_executable``): pickles the
  compiled PjRt executable itself — a TRUE warm start, zero backend
  compile — where the PjRt plugin implements executable serialization
  (capability-probed at runtime; fails closed to ``stablehlo``).

Artifacts are keyed by the same config fingerprint the feature cache
uses plus the program's bucket shape, so a loader never installs a
program whose feature semantics drifted from the live config.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "executable_serialization_supported",
    "export_pipeline_programs",
    "load_pipeline_programs",
    "wave_bucket",
]

_MANIFEST = "programs.json"


def wave_bucket(n_samples: int, sample_rate: int) -> int:
    """The padded waveform bucket AudioFrontend.dispatch_full uses: next
    power of two of max(n_samples, one second)."""
    t = max(int(n_samples), int(sample_rate))
    return 1 << (t - 1).bit_length()


def executable_serialization_supported(backend: Optional[str] = None) -> Tuple[bool, str]:
    """Probe whether the current PjRt plugin can round-trip a compiled
    executable (serialize -> pickle -> deserialize_and_load -> execute).

    Returns (supported, detail). The axon tunnel plugin historically does
    not implement executable serialization; this probe is the committed
    evidence either way (VERDICT r3 item 3).
    """
    try:
        from jax.experimental import serialize_executable as se

        fn = jax.jit(lambda x: x * 2.0 + 1.0)
        compiled = fn.lower(jax.ShapeDtypeStruct((8,), jnp.float32)).compile()
        payload, in_tree, out_tree = se.serialize(compiled)
        blob = pickle.dumps((payload, in_tree, out_tree))
        p2, it2, ot2 = pickle.loads(blob)
        loaded = se.deserialize_and_load(p2, it2, ot2, backend=backend)
        out = loaded(jnp.arange(8, dtype=jnp.float32))
        ok = bool(np.allclose(np.asarray(out), np.arange(8) * 2.0 + 1.0))
        return ok, "round-trip executed" if ok else "round-trip wrong result"
    except Exception as e:  # noqa: BLE001 — the probe's whole point
        return False, f"{type(e).__name__}: {str(e)[:300]}"


# ---------------------------------------------------------------------------
# Export
# ---------------------------------------------------------------------------


def _shapes_of(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )


def _embed_packed_fn(pipeline, h: int, w: int, bs: Optional[int] = None):
    """The packed-plane embed program as fn(variables, buf) — weights stay
    call-time arguments (they're already device-resident in the live
    pipeline, and baking them in would embed ~200 MB of constants that
    serialize_executable refuses outright). ``bs`` defaults to the full
    embed batch; smaller values export the tail-bucket programs."""
    frontend = pipeline.visual
    bs = bs or frontend.batch_size

    def fn(variables, buf):
        ny = bs * h * w
        nc = bs * (h // 2) * (w // 2)
        from avsum_tpu.ops.color import yuv420_to_rgb_device

        y = buf[:ny].reshape(bs, h, w)
        u = buf[ny : ny + nc].reshape(bs, h // 2, w // 2)
        v = buf[ny + nc : ny + 2 * nc].reshape(bs, h // 2, w // 2)
        r, g, b = yuv420_to_rgb_device(y, u, v)
        frames = jnp.stack([r, g, b], axis=-1)
        return frontend.model.apply(variables, frames, train=False)

    buf_len = bs * (h * w + 2 * (h // 2) * (w // 2))
    return fn, (
        _shapes_of(frontend.variables),
        jax.ShapeDtypeStruct((buf_len,), jnp.uint8),
    )


def _audio_full_fn(pipeline, t_bucket: int):
    """The whole-waveform audio front-end as fn(vggish_params, wave)."""
    frontend = pipeline.audio

    def fn(params, wave):
        return frontend._full_features_impl(params, wave)

    return fn, (
        _shapes_of(frontend.vggish_params),
        jax.ShapeDtypeStruct((t_bucket,), jnp.int16),
    )


def _export_one(fn, args, mode: str, platforms: Sequence[str]) -> Tuple[bytes, str]:
    """Serialize one program; returns (blob, actual_mode)."""
    if mode == "exec":
        from jax.experimental import serialize_executable as se

        compiled = jax.jit(fn).lower(*args).compile()
        payload, in_tree, out_tree = se.serialize(compiled)
        return pickle.dumps((payload, in_tree, out_tree)), "exec"
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn), platforms=tuple(platforms))(*args)
    return exported.serialize(), "stablehlo"


def _fingerprint(pipeline) -> str:
    from avsum_tpu.data.cache import config_fingerprint

    return config_fingerprint(
        pipeline.config.visual, pipeline.config.audio, pipeline.detector
    )


def export_pipeline_programs(
    pipeline,
    out_dir: str,
    *,
    plane_shapes: Optional[Sequence[Tuple[int, int]]] = None,
    wave_seconds: Sequence[float] = (120.0,),
    platforms: Sequence[str] = ("cpu", "tpu"),
    mode: str = "auto",
) -> Dict:
    """Write AOT artifacts for the embed + audio-frontend programs.

    ``plane_shapes`` defaults to the pipeline's ship bucket
    [(ship_size, ship_size)]. ``wave_seconds`` become power-of-two sample
    buckets. ``mode``: "stablehlo" | "exec" | "auto" (exec when the
    backend supports it, else stablehlo). Returns the manifest.
    """
    if mode == "auto":
        ok, detail = executable_serialization_supported()
        mode = "exec" if ok else "stablehlo"
    if plane_shapes is None:
        ship = pipeline.config.visual.ship_size or 304
        plane_shapes = [(ship, ship)]
    sr = pipeline.config.audio.sample_rate
    buckets = sorted({wave_bucket(int(s * sr), sr) for s in wave_seconds})

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "fingerprint": _fingerprint(pipeline),
        "jax_version": jax.__version__,
        "mode": mode,
        "platforms": list(platforms),
        "batch_size": pipeline.visual.batch_size,
        "init_seed": 0,
        "programs": [],
    }
    # full embed batch + the power-of-two tail buckets the dispatch path
    # can emit (vision/backbone.py::tail_bucket) — a partial last block
    # must hit an artifact too, or a fresh process pays one tunnel
    # compile per tail shape it meets
    frontend = pipeline.visual
    batches = [frontend.batch_size]
    b = frontend.batch_size
    while b // 2 >= frontend.MIN_BUCKET:
        b //= 2
        batches.append(b)
    for h, w in plane_shapes:
        for bs in batches:
            fn, args = _embed_packed_fn(pipeline, h, w, bs)
            blob, actual = _export_one(fn, args, mode, platforms)
            name = f"embed_{h}x{w}_b{bs}.{actual}"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(blob)
            manifest["programs"].append(
                {"kind": "embed", "h": h, "w": w, "b": bs, "file": name,
                 "mode": actual}
            )
    for t in buckets:
        fn, args = _audio_full_fn(pipeline, t)
        blob, actual = _export_one(fn, args, mode, platforms)
        name = f"audio_t{t}.{actual}"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        manifest["programs"].append(
            {"kind": "audio", "t": t, "file": name, "mode": actual}
        )
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


# ---------------------------------------------------------------------------
# Load / install
# ---------------------------------------------------------------------------


def _load_callable(path: str, mode: str):
    with open(path, "rb") as f:
        blob = f.read()
    if mode == "exec":
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = pickle.loads(blob)
        return se.deserialize_and_load(payload, in_tree, out_tree)
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return jax.jit(exported.call)


def load_pipeline_programs(pipeline, art_dir: str, strict: bool = False) -> int:
    """Install matching artifacts onto a live pipeline; returns how many
    programs were installed. Non-matching shapes/dtypes fall back to the
    pipeline's own jit programs transparently (``strict=True`` raises
    instead — proves the artifact path actually ran); a fingerprint or
    batch-size mismatch installs nothing (the artifact would compute
    different features than the live config promises)."""
    manifest_path = os.path.join(art_dir, _MANIFEST)
    if not os.path.exists(manifest_path):
        return 0
    with open(manifest_path) as f:
        manifest = json.load(f)
    if manifest.get("fingerprint") != _fingerprint(pipeline):
        return 0
    if manifest.get("batch_size") != pipeline.visual.batch_size:
        return 0

    embeds: Dict[Tuple[int, int, int], object] = {}
    audios: Dict[int, object] = {}
    for p in manifest["programs"]:
        path = os.path.join(art_dir, p["file"])
        if not os.path.exists(path):
            continue
        try:
            call = _load_callable(path, p["mode"])
        except Exception:  # noqa: BLE001 — artifact of a foreign backend
            continue
        if p["kind"] == "embed":
            # "b" absent in pre-tail-bucket manifests -> the full batch
            embeds[(p["h"], p["w"], p.get("b", manifest["batch_size"]))] = call
        elif p["kind"] == "audio":
            audios[p["t"]] = call
    n = len(embeds) + len(audios)
    if n == 0:
        return 0

    if embeds:
        frontend = pipeline.visual
        orig_embed = frontend._embed_packed

        def embed_packed(variables, buf, h, w):
            per = h * w + 2 * (h // 2) * (w // 2)
            b = buf.shape[0] // per if getattr(buf, "ndim", 1) == 1 else -1
            call = embeds.get((h, w, b))
            if call is not None and tuple(buf.shape) == (b * per,):
                return call(variables, jnp.asarray(buf, jnp.uint8))
            if strict:
                raise RuntimeError(
                    f"no embed artifact for planes {h}x{w} buf {buf.shape}"
                )
            return orig_embed(variables, buf, h, w)

        frontend._embed_packed = embed_packed

    if audios:
        afront = pipeline.audio
        orig_full = afront._full

        def full(params, wave):
            call = audios.get(int(wave.shape[0]))
            if call is not None and wave.dtype == jnp.int16:
                return call(params, jnp.asarray(wave))
            if strict:
                raise RuntimeError(
                    f"no audio artifact for wave bucket {wave.shape[0]} "
                    f"dtype {wave.dtype}"
                )
            return orig_full(params, wave)

        afront._full = full

    return n
