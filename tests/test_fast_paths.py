"""Fast-path parity: native content scores, YUV device conversion,
aggressive downscale cut recovery, numpy knapsack vs jit DP."""

import numpy as np
import pytest

from avsum_tpu.io.native import NativeY4MReader, native_available
from avsum_tpu.io.synthetic import make_scene_video, write_scene_video
from avsum_tpu.io.y4m import Y4MReader
from avsum_tpu.summary.knapsack import knapsack_select, knapsack_select_np
from avsum_tpu.temporal.shots import (
    boundaries_from_cuts,
    content_scores,
    cuts_from_scores,
    detect_shots,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="libavsumio.so not built"
)


@needs_native
def test_native_content_scores_same_cuts_as_device(tmp_path):
    import jax.numpy as jnp

    stem = str(tmp_path / "v")
    write_scene_video(stem, n_scenes=4, seed=60, height=48, width=64)
    nat = NativeY4MReader(stem + ".y4m")
    s_native = nat.content_scores(scale=1)
    with Y4MReader(stem + ".y4m") as py:
        frames = py.read_frames(range(py.n_frames))
    s_dev = np.asarray(content_scores(jnp.asarray(frames)))
    assert cuts_from_scores(s_native) == cuts_from_scores(s_dev)
    assert np.corrcoef(s_native, s_dev)[0, 1] > 0.99


@needs_native
def test_downscaled_detection_scale_invariant(tmp_path):
    """The auto-downscale policy rests on content scores being subsample-
    invariant: cuts at scale 2/4 must match full-resolution cuts exactly.
    (Ground-truth recovery itself is covered in test_shots.py.)"""
    stem = str(tmp_path / "d")
    write_scene_video(stem, n_scenes=5, seed=61, height=96, width=128)
    nat = NativeY4MReader(stem + ".y4m")
    ref = cuts_from_scores(nat.content_scores(scale=1))
    for scale in (2, 4):
        assert cuts_from_scores(nat.content_scores(scale=scale)) == ref


@needs_native
def test_yuv_planes_roundtrip_to_rgb(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from avsum_tpu.ops.color import yuv420_to_rgb_device

    stem = str(tmp_path / "y")
    write_scene_video(stem, n_scenes=2, seed=62, height=48, width=64)
    nat = NativeY4MReader(stem + ".y4m")
    idx = [0, 3, 7]
    rgb_native = nat.read_frames(idx).astype(np.float32)
    y, u, v = nat.read_yuv420(idx)
    r, g, b = yuv420_to_rgb_device(y, u, v)
    rgb_dev = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    # float device conversion vs fixed-point C++: small rounding differences
    assert np.abs(rgb_dev - rgb_native).max() <= 2.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_knapsack_np_matches_jit(seed):
    rng = np.random.default_rng(seed)
    n = 24
    values = rng.random(n).astype(np.float32) * 5
    weights = rng.integers(1, 40, n)
    capacity = int(weights.sum() * 0.3)
    sel_np = knapsack_select_np(values, weights, capacity)
    sel_jit = np.asarray(
        knapsack_select(values, weights.astype(np.int32), capacity)
    )
    assert values[sel_np].sum() == pytest.approx(values[sel_jit].sum(), rel=1e-5)
    assert weights[sel_np].sum() <= capacity


def test_knapsack_np_respects_mask_and_oversize():
    values = np.array([10.0, 1.0, 5.0])
    weights = np.array([100, 2, 3])  # item 0 exceeds capacity entirely
    mask = np.array([True, True, False])
    sel = knapsack_select_np(values, weights, 10, mask)
    assert list(sel) == [False, True, False]


def test_detect_shots_device_path_still_works():
    video, _, scenes = make_scene_video(n_scenes=3, seed=63, height=32, width=48)
    bounds = detect_shots(video)
    assert bounds[-1][1] == video.shape[0]
    assert 2 <= len(bounds) <= 5


def test_pool_on_device_matches_host_pooling():
    """Device segment pooling == host np.add.at pooling (it replaced the
    host path in the overlapped pipeline)."""
    import jax.numpy as jnp

    from avsum_tpu.train.config import VisualFeatConfig
    from avsum_tpu.vision.backbone import TinyBackbone, VisualFrontend

    fe = VisualFrontend(
        VisualFeatConfig(backbone="tiny"), model=TinyBackbone(64), batch_size=8
    )
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (20, 32, 32, 3), dtype=np.uint8)
    feats_host = fe.frame_features(frames)

    # reconstruct the pending list the dispatcher would produce
    pending = []
    for i in range(0, 20, 8):
        chunk = frames[i : i + 8]
        if chunk.shape[0] < 8:
            chunk = np.concatenate(
                [chunk, np.zeros((8 - chunk.shape[0], 32, 32, 3), np.uint8)]
            )
        pending.append(fe._embed(fe.variables, jnp.asarray(chunk)))

    shot_ids = np.array([0] * 7 + [1] * 5 + [2] * 8)
    keep = np.ones(20, bool)
    keep[10:12] = False  # capped-out frames
    pooled, counts = fe.pool_on_device(pending, 20, shot_ids, keep, 3)

    expect = np.zeros((3, 64), np.float32)
    cnt = np.zeros(3, np.float32)
    np.add.at(expect, shot_ids[keep], feats_host[keep])
    np.add.at(cnt, shot_ids[keep], 1.0)
    expect /= np.maximum(cnt, 1.0)[:, None]
    np.testing.assert_allclose(pooled, expect, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(counts, cnt, atol=1e-6)


def test_native_resized_yuv_read_matches_bilinear(tmp_path):
    """Host-side pre-resize (ship_size): the C++ 2-tap bilinear (half-pixel
    centers, cv2.INTER_LINEAR semantics — what the reference's resize used)
    must match a numpy reference within fixed-point rounding."""
    from avsum_tpu.io.native import NativeY4MReader, native_available
    from avsum_tpu.io.synthetic import make_scene_video
    from avsum_tpu.io.y4m import write_y4m

    if not native_available():
        pytest.skip("native library not built")

    def bilinear(plane, dh, dw):
        sh, sw = plane.shape
        sy = np.clip((np.arange(dh) + 0.5) * sh / dh - 0.5, 0, None)
        sx = np.clip((np.arange(dw) + 0.5) * sw / dw - 0.5, 0, None)
        y0 = np.minimum(sy.astype(int), sh - 1); y1 = np.minimum(y0 + 1, sh - 1)
        x0 = np.minimum(sx.astype(int), sw - 1); x1 = np.minimum(x0 + 1, sw - 1)
        wy = (sy - y0)[:, None]; wx = (sx - x0)[None, :]
        p = plane.astype(np.float32)
        top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
        bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
        return top * (1 - wy) + bot * wy

    video, _, _ = make_scene_video(n_scenes=2, seed=1, height=90, width=160)
    path = str(tmp_path / "r.y4m")
    write_y4m(path, video[:6], fps=30.0)
    r = NativeY4MReader(path)
    y, u, v = r.read_yuv420_resized([0, 3], 64, 48)
    assert y.shape == (2, 48, 64) and u.shape == (2, 24, 32)
    yf, uf, vf = r.read_yuv420([0, 3])
    for got, full, (dh, dw) in [(y, yf, (48, 64)), (u, uf, (24, 32)), (v, vf, (24, 32))]:
        for i in range(2):
            ref = bilinear(full[i], dh, dw)
            assert np.abs(got[i].astype(np.float32) - ref).max() <= 1.5
    r.close()


def test_refined_scores_cut_exact(tmp_path):
    """Hierarchical two-pass detection returns the SAME cuts as a full
    fine-scale pass (the coarse pass only skips provably sub-threshold
    frames)."""
    from avsum_tpu.io.native import NativeY4MReader, native_available
    from avsum_tpu.io.synthetic import make_scene_video
    from avsum_tpu.io.y4m import write_y4m
    from avsum_tpu.temporal.shots import cuts_from_scores, refined_content_scores

    if not native_available():
        pytest.skip("native library not built")

    video, _, scenes = make_scene_video(
        n_scenes=6, seed=11, height=144, width=256, scene_len_frames=(24, 60)
    )
    path = str(tmp_path / "h.y4m")
    write_y4m(path, video, fps=30.0)
    r = NativeY4MReader(path)
    fine = np.asarray(r.content_scores(scale=1))
    hybrid = refined_content_scores(r, fine_scale=1, threshold=27.0)
    cuts_fine = list(cuts_from_scores(fine, 27.0, 15))
    cuts_hybrid = list(cuts_from_scores(hybrid, 27.0, 15))
    assert cuts_fine == cuts_hybrid and len(cuts_fine) >= 4
    # frames that were fine-rescored match the fine pass exactly
    refreshed = np.abs(hybrid - fine) < 1e-5
    assert refreshed[np.asarray(fine) > 27.0].all()
    r.close()


def test_device_resident_summarize_matches_classic(tmp_path):
    """The device-resident scoring path (pooled features never leave the
    chip, _finish_summary_fast) must produce the same summary as the
    materializing path for the same model/params."""
    import jax

    from avsum_tpu.models import make_model
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import load_config

    if not native_available():
        pytest.skip("native library not built")

    cfg = load_config(overrides=["visual.backbone=tiny"])
    stem = str(tmp_path / "v")
    write_scene_video(stem, n_scenes=4, seed=23, height=48, width=64)

    p = AVPipeline(cfg)
    model = make_model(cfg.model)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    params = model.init(
        rng,
        jnp.zeros((1, 8, cfg.model.visual_dim)),
        jnp.zeros((1, 8, cfg.model.audio_dim)),
        jnp.ones((1, 8)),
    )["params"]

    fast = p.summarize(stem + ".y4m", model, params)
    # classic materializing road for the identical inputs
    classic = p._score_summary(
        p.process_video(stem + ".y4m"), model, params, None
    )
    assert np.array_equal(fast["boundaries"], classic["boundaries"])
    np.testing.assert_allclose(
        fast["scores"], classic["scores"], rtol=1e-4, atol=1e-5
    )
    assert np.array_equal(fast["segments"], classic["segments"])
    assert np.array_equal(fast["selected"], classic["selected"])


def test_packed_read_matches_triple(tmp_path):
    """read_yuv420_packed writes the exact (y,u,v) planes of the triple
    read into the single-transfer layout, with a zeroed pad tail."""
    from avsum_tpu.io.synthetic import make_scene_video
    from avsum_tpu.io.y4m import write_y4m

    if not native_available():
        pytest.skip("native library not built")
    video, _, _ = make_scene_video(
        n_scenes=3, seed=31, height=64, width=96, scene_len_frames=(8, 12)
    )
    path = str(tmp_path / "p.y4m")
    write_y4m(path, video, fps=30.0)
    r = NativeY4MReader(path)
    try:
        idx = np.arange(0, r.n_frames, 3, dtype=np.int64)[:5]
        n, cap, w, h = len(idx), len(idx) + 3, 32, 32
        y, u, v = r.read_yuv420_resized(idx, w, h)
        buf = r.read_yuv420_packed(idx, w, h, cap)
        oy, oc = w * h, (w // 2) * (h // 2)
        assert buf.shape == (cap * (oy + 2 * oc),)
        assert np.array_equal(buf[: n * oy].reshape(n, h, w), y)
        u_sec = buf[cap * oy : cap * oy + n * oc].reshape(n, h // 2, w // 2)
        v_sec = buf[cap * (oy + oc) : cap * (oy + oc) + n * oc].reshape(
            n, h // 2, w // 2)
        assert np.array_equal(u_sec, u) and np.array_equal(v_sec, v)
        # pad tails are zero
        assert not buf[n * oy : cap * oy].any()
        assert not buf[cap * oy + n * oc : cap * (oy + oc)].any()
        assert not buf[cap * (oy + oc) + n * oc :].any()
    finally:
        r.close()


def test_refined_scores_small_width_clamps_coarse(tmp_path):
    """The 9x-coarse prescreen clamps back (9 -> 6 -> 3) on narrow video
    so the coarse raster stays >= ~24 px wide, and the cut contract holds
    there too (round 5: coarse_mult default moved 3 -> 9)."""
    from avsum_tpu.io.native import NativeY4MReader, native_available
    from avsum_tpu.io.synthetic import make_scene_video
    from avsum_tpu.io.y4m import write_y4m
    from avsum_tpu.temporal.shots import cuts_from_scores, refined_content_scores

    if not native_available():
        pytest.skip("native library not built")

    # width 128 at fine_scale=1: 128//9=14 < 24 -> clamp to mult 3 (42 px)
    video, _, _ = make_scene_video(
        n_scenes=4, seed=5, height=72, width=128, scene_len_frames=(20, 40)
    )
    path = str(tmp_path / "narrow.y4m")
    write_y4m(path, video, fps=30.0)
    r = NativeY4MReader(path)
    fine = np.asarray(r.content_scores(scale=1))
    hybrid = refined_content_scores(r, fine_scale=1, threshold=27.0)
    assert list(cuts_from_scores(hybrid, 27.0, 10)) == list(
        cuts_from_scores(fine, 27.0, 10)
    )
    # sub-threshold frames carry scores from a raster no coarser than
    # scale 6 (mult clamped below 9): a scale-9 pass would produce
    # different values there
    s6 = np.asarray(r.content_scores(scale=6))
    s3 = np.asarray(r.content_scores(scale=3))
    low = (hybrid < 27.0 - 8.0) & (np.arange(len(hybrid)) > 0)
    match3 = np.abs(hybrid[low] - s3[low]).max() < 1e-5
    match6 = np.abs(hybrid[low] - s6[low]).max() < 1e-5
    assert match3 or match6
    r.close()
