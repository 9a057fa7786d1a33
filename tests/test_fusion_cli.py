"""Cross-modal fusion variant + CLI batch summarize."""

import json
import os

import jax
import numpy as np
import pytest

from avsum_tpu.models import make_model
from avsum_tpu.train.config import ModelConfig


@pytest.mark.parametrize("fusion", ["self", "cross"])
def test_fusion_variants_forward(fusion):
    cfg = ModelConfig(
        visual_dim=32, audio_dim=16, hidden_dim=32, scorer_hidden=8,
        temporal_encoder="tcn", fusion=fusion,
    )
    model = make_model(cfg)
    rng = jax.random.PRNGKey(0)
    visual = jax.random.normal(rng, (2, 12, 32))
    audio = jax.random.normal(jax.random.fold_in(rng, 1), (2, 12, 16))
    mask = np.ones((2, 12), np.float32)
    mask[1, 8:] = 0.0
    params = model.init(rng, visual, audio, mask)["params"]
    out = model.apply({"params": params}, visual, audio, mask)
    assert out.shape == (2, 12)
    assert np.all(np.asarray(out)[1, 8:] == 0.0)
    if fusion == "cross":
        assert "v_attends_a" in params and "a_attends_v" in params


def test_cross_fusion_padding_invariance():
    cfg = ModelConfig(
        visual_dim=16, audio_dim=8, hidden_dim=16, scorer_hidden=4,
        temporal_encoder="tcn", fusion="cross",
    )
    model = make_model(cfg)
    rng = jax.random.PRNGKey(1)
    visual = jax.random.normal(rng, (1, 6, 16))
    audio = jax.random.normal(jax.random.fold_in(rng, 1), (1, 6, 8))
    m6 = np.ones((1, 6), np.float32)
    params = model.init(rng, visual, audio, m6)["params"]
    ref = model.apply({"params": params}, visual, audio, m6)
    vp = np.pad(np.asarray(visual), ((0, 0), (0, 3), (0, 0)), constant_values=5.0)
    ap = np.pad(np.asarray(audio), ((0, 0), (0, 3), (0, 0)), constant_values=-2.0)
    mp = np.pad(m6, ((0, 0), (0, 3)))
    out = model.apply({"params": params}, vp, ap, mp)
    np.testing.assert_allclose(
        np.asarray(out)[:, :6], np.asarray(ref), atol=2e-5
    )


@pytest.mark.slow
def test_cli_batch_summarize(tmp_path):
    from avsum_tpu.cli.main import main
    from avsum_tpu.io.synthetic import write_scene_video

    vdir = tmp_path / "vids"
    vdir.mkdir()
    for i in range(2):
        write_scene_video(str(vdir / f"b{i}"), n_scenes=2, seed=80 + i,
                          height=32, width=32)
    (vdir / "junk.txt").write_text("ignore me")
    out_dir = str(tmp_path / "sums")
    rc = main([
        "summarize", str(vdir), "--output", out_dir,
        "--set", "visual.backbone=tiny",
    ])
    assert rc == 0
    files = sorted(os.listdir(out_dir))
    assert files == ["b0.json", "b1.json"]
    data = json.load(open(os.path.join(out_dir, "b0.json")))
    assert data["segments"] and data["n_frames"] > 0


@pytest.mark.slow
def test_cli_summarize_render(tmp_path):
    from avsum_tpu.cli.main import main
    from avsum_tpu.io.synthetic import write_scene_video
    from avsum_tpu.io.y4m import Y4MReader
    from avsum_tpu.io.wav import read_wav

    stem = str(tmp_path / "r")
    write_scene_video(stem, n_scenes=3, seed=90, height=32, width=32)
    out_stem = str(tmp_path / "summary")
    rc = main([
        "summarize", stem + ".y4m", "--render", out_stem,
        "--output", str(tmp_path / "s.json"),
        "--set", "visual.backbone=tiny",
    ])
    assert rc == 0
    with Y4MReader(out_stem + ".y4m") as r:
        n = r.n_frames
        assert n > 0
        frame = r.read_frame(0)
        assert frame.shape == (32, 32, 3)
    samples, rate = read_wav(out_stem + ".wav")
    assert rate == 16000
    # audio length matches the rendered frames' duration (within a frame)
    assert abs(len(samples) / rate - n / 30.0) < 0.2


@pytest.mark.slow
def test_cli_summarize_render_mp4(tmp_path):
    """--render out.mp4 writes one shareable container: MJPEG video plus
    an AAC track (bundled encoder) or a PCM track (fallback)."""
    from avsum_tpu.cli.main import main
    from avsum_tpu.io.ffaudio import aac_encode_available
    from avsum_tpu.io.mp4 import extract_audio
    from avsum_tpu.io.synthetic import write_scene_video
    from avsum_tpu.io.video import open_video

    stem = str(tmp_path / "r")
    write_scene_video(stem, n_scenes=3, seed=91, height=32, width=32)
    out = str(tmp_path / "summary.mp4")
    rc = main([
        "summarize", stem + ".y4m", "--render", out,
        "--set", "visual.backbone=tiny",
    ])
    assert rc == 0 and os.path.exists(out)
    reader = open_video(out)
    try:
        n = reader.n_frames
        assert n > 0
        assert reader.read_frame(0).shape == (32, 32, 3)
        fps = reader.fps
    finally:
        reader.close()
    if aac_encode_available():
        from avsum_tpu.io.ffaudio import decode_audio

        samples, rate = decode_audio(out)
    else:
        samples, rate = extract_audio(out)
    assert abs(len(samples) / rate - n / fps) < 0.3
