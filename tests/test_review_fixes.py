"""Regression tests for the round-2 code-review findings."""

import json
import struct
from http.client import HTTPConnection

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# mp4: ipcm endianness (ISO/IEC 23003-5 pcmC box)
# ---------------------------------------------------------------------------


def _tone(n, f=440.0, sr=16000):
    return (0.4 * np.sin(2 * np.pi * f * np.arange(n) / sr)).astype(np.float32)


def _make_ipcm_mp4(path, samples, rate, little_endian, with_pcmc, v1=False):
    """Audio-only mp4 with an ipcm sample entry (optionally + pcmC)."""
    from avsum_tpu.io.mp4_mux import (
        _audio_trak,
        _box,
        _full,
        _quantize_pcm,
        _UNITY_MATRIX,
    )

    x = _quantize_pcm(samples)
    n, ch = x.shape
    pcm = x.astype("<i2" if little_endian else ">i2").tobytes()

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", pcm)
    # build a normal track then rewrite its stsd entry to ipcm (+ pcmC)
    trak = _audio_trak(
        1, n, ch, rate, len(ftyp) + 8, 4096,
        b"sowt" if little_endian else b"twos",
    )
    if with_pcmc:
        # spec-conformant pcmC: FullBox(version=0, flags=0) then payload
        # format_flags(1, bit0 = little-endian) + PCM_bit_depth(1)
        pcmc = _full(
            b"pcmC", 0, 0, bytes([1 if little_endian else 0, 16])
        )
        old_entry_prefix = struct.pack(">I", 36) + (
            b"sowt" if little_endian else b"twos"
        )
        # v1 (QuickTime) AudioSampleEntry carries 16 extra bytes of
        # samples/packet fields between the rate and any child boxes
        qt_extra = b"\x00" * 16 if v1 else b""
        new_entry_prefix = struct.pack(
            ">I", 36 + len(qt_extra) + len(pcmc)
        ) + b"ipcm"
        i = trak.index(old_entry_prefix)
        entry_rest = bytearray(trak[i + 8 : i + 36])
        if v1:
            struct.pack_into(">H", entry_rest, 8, 1)  # version field
        new_entry = new_entry_prefix + bytes(entry_rest) + qt_extra + pcmc
        grown = len(pcmc) + len(qt_extra)
        # grow every enclosing box size (trak, mdia, minf, stbl, stsd)
        out = bytearray(trak[:i] + new_entry + trak[i + 36 :])
        for marker in (b"trak", b"mdia", b"minf", b"stbl", b"stsd"):
            j = bytes(out).index(marker)
            size = struct.unpack_from(">I", out, j - 4)[0]
            struct.pack_into(">I", out, j - 4, size + grown)
        trak = bytes(out)
    else:
        i = trak.index(b"sowt" if little_endian else b"twos")
        trak = trak[:i] + b"ipcm" + trak[i + 4 :]
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, int(round(n / rate * 1000)))
        + struct.pack(">IH", 0x10000, 0x0100) + b"\x00" * 10
        + _UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    with open(path, "wb") as fh:
        fh.write(ftyp + mdat + _box(b"moov", mvhd + trak))


@pytest.mark.parametrize(
    "little,with_pcmc,v1",
    [
        (False, False, False),
        (False, True, False),
        (True, True, False),
        (True, True, True),
    ],
    ids=["default-BE", "pcmC-BE", "pcmC-LE", "pcmC-LE-v1entry"],
)
def test_ipcm_endianness(tmp_path, little, with_pcmc, v1):
    """ipcm defaults to big-endian; pcmC's LSB format_flags selects little."""
    from avsum_tpu.io.mp4 import extract_audio

    sr = 16000
    tone = _tone(sr)
    path = str(tmp_path / "a.mp4")
    _make_ipcm_mp4(path, tone, sr, little, with_pcmc, v1=v1)
    out, rate = extract_audio(path)
    assert rate == sr
    expected = np.round(np.clip(tone, -1, 1) * 32767) / 32768.0
    np.testing.assert_allclose(
        np.asarray(out, np.float32).reshape(-1), expected, atol=1e-4
    )


def test_video_track_missing_stsd_is_mp4error(tmp_path):
    """A video trak without stsd must yield Mp4Error-family, not TypeError."""
    from avsum_tpu.io.mp4 import Mp4Error, Mp4VideoReader
    from avsum_tpu.io.mp4_mux import write_mjpeg_mp4

    frames = np.zeros((3, 16, 16, 3), np.uint8)
    path = str(tmp_path / "v.mp4")
    write_mjpeg_mp4(path, frames, fps=8.0)
    data = bytearray(open(path, "rb").read())
    i = bytes(data).index(b"stsd")
    data[i : i + 4] = b"xxxx"  # corrupt the video stsd
    open(path, "wb").write(bytes(data))
    with pytest.raises(Mp4Error):
        Mp4VideoReader(path)


def test_tkhd_durations_use_movie_timescale(tmp_path):
    """tkhd/mvhd durations are movie-timescale (1000) units."""
    from avsum_tpu.io.mp4_mux import write_mjpeg_mp4

    t, fps, sr = 24, 8.0, 16000
    n_audio = sr // 2
    path = str(tmp_path / "v.mp4")
    write_mjpeg_mp4(
        path, np.zeros((t, 16, 16, 3), np.uint8), fps=fps,
        audio=_tone(n_audio), audio_rate=sr,
    )
    data = open(path, "rb").read()
    durations = []
    pos = 0
    while True:
        i = data.find(b"tkhd", pos)
        if i < 0:
            break
        # v0 tkhd: verflags(4) ctime(4) mtime(4) id(4) reserved(4) duration(4)
        durations.append(struct.unpack_from(">I", data, i + 24)[0])
        pos = i + 4
    assert durations == [
        int(round(t / fps * 1000)),
        int(round(n_audio / sr * 1000)),
    ]


def test_pcm_mp4_writer_roundtrips_via_shared_muxer(tmp_path):
    """synthetic.write_pcm_mp4 (now a delegate) still round-trips."""
    from avsum_tpu.io.mp4 import extract_audio
    from avsum_tpu.io.synthetic import write_pcm_mp4

    sr = 16000
    tone = _tone(sr, f=330.0)
    for codec in ("sowt", "twos"):
        path = str(tmp_path / f"{codec}.mp4")
        write_pcm_mp4(path, tone, sr, codec=codec)
        out, rate = extract_audio(path)
        assert rate == sr
        np.testing.assert_allclose(
            np.asarray(out, np.float32).reshape(-1),
            np.round(np.clip(tone, -1, 1) * 32767) / 32768.0,
            atol=1e-4,
        )


# ---------------------------------------------------------------------------
# serve: warmup failure must degrade, not wedge
# ---------------------------------------------------------------------------


def test_warmup_failure_degrades_not_wedges():
    from avsum_tpu.serve import ServeConfig, SummarizeServer
    from avsum_tpu.train.config import load_config

    cfg = load_config(
        overrides=["visual.backbone=tiny", "visual.dtype=float32"]
    )
    srv = SummarizeServer(cfg, ServeConfig(port=0, warmup=True))

    def boom(*a, **k):
        raise RuntimeError("synthetic warmup failure")

    srv.pipeline.summarize_begin = boom
    srv.start(block=False)
    try:
        srv._ready.wait(timeout=60)
        conn = HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request("GET", "/readyz")
        r = conn.getresponse()
        body = json.loads(r.read())
        assert r.status == 503 and body["status"] == "warmup_failed"
        conn.close()
        # requests still answer (with an error), they do NOT hang
        conn = HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request(
            "POST", "/v1/summarize", body=json.dumps({"path": "/nope.y4m"})
        )
        r = conn.getresponse()
        assert r.status == 404
        conn.close()
    finally:
        srv.stop()


def test_non_dict_json_body_is_400():
    from avsum_tpu.serve import ServeConfig, SummarizeServer
    from avsum_tpu.train.config import load_config

    cfg = load_config(
        overrides=["visual.backbone=tiny", "visual.dtype=float32"]
    )
    srv = SummarizeServer(cfg, ServeConfig(port=0, warmup=False))
    srv.start(block=False)
    try:
        srv._ready.wait(timeout=60)
        for body in ("[1, 2]", '"x"', "3"):
            conn = HTTPConnection("127.0.0.1", srv.port, timeout=30)
            conn.request("POST", "/v1/summarize", body=body)
            r = conn.getresponse()
            assert r.status == 400, body
            conn.close()
    finally:
        srv.stop()


def test_preprocess_default_extensions_include_mov():
    import inspect

    from avsum_tpu.pipeline import AVPipeline

    sig = inspect.signature(AVPipeline.preprocess_dataset)
    exts = sig.parameters["extensions"].default
    assert ".mov" in exts and ".m4v" in exts


# ---------------------------------------------------------------------------
# round-2 second review pass
# ---------------------------------------------------------------------------


def test_export_with_pallas_enabled_model():
    """Symbolic shot axis + flash-attention dispatch: the `s >= 512` gate
    must not be asked of a symbolic dimension (TPU export previously raised
    InconclusiveDimensionOperation; the XLA path is correct for export)."""
    import jax

    from avsum_tpu.models import make_model
    from avsum_tpu.serve.export import export_scorer, load_scorer
    from avsum_tpu.train.config import ModelConfig

    cfg = ModelConfig(hidden_dim=32, scorer_hidden=8, use_pallas=True)
    model = make_model(cfg)
    import jax.numpy as jnp

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, cfg.visual_dim)),
        jnp.zeros((1, 8, cfg.audio_dim)),
        jnp.ones((1, 8)),
    )["params"]
    blob = export_scorer(
        model, params, cfg.visual_dim, cfg.audio_dim, platforms=("cpu",)
    )
    fn = load_scorer(blob)
    out = np.asarray(fn(
        np.zeros((1, 6, cfg.visual_dim), np.float32),
        np.zeros((1, 6, cfg.audio_dim), np.float32),
        np.ones((1, 6), np.float32),
    ))
    assert out.shape == (1, 6) and np.isfinite(out).all()


def test_flax_model_without_params_falls_back_to_uniform(tmp_path):
    """summarize(path, module, None) must take the scoreless branch, not
    call the unbound module (CallCompactUnboundModuleError regression)."""
    import jax

    from avsum_tpu.io.synthetic import write_scene_video
    from avsum_tpu.models import make_model
    from avsum_tpu.pipeline import AVPipeline
    from avsum_tpu.train.config import ModelConfig, load_config

    stem = str(tmp_path / "c")
    write_scene_video(
        stem, n_scenes=2, seed=6, fps=8.0, height=64, width=96,
        scene_len_frames=(8, 12),
    )
    cfg = load_config(
        overrides=[
            "visual.backbone=tiny",
            "visual.dtype=float32",
            "audio.silence_fallback=true",
        ]
    )
    model = make_model(ModelConfig(hidden_dim=32, scorer_hidden=8))
    out = AVPipeline(cfg).summarize(stem + ".y4m", model, None)
    assert (np.asarray(out["scores"]) == 1.0).all()  # uniform fallback


def test_single_device_mesh_honors_mesh_device():
    """shard_batch/shard_batch_dict on a 1-device mesh place data on THE
    mesh's device, not the default device."""
    import jax
    from jax.sharding import Mesh

    from avsum_tpu.parallel.mesh import shard_batch, shard_replicated

    devices = jax.devices("cpu")
    assert len(devices) >= 2, "conftest provides 8 virtual devices"
    target = devices[3]
    mesh = Mesh(np.array([target]), ("data",))
    x = np.ones((2, 4), np.float32)
    for fn in (shard_batch, shard_replicated):
        placed = fn(x, mesh)
        assert list(placed.devices()) == [target], (fn.__name__, placed.devices())


def test_standalone_warmup_without_start():
    """warmup() on an unstarted server must run inline, not deadlock."""
    from avsum_tpu.serve import ServeConfig, SummarizeServer
    from avsum_tpu.train.config import load_config

    cfg = load_config(
        overrides=[
            "visual.backbone=tiny",
            "visual.dtype=float32",
            "audio.silence_fallback=true",
        ]
    )
    srv = SummarizeServer(cfg, ServeConfig(port=0, warmup=True))
    srv.warmup()  # no start(): previously enqueued into a dead queue
    assert srv._ready.is_set()
    assert srv._warmup_error is None


@pytest.mark.slow
def test_mp4_demuxer_fuzz_clean_errors(tmp_path):
    """Truncated/corrupt containers must raise the Mp4Error family only —
    never raw struct/Value/Index errors (per-item sweep isolation and the
    open_video fallback both dispatch on Mp4Error)."""
    from avsum_tpu.io.mp4 import Mp4Error, Mp4VideoReader, extract_audio
    from avsum_tpu.io.mp4_mux import write_mjpeg_mp4

    path = str(tmp_path / "v.mp4")
    write_mjpeg_mp4(
        path, np.zeros((4, 16, 16, 3), np.uint8), fps=8.0,
        audio=np.zeros(8000, np.float32), audio_rate=16000,
    )
    data = open(path, "rb").read()
    rng = np.random.default_rng(0)
    cases = []
    for f in (0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
        cases.append(data[: int(len(data) * f)])
    moov = data.find(b"moov")
    for _ in range(60):
        buf = bytearray(data)
        for _ in range(4):
            buf[rng.integers(moov, len(data))] = rng.integers(0, 256)
        cases.append(bytes(buf))
    bad = str(tmp_path / "bad.mp4")
    for i, case in enumerate(cases):
        open(bad, "wb").write(case)
        for fn in (Mp4VideoReader, extract_audio):
            try:
                r = fn(bad)
                if hasattr(r, "close"):
                    r.close()
            except Mp4Error:
                pass  # the only acceptable failure family
