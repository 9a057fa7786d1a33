"""Synthetic media generation — the ffmpeg-colorbars-and-tone substitute
for pipeline integration tests and benchmarks (SURVEY.md §4 item 4).

Videos are sequences of distinctly-colored "scenes" (with per-frame noise
and drift so content is non-degenerate) plus matching multi-tone audio
whose tone changes at every scene cut — so shot detection, audio features
and alignment all have real structure to find.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from avsum_tpu.io.wav import write_wav
from avsum_tpu.io.y4m import write_y4m


def make_scene_video(
    n_scenes: int = 6,
    scene_len_frames: Tuple[int, int] = (24, 90),
    height: int = 144,
    width: int = 192,
    fps: float = 30.0,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, List[Tuple[int, int]]]:
    """-> (frames [T,H,W,3] uint8, audio [T_samples] float32 @16k, scenes)."""
    rng = np.random.default_rng(seed)
    lengths = rng.integers(scene_len_frames[0], scene_len_frames[1] + 1, n_scenes)
    frames = []
    scene_bounds = []
    t0 = 0
    base_colors = rng.integers(0, 256, (n_scenes, 3))
    # ensure consecutive scenes differ strongly (drives the content detector)
    for i in range(1, n_scenes):
        while np.abs(base_colors[i] - base_colors[i - 1]).mean() < 80:
            base_colors[i] = rng.integers(0, 256, 3)

    yy, xx = np.mgrid[0:height, 0:width]
    gradient = ((yy / height + xx / width) / 2.0)[..., None]

    for i, length in enumerate(lengths):
        color = base_colors[i][None, None, :]
        for f in range(length):
            drift = 10.0 * np.sin(2 * np.pi * f / max(length, 1))
            img = color * (0.6 + 0.4 * gradient) + drift
            img = img + rng.normal(0, 4.0, (height, width, 3))
            frames.append(np.clip(img, 0, 255).astype(np.uint8))
        scene_bounds.append((t0, t0 + int(length)))
        t0 += int(length)

    video = np.stack(frames)
    total_frames = video.shape[0]

    sr = 16000
    n_samples = int(total_frames / fps * sr)
    audio = np.zeros(n_samples, np.float32)
    tones = 220.0 * (2.0 ** rng.integers(0, 12, n_scenes).astype(np.float64) ** 0.5)
    for i, (start_f, end_f) in enumerate(scene_bounds):
        s0 = int(start_f / fps * sr)
        s1 = min(int(end_f / fps * sr), n_samples)
        t = np.arange(s1 - s0) / sr
        audio[s0:s1] = 0.4 * np.sin(2 * np.pi * tones[i] * t) + 0.05 * rng.standard_normal(s1 - s0)
    return video, audio.astype(np.float32), scene_bounds


def write_scene_video(
    stem: str,
    n_scenes: int = 6,
    seed: int = 0,
    fps: float = 30.0,
    height: int = 144,
    width: int = 192,
    scene_len_frames: Tuple[int, int] = (24, 90),
) -> List[Tuple[int, int]]:
    """Write <stem>.y4m + <stem>.wav; returns ground-truth scene bounds."""
    video, audio, scenes = make_scene_video(
        n_scenes=n_scenes,
        seed=seed,
        fps=fps,
        height=height,
        width=width,
        scene_len_frames=scene_len_frames,
    )
    write_y4m(stem + ".y4m", video, fps=fps)
    write_wav(stem + ".wav", audio, 16000)
    return scenes


def write_pcm_mp4(
    path: str,
    samples: np.ndarray,
    rate: int = 16000,
    chunk_frames: int = 4096,
    codec: str = "sowt",
) -> None:
    """Write an audio-only ISO-BMFF (.mp4/.mov) with an uncompressed PCM
    track — the test/synthesis counterpart of :mod:`avsum_tpu.io.mp4`'s
    demuxer (in-container audio like the reference's mp4s carried,
    extractors.py:364-386, but PCM so it is decodable without codecs).

    ``samples``: [T] or [T, C] float32 in [-1, 1] (int16-quantized) or
    int16. ``codec``: 'sowt' (LE int16) or 'twos' (BE int16).
    """
    import struct

    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    if x.dtype != np.int16:
        x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
        x = (x * 32767.0).astype(np.int16)
    n, ch = x.shape
    frame_bytes = 2 * ch
    pcm = x.astype("<i2" if codec == "sowt" else ">i2").tobytes()

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    def full(btype: bytes, ver: int, flags: int, payload: bytes) -> bytes:
        return box(btype, struct.pack(">I", (ver << 24) | flags) + payload)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_header_at = len(ftyp)
    mdat = box(b"mdat", pcm)
    data_start = mdat_header_at + 8  # absolute offset of the first chunk

    n_chunks = max(1, -(-n // chunk_frames))
    chunk_offsets = [data_start + i * chunk_frames * frame_bytes
                     for i in range(n_chunks)]
    last = n - (n_chunks - 1) * chunk_frames

    # sample tables: one "sample" = one PCM frame of all channels
    stsd_entry = (
        struct.pack(">I", 36) + codec.encode()
        + b"\x00" * 6 + struct.pack(">H", 1)   # reserved + data_ref_index
        + struct.pack(">HH", 0, 0) + b"\x00" * 4  # version/revision/vendor
        + struct.pack(">HH", ch, 16)           # channels, bits
        + struct.pack(">HH", 0, 0)             # predefined, reserved
        + struct.pack(">I", rate << 16)        # 16.16 fixed rate
    )
    stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc_entries = [(1, chunk_frames, 1)]
    if last != chunk_frames and n_chunks > 1:
        stsc_entries.append((n_chunks, last, 1))
    elif n_chunks == 1:
        stsc_entries = [(1, n, 1)]
    stsc = full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = full(b"stsz", 0, 0, struct.pack(">II", frame_bytes, n))
    stco = full(
        b"stco", 0, 0,
        struct.pack(">I", n_chunks)
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = full(b"url ", 0, 1, b"")
    dinf = box(b"dinf", full(b"dref", 0, 0, struct.pack(">I", 1) + url))
    smhd = full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    minf = box(b"minf", smhd + dinf + stbl)
    hdlr = full(b"hdlr", 0, 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"SoundHandler\x00")
    mdhd = full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, rate, n, 0x55C4, 0))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", n)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 0, 0),
    )
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, rate, n)
        + struct.pack(">IH", 0x10000, 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = box(b"moov", mvhd + trak)

    with open(path, "wb") as fh:
        fh.write(ftyp + mdat + moov)
