"""Render a summary to actual media: selected segments -> <out>.y4m/.wav.

The reference stops at scores; its users had no way to produce the actual
summary video. Frames are copied segment-by-segment (native reader when
available), audio is sliced from the paired wav at the same timestamps.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from avsum_tpu.io.video import audio_path_for, open_video
from avsum_tpu.io.wav import read_wav, to_mono, write_wav
from avsum_tpu.io.y4m import write_y4m
from avsum_tpu.utils.logging import get_logger

log = get_logger("avsum.render")


def render_summary(
    video_path: str,
    segments: Sequence[Tuple[int, int]],
    out_stem: str,
    max_frames: Optional[int] = None,
) -> Tuple[str, Optional[str]]:
    """Write the summary video (and audio when paired) for ``segments``.

    Returns (video_out_path, audio_out_path_or_None).
    """
    reader = open_video(video_path)
    try:
        fps = reader.fps
        frame_idx = np.concatenate(
            [np.arange(int(a), int(b)) for a, b in segments]
        ) if len(segments) else np.zeros(0, np.int64)
        if max_frames is not None:
            frame_idx = frame_idx[:max_frames]
        if frame_idx.size == 0:
            raise ValueError("empty summary: nothing to render")
        frames = reader.read_frames(frame_idx)
    finally:
        reader.close()

    video_out = out_stem + ".y4m"
    write_y4m(video_out, frames, fps=fps)

    audio_out = None
    wav_path = audio_path_for(video_path)
    if wav_path is not None:
        samples, rate = read_wav(wav_path)
        mono = to_mono(samples)
        pieces = []
        for a, b in segments:
            s0 = int(a / fps * rate)
            s1 = min(int(b / fps * rate), len(mono))
            pieces.append(mono[s0:s1])
        if pieces:
            audio_out = out_stem + ".wav"
            write_wav(audio_out, np.concatenate(pieces), rate)
    log.info(
        "rendered %d frames (%.1fs) -> %s", len(frames), len(frames) / fps,
        video_out,
    )
    return video_out, audio_out
