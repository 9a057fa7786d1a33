"""Media I/O.

The reference's L1 substrate (cv2 decode, pydub/ffmpeg audio extraction,
torchaudio load — SURVEY.md §1) rebuilt without external binaries:

- :mod:`avsum_tpu.io.wav` — pure-NumPy WAV read/write + resample/downmix
  (replaces pydub's ffmpeg subprocess, extractors.py:364-386)
- :mod:`avsum_tpu.io.y4m` — YUV4MPEG2 uncompressed video read/write
  (replaces cv2.VideoCapture for the formats this machine can decode)
- :mod:`avsum_tpu.io.video` — VideoReader abstraction + native C++ fast
  path when the avsumio shared library is built
- :mod:`avsum_tpu.io.synthetic` — ffmpeg-colorbars-equivalent test media
"""

from avsum_tpu.io.video import VideoReader, open_video
from avsum_tpu.io.wav import read_wav, resample, resample_linear, to_mono, write_wav
from avsum_tpu.io.y4m import Y4MReader, write_y4m

__all__ = [
    "read_wav",
    "write_wav",
    "to_mono",
    "resample",
    "resample_linear",
    "Y4MReader",
    "write_y4m",
    "VideoReader",
    "open_video",
]
