"""Audio front-end: log-mel / MFCC features + VGGish-style encoder."""

from avsum_tpu.audio.frontend import AudioFrontend, shot_audio_features
from avsum_tpu.audio.vggish import VGGish, vggish_log_mel_patches

__all__ = ["AudioFrontend", "shot_audio_features", "VGGish", "vggish_log_mel_patches"]
