"""Datasets, parsers, feature cache, splits, batching."""

from avsum_tpu.data.batching import VideoExample, pad_batch, batch_iterator

__all__ = ["VideoExample", "pad_batch", "batch_iterator"]
