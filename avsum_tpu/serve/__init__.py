from avsum_tpu.serve.server import ServeConfig, SummarizeServer

__all__ = ["ServeConfig", "SummarizeServer"]
