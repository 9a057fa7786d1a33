from avsum_tpu.serve.export import export_scorer, load_scorer
from avsum_tpu.serve.server import ServeConfig, SummarizeServer

__all__ = ["ServeConfig", "SummarizeServer", "export_scorer", "load_scorer"]
