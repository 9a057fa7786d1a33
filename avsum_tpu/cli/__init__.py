"""Command-line interface: ``python -m avsum_tpu.cli <command>``."""

from avsum_tpu.cli.main import main

__all__ = ["main"]
