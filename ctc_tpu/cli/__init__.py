"""Command-line entry points (the reference's ctc_exe.py / main.py layer)."""

from ctc_tpu.cli.main import main

__all__ = ["main"]
