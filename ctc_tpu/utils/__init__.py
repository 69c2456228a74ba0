"""Infrastructure utilities: stdout tee, seeding, profiling helpers."""

from ctc_tpu.utils.tee import Tee
from ctc_tpu.utils.seed import seed_everything

__all__ = ["Tee", "seed_everything"]
