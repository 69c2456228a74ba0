"""ctc_tpu — a TPU-native sequence-labeling framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch repo ``gotaku6629/CTC`` ("No Blank Connectionist Temporal
Classification" for human action prediction on Charades):

* Blank-free CTC lattice losses (``NoBlankCTC``-equivalent with softmax
  emissions; multi-label ``NoBlankBinaryCTC``-equivalent with per-step binary
  cross-entropy emissions), plus standard blank CTC and greedy/beam decoding.
* A scanned, fused-gate LSTM head consuming I3D clip features, and an I3D
  backbone in JAX.
* Charades CSV parsing / window-target construction, host-sharded loading.
* A training engine (optax optimizers, metrics, checkpointing, CSV/JSONL
  logging) and multi-chip data parallelism over a ``jax.sharding.Mesh``.

The lattice dynamic programs run either as pure-XLA ``lax.scan`` computations
or as Pallas TPU kernels with analytic gradients (``jax.custom_vjp``).
"""

__version__ = "0.1.0"

from ctc_tpu import losses, ops  # noqa: F401
