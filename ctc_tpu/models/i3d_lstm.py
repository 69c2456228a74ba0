"""End-to-end pixels model: InceptionI3d clip features -> LSTM head logits.

The reference's full two-model pipeline in one flax module
(/root/reference/train.py:410-417: ``feat = base_model(input)`` then
``v_output = logits_model(feat, h, c)``), jitted as ONE XLA program so the
I3D convolutions, the scanned LSTM, and the CTC lattice fuse into a single
device computation — no per-model host round trips.

``freeze_backbone=True`` reproduces the reference's live behavior (the I3D
optimizer step is disabled at train.py:448-451): a ``stop_gradient`` after
the features means backward never traverses the convolutions at all — the
TPU-first version of "compute grads, then throw them away".
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ctc_tpu.models.i3d import InceptionI3d
from ctc_tpu.models.lstm import LSTMHead


class I3DLSTM(nn.Module):
    """``[B, T, stack, h, w, 3]`` clips -> ``[T, B, hidden]`` logits.

    ``feat_chunk > 0`` extracts features in sequential chunks of that many
    folded clips (``nn.scan`` with params broadcast), bounding conv
    activation memory to one chunk instead of the full ``B*T`` folded batch
    — a v5e holds B=10*T=10 at 224² in one shot but OOMs at B=32 (measured);
    chunking trades nothing but schedule freedom when the backbone is
    frozen (no grads, no BN updates ever traverse it). Requires
    ``freeze_backbone`` and ``feat_chunk | B*T``.
    """

    hidden: int = 33
    dropout_rate: float = 0.3
    freeze_backbone: bool = True
    i3d_dtype: Any = None  # conv compute dtype (e.g. jnp.bfloat16)
    # inter-layer activation dtype for the backbone (f32 default; bf16
    # halves conv activation HBM traffic — see probe_pixels_mfu_ab.py)
    i3d_act_dtype: Any = None
    bn_axis_name: str | None = None
    feat_chunk: int = 0

    @nn.compact
    def __call__(self, clips: jnp.ndarray, *, train: bool = False):
        import jax.numpy as _jnp

        i3d = InceptionI3d(
            dtype=self.i3d_dtype,
            act_dtype=(self.i3d_act_dtype or _jnp.float32),
            name="i3d",
        )
        if self.feat_chunk:
            if not self.freeze_backbone:
                raise ValueError(
                    "feat_chunk requires freeze_backbone=True (chunked "
                    "extraction never carries BN updates or gradients)"
                )
            b, t = clips.shape[:2]
            folded = clips.reshape((b * t,) + clips.shape[2:])
            if (b * t) % self.feat_chunk:
                raise ValueError(
                    f"feat_chunk={self.feat_chunk} must divide B*T={b * t}"
                )
            n = (b * t) // self.feat_chunk
            chunks = folded.reshape((n, self.feat_chunk) + folded.shape[1:])

            def body(mod, carry, chunk):
                # the 5-D chunk takes InceptionI3d's single-clip path, which
                # squeezes the inserted T axis -> [chunk, 1024]
                return carry, mod(chunk, train=False)

            scan = nn.transforms.scan(
                body,
                variable_broadcast=["params", "batch_stats"],
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )
            _, out = scan(i3d, None, chunks)  # [n, chunk, 1024]
            feats = out.reshape(b, t, -1)
        else:
            feats = i3d(
                clips, train=(train and not self.freeze_backbone)
            )  # [B, T, 1024]
        if self.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        # the head always runs f32 (bf16 backbone activations stop here —
        # the LSTM recurrence carry is f32 by contract)
        feats = jnp.transpose(feats, (1, 0, 2)).astype(jnp.float32)
        return LSTMHead(
            hidden=self.hidden,
            dropout_rate=self.dropout_rate,
            bn_axis_name=self.bn_axis_name,
            name="head",
        )(feats, train=train)
