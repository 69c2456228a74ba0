"""Inception-v1 I3D (Carreira & Zisserman) in Flax, TPU-native.

Architecture parity with /root/reference/models/i3d.py (Unit3D, TF-"same"
dynamic padding, 4-branch Inception modules, the 18-endpoint chain), with the
TPU-first differences:

* channels-last ``[B, t, h, w, c]`` layout (XLA/TPU preferred) with
  ``('NDHWC', 'DHWIO', 'NDHWC')`` convolutions;
* XLA ``padding='SAME'`` replaces the hand-rolled dynamic pad (identical
  formula; the zero-vs-(-inf) max-pool padding difference is immaterial
  because every pooled tensor is post-ReLU, hence non-negative);
* the temporal clip loop (i3d.py:349-359 runs T sequential CNN passes) is
  replaced by folding T into the batch axis — one big batched conv chain;
* BatchNorm eps 1e-3 / momentum 0.99 (== torch momentum 0.01).

``convert_torch_state_dict`` maps the reference's (Kinetics-pretrained)
checkpoints onto this module's params.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class Unit3D(nn.Module):
    """Conv3D + BatchNorm + ReLU with TF-same padding (reference i3d.py:71-143)."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: Callable | None = nn.relu
    dtype: Any = None  # conv compute dtype (bf16 on TPU); BN/params in f32
    # inter-layer activation dtype: f32 (default — parity with the mixed-
    # precision tests) or bf16 to halve activation HBM traffic between
    # layers (BN statistics/params stay f32 inside flax; see
    # probe_pixels_mfu_ab.py for the measured effect)
    act_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            self.features,
            tuple(self.kernel),
            strides=tuple(self.stride),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv3d",
        )(x)
        x = x.astype(self.act_dtype)
        if self.use_batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=(None if self.act_dtype == jnp.float32
                       else self.act_dtype),
                name="bn",
            )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def _max_pool_same(x, kernel, stride):
    """TF-same max pool (post-ReLU tensors, so zero-padding semantics hold)."""
    return nn.max_pool(
        x, tuple(kernel), strides=tuple(stride), padding="SAME"
    )


class InceptionModule(nn.Module):
    """4-branch Inception block (reference i3d.py:147-172)."""

    out_channels: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3b]
    dtype: Any = None
    act_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        oc = self.out_channels
        kw = dict(dtype=self.dtype, act_dtype=self.act_dtype)
        b0 = Unit3D(oc[0], (1, 1, 1), name="b0", **kw)(x, train=train)
        b1 = Unit3D(oc[1], (1, 1, 1), name="b1a", **kw)(x, train=train)
        b1 = Unit3D(oc[2], (3, 3, 3), name="b1b", **kw)(b1, train=train)
        b2 = Unit3D(oc[3], (1, 1, 1), name="b2a", **kw)(x, train=train)
        b2 = Unit3D(oc[4], (3, 3, 3), name="b2b", **kw)(b2, train=train)
        b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), name="b3b", **kw)(b3, train=train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# (endpoint name, builder spec) in chain order — reference i3d.py:191-210
_ENDPOINTS = (
    ("Conv3d_1a_7x7", ("unit", 64, (7, 7, 7), (2, 2, 2))),
    ("MaxPool3d_2a_3x3", ("pool", (1, 3, 3), (1, 2, 2))),
    ("Conv3d_2b_1x1", ("unit", 64, (1, 1, 1), (1, 1, 1))),
    ("Conv3d_2c_3x3", ("unit", 192, (3, 3, 3), (1, 1, 1))),
    ("MaxPool3d_3a_3x3", ("pool", (1, 3, 3), (1, 2, 2))),
    ("Mixed_3b", ("mixed", (64, 96, 128, 16, 32, 32))),
    ("Mixed_3c", ("mixed", (128, 128, 192, 32, 96, 64))),
    ("MaxPool3d_4a_3x3", ("pool", (3, 3, 3), (2, 2, 2))),
    ("Mixed_4b", ("mixed", (192, 96, 208, 16, 48, 64))),
    ("Mixed_4c", ("mixed", (160, 112, 224, 24, 64, 64))),
    ("Mixed_4d", ("mixed", (128, 128, 256, 24, 64, 64))),
    ("Mixed_4e", ("mixed", (112, 144, 288, 32, 64, 64))),
    ("Mixed_4f", ("mixed", (256, 160, 320, 32, 128, 128))),
    ("MaxPool3d_5a_2x2", ("pool", (2, 2, 2), (2, 2, 2))),
    ("Mixed_5b", ("mixed", (256, 160, 320, 32, 128, 128))),
    ("Mixed_5c", ("mixed", (384, 192, 384, 48, 128, 128))),
)

FEATURE_DIM = 1024


class InceptionI3d(nn.Module):
    """The I3D backbone; ``extract_features`` -> [B, 1024] per clip.

    ``num_classes`` only affects the optional logits head (``with_logits``),
    mirroring ``replace_logits`` (reference i3d.py:330-338) — construct with a
    different count to retarget.
    """

    num_classes: int = 400
    dropout_rate: float = 0.5
    final_endpoint: str = "Mixed_5c"
    dtype: Any = None  # conv compute dtype (e.g. jnp.bfloat16)
    act_dtype: Any = jnp.float32  # inter-layer activation dtype (see Unit3D)

    @nn.compact
    def __call__(
        self,
        clips: jnp.ndarray,
        *,
        train: bool = False,
        with_logits: bool = False,
    ):
        """Args:
          clips: ``[B, T, stack, h, w, 3]`` frame stacks (channels last) or
            ``[B, stack, h, w, 3]`` for a single clip per sample.

        Returns ``[B, T, 1024]`` features (or ``([B, T, classes], feats)``
        with ``with_logits``).
        """
        single = clips.ndim == 5
        if single:
            clips = clips[:, None]
        b, t = clips.shape[:2]
        x = clips.reshape((b * t,) + clips.shape[2:])  # fold T into batch

        for name, spec in _ENDPOINTS:
            if spec[0] == "unit":
                _, feats, kernel, stride = spec
                x = Unit3D(feats, kernel, stride, dtype=self.dtype,
                           act_dtype=self.act_dtype, name=name)(x,
                                                                train=train)
            elif spec[0] == "pool":
                _, kernel, stride = spec
                x = _max_pool_same(x, kernel, stride)
            else:
                x = InceptionModule(spec[1], dtype=self.dtype,
                                    act_dtype=self.act_dtype, name=name)(
                    x, train=train
                )
            if name == self.final_endpoint:
                break

        # avg_pool kernel (2,7,7) stride 1 VALID (reference i3d.py:316)
        pooled = nn.avg_pool(x, (2, 7, 7), strides=(1, 1, 1), padding="VALID")
        feats = jnp.mean(pooled, axis=(1, 2, 3))  # [B*T, 1024]
        feats = feats.reshape(b, t, -1)
        if single:
            feats = feats[:, 0]
        if not with_logits:
            return feats

        logits_in = nn.Dropout(self.dropout_rate, deterministic=not train)(
            pooled
        )
        logits = Unit3D(
            self.num_classes,
            (1, 1, 1),
            use_batch_norm=False,
            use_bias=True,
            activation=None,
            name="logits",
        )(logits_in, train=train)
        logits = jnp.mean(logits, axis=(1, 2, 3)).reshape(b, t, -1)
        if single:
            logits = logits[:, 0]
        return logits, feats


def convert_torch_state_dict(state_dict) -> dict:
    """Map the reference PyTorch I3D state_dict onto flax variables.

    Returns ``{'params': ..., 'batch_stats': ...}`` matching
    :class:`InceptionI3d`.  Conv weights ``[out, in, kt, kh, kw]`` transpose
    to DHWIO; BatchNorm weight/bias -> scale/bias, running stats ->
    batch_stats.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = jnp.asarray(value)

    for key, tensor in state_dict.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = key.split(".")
        # e.g. Mixed_3b.b1b.conv3d.weight / Conv3d_1a_7x7.bn.running_mean
        *module_path, leaf_owner, leaf = parts
        path = tuple(module_path) + (leaf_owner,)
        if leaf_owner == "conv3d":
            if leaf == "weight":
                put(params, path + ("kernel",), arr.transpose(2, 3, 4, 1, 0))
            else:
                put(params, path + ("bias",), arr)
        elif leaf_owner == "bn":
            if leaf == "weight":
                put(params, path + ("scale",), arr)
            elif leaf == "bias":
                put(params, path + ("bias",), arr)
            elif leaf == "running_mean":
                put(stats, path + ("mean",), arr)
            elif leaf == "running_var":
                put(stats, path + ("var",), arr)
            # num_batches_tracked dropped
    return {"params": params, "batch_stats": stats}
