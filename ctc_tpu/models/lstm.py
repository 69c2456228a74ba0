"""LSTM head over I3D clip features — the TPU-native equivalent of the
reference's per-timestep python loop (/root/reference/LSTM.py).

Design (vs the reference):

* The 1024->v_class projection + BatchNorm + ReLU + Dropout ("BasicModule",
  LSTM.py:8-18) runs over ALL timesteps in one batched MXU matmul instead of
  T separate calls.  BatchNorm keeps the reference's per-timestep batch
  statistics (torch BatchNorm1d called once per t normalizes each t over the
  batch) — that is just a reduction over the batch axis of ``[T, B, F]``.
* The recurrence is a ``lax.scan`` over a fused LSTM cell: one
  ``[in+hidden -> 4*hidden]`` gate projection per step, with the
  input-to-gates half precomputed for all T in a single matmul
  (SURVEY.md §2.4's cuDNN-LSTMCell replacement).

Gate order follows torch.nn.LSTMCell (i, f, g, o) so reference checkpoints
convert by simple concatenation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class TemporalBatchNorm(nn.Module):
    """BatchNorm over the batch axis of ``[T, B, F]``, per timestep.

    Matches torch.nn.BatchNorm1d applied independently at every t
    (reference LSTM.py:48 inside the time loop): training normalizes each
    (t, f) slice by that timestep's batch statistics (biased variance,
    eps=1e-5); evaluation uses running statistics shared across timesteps.
    Running stats are updated once per call with the mean over timesteps of
    the per-t batch statistics (the reference updates T times sequentially —
    equivalent up to momentum-weighting of the same T values).
    """

    momentum: float = 0.1  # torch semantics: new = (1-m)*old + m*batch
    eps: float = 1e-5
    use_running_average: bool | None = None
    axis_name: str | None = None  # cross-replica (sync) BN inside shard_map

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,))
        )
        if use_ra:
            mean, var = ra_mean.value, ra_var.value  # [F] broadcast over T,B
        else:
            mean = jnp.mean(x, axis=1, keepdims=True)  # [T, 1, F]
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
            var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
            if self.axis_name is not None:
                var = jax.lax.pmean(var, self.axis_name)
            if not self.is_initializing():
                batch = jnp.asarray(x.shape[1], jnp.float32)
                if self.axis_name is not None:
                    batch = batch * jax.lax.psum(
                        jnp.ones((), jnp.float32), self.axis_name
                    )
                # torch tracks the *unbiased* variance in running stats.
                unbiased = var * (batch / jnp.maximum(batch - 1.0, 1.0))
                ra_mean.value = (
                    1 - self.momentum
                ) * ra_mean.value + self.momentum * jnp.mean(mean, axis=(0, 1))
                ra_var.value = (
                    1 - self.momentum
                ) * ra_var.value + self.momentum * jnp.mean(unbiased, axis=(0, 1))
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * scale + bias


class FeatureHead(nn.Module):
    """Dense -> TemporalBatchNorm -> ReLU -> Dropout over ``[T, B, in]``.

    Equivalent of the reference's BasicModule (LSTM.py:8-18), vectorized
    over timesteps.
    """

    features: int
    dropout_rate: float = 0.3
    bn_axis_name: str | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = nn.Dense(self.features, name="proj", dtype=self.dtype)(x)
        x = x.astype(jnp.float32)  # BatchNorm statistics in f32
        x = TemporalBatchNorm(name="bn", axis_name=self.bn_axis_name)(
            x, use_running_average=not train
        )
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class LSTMHead(nn.Module):
    """FeatureHead + fused-gate scanned LSTM (reference LSTM_cell, LSTM.py:21-51).

    Input ``[T, B, feat_dim]`` I3D features; output ``[T, B, hidden]`` hidden
    states (the per-class logits consumed by the CTC-family losses).
    """

    hidden: int  # v_class, 33 in the reference config
    dropout_rate: float = 0.3
    bn_axis_name: str | None = None
    param_dtype: Any = jnp.float32
    dtype: Any = None  # compute dtype for the matmuls (e.g. bf16); params
                       # and the recurrence state stay f32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        h0: jnp.ndarray | None = None,
        c0: jnp.ndarray | None = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        max_t, batch, _ = feats.shape
        hidden = self.hidden
        v = FeatureHead(
            hidden, self.dropout_rate, self.bn_axis_name, self.dtype,
            name="feature_head",
        )(feats, train=train)  # [T, B, H]

        # Input-to-gates for all timesteps in one MXU matmul.
        xw = nn.Dense(4 * hidden, name="input_gates", dtype=self.dtype)(v)
        xw = xw.astype(jnp.float32)  # [T, B, 4H]
        w_h = self.param(
            "recurrent_kernel",
            nn.initializers.lecun_normal(),
            (hidden, 4 * hidden),
            self.param_dtype,
        )
        if h0 is None:
            h0 = jnp.zeros((batch, hidden), feats.dtype)
        if c0 is None:
            c0 = jnp.zeros((batch, hidden), feats.dtype)

        def step(carry, xw_t):
            h, c = carry
            gates = xw_t + jnp.dot(
                h, w_h, preferred_element_type=jnp.float32
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        _, hs = jax.lax.scan(step, (h0, c0), xw)
        return hs  # [T, B, H]
