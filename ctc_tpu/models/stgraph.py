"""Gated Temporal-Energy-Graph (ST-graph) model + mean-field CTC criterion.

TPU-native equivalents of the reference's legacy components
(/root/reference/models/layers/AsyncTFBase.py and AsyncTFCriterion.py,
SURVEY.md §2 #25-26):

* :class:`STGraphBase` — scene/object/verb unary heads plus 12 low-rank
  pairwise compatibility matrices (spatial so/ov/vs; temporal ss/oo/vv and
  the 6 cross pairs), every head and every ``bmm`` computed for ALL timesteps
  in single batched einsums instead of per-timestep python loops
  (AsyncTFBase.py:88-247).
* :class:`STGraphCriterion` — ``msg_n`` rounds of mean-field message passing
  over the s/o/v marginals (AsyncTFCriterion.py:217-302: iteration n consumes
  the heads' timestep n; log-softmax for the scene simplex, log-sigmoid for
  the multi-label heads), then standard blank-CTC losses on the three output
  sequences (:314-321) and optional ``winsmooth`` temporal smoothing (:50-59).
* :class:`MessageStore` — the cross-batch per-video message queue with
  Gaussian time kernel and compounding decay (MessagePassing, :92-176) as an
  explicit host-side object.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ctc_tpu.losses.blank import ctc_loss


class _PairHead(nn.Module):
    """Low-rank pairwise energy: feat -> [rows, rank] x [rank, cols]."""

    rows: int
    cols: int
    rank: int
    hidden: int = 1000
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, feat, *, train: bool = False):
        # feat [T, B, D] -> energies [T, B, rows, cols]
        def mlp(out_dim, name):
            x = nn.Dense(self.hidden, name=f"{name}_h")(feat)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            return nn.Dense(out_dim, name=f"{name}_o")(x)

        a = mlp(self.rows * self.rank, "a").reshape(
            feat.shape[:-1] + (self.rows, self.rank)
        )
        b = mlp(self.rank * self.cols, "b").reshape(
            feat.shape[:-1] + (self.rank, self.cols)
        )
        return jnp.einsum(
            "tbar,tbrc->tbac", a, b, preferred_element_type=jnp.float32
        )


_PAIRS = (
    ("so", "s", "o"), ("ov", "o", "v"), ("vs", "v", "s"),       # spatial
    ("ss", "s", "s"), ("oo", "o", "o"), ("vv", "v", "v"),       # temporal
    ("so_t", "s", "o"), ("ov_t", "o", "v"), ("vs_t", "v", "s"),
    ("os_t", "o", "s"), ("vo_t", "v", "o"), ("sv_t", "s", "v"),
)


class STGraphBase(nn.Module):
    """Unary s/o/v heads + the 12 pairwise compatibility tensors."""

    s_classes: int = 16
    o_classes: int = 38
    v_classes: int = 33
    num_low_rank: int = 5
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, feat, *, train: bool = False):
        """feat ``[T, B, D]`` -> dict of unary [T,B,C] + pairwise [T,B,A,B']."""
        sizes = {"s": self.s_classes, "o": self.o_classes, "v": self.v_classes}
        s = nn.Dense(1000, name="s_h1")(feat)
        s = nn.relu(s)
        s = nn.Dropout(self.dropout_rate, deterministic=not train)(s)
        s = nn.Dense(1000, name="s_h2")(s)
        s = nn.relu(s)
        s = nn.Dropout(self.dropout_rate, deterministic=not train)(s)
        out = {
            "s": nn.Dense(self.s_classes, name="s_out")(s),
            "o": nn.Dense(self.o_classes, name="o")(feat),
            "v": nn.Dense(self.v_classes, name="v")(feat),
        }
        for name, left, right in _PAIRS:
            out[name] = _PairHead(
                sizes[left], sizes[right], self.num_low_rank, name=name
            )(feat, train=train)
        return out


def winsmooth(mat: jnp.ndarray, kernelsize: int = 1) -> jnp.ndarray:
    """Windowed temporal mean over axis 0 (AsyncTFCriterion.py:50-59),
    vectorized: out[m] = mean(mat[max(0,m-k) : min(n-1,m+k) + 1])."""
    n = mat.shape[0]
    idx = jnp.arange(n)
    lo = jnp.maximum(0, idx - kernelsize)
    hi = jnp.minimum(n - 1, idx + kernelsize)
    csum = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(mat[:1]), mat], axis=0), axis=0
    )
    count = (hi - lo + 1).astype(mat.dtype)
    sel = csum[hi + 1] - csum[lo]
    return sel / count.reshape((n,) + (1,) * (mat.ndim - 1))


def gtmat(sizes: Sequence[int], target: jnp.ndarray) -> jnp.ndarray:
    """Int targets -> one-hot rows (AsyncTFCriterion.py:61-72)."""
    out = jax.nn.one_hot(target, sizes[1])
    if len(sizes) == 3:
        out = jnp.broadcast_to(out[:, :, None], tuple(sizes))
    return out


def mean_field_messages(
    heads: dict,
    *,
    msg_n: int,
    w_temporal: float = 1.0,
    w_spatio: float = 1.0,
    s_msg0=None,
    o_msg0=None,
    v_msg0=None,
):
    """The reference's synchronous mean-field loop (AsyncTFCriterion.py:217-302).

    Iteration n reads timestep n of every head; messages carry the previous
    iteration's log-marginals.  Returns the ``[msg_n, B, C]`` output label
    sequences (log-space) for s, o, v.
    """
    s, o, v = heads["s"], heads["o"], heads["v"]
    batch = s.shape[1]

    def row(msg, mat):  # bmm(msg[B,1,A], mat[B,A,C]) -> [B,C]
        return jnp.einsum("ba,bac->bc", msg, mat)

    def col(mat, msg):  # bmm(mat[B,A,C], msg[B,C,1]) -> [B,A]
        return jnp.einsum("bac,bc->ba", mat, msg)

    s_msg = jnp.zeros_like(s[0]) if s_msg0 is None else s_msg0
    o_msg = jnp.zeros_like(o[0]) if o_msg0 is None else o_msg0
    v_msg = jnp.zeros_like(v[0]) if v_msg0 is None else v_msg0

    s_out, o_out, v_out = [], [], []
    for n in range(msg_n):
        _qs = jax.nn.log_softmax(s[n], axis=1)
        _qo = jax.nn.log_sigmoid(o[n])
        _qv = jax.nn.log_sigmoid(v[n])
        if n == 0:
            s_msg = jnp.zeros_like(_qs)
            o_msg = jnp.zeros_like(_qo)
            v_msg = jnp.zeros_like(_qv)

        qs_pre = (
            s[n]
            + row(s_msg, heads["ss"][n]) * w_temporal
            + row(o_msg, heads["os_t"][n]) * w_temporal
            + row(v_msg, heads["vs_t"][n]) * w_temporal
            + col(heads["so"][n], _qo) * w_spatio
            + row(_qv, heads["vs"][n]) * w_spatio
        )
        qo_pre = (
            o[n]
            + row(o_msg, heads["oo"][n]) * w_temporal
            + row(v_msg, heads["vo_t"][n]) * w_temporal
            + row(s_msg, heads["so_t"][n]) * w_temporal
            + row(_qs, heads["so"][n]) * w_spatio
            + col(heads["ov"][n], _qv) * w_spatio
        )
        qv_pre = (
            v[n]
            + row(v_msg, heads["vv"][n]) * w_temporal
            + row(s_msg, heads["sv_t"][n]) * w_temporal
            + row(o_msg, heads["ov_t"][n]) * w_temporal
            + col(heads["vs"][n], _qs) * w_spatio
            + row(_qo, heads["ov"][n]) * w_spatio
        )
        qs = jax.nn.log_softmax(qs_pre, axis=1)
        qo = jax.nn.log_sigmoid(qo_pre)
        qv = jax.nn.log_sigmoid(qv_pre)
        s_msg, o_msg, v_msg = qs, qo, qv
        s_out.append(qs)
        o_out.append(qo)
        v_out.append(qv)
    return jnp.stack(s_out), jnp.stack(o_out), jnp.stack(v_out)


class STGraphCriterion:
    """Mean-field message passing + blank-CTC losses on s/o/v sequences."""

    def __init__(
        self,
        *,
        msg_n: int,
        w_temporal: float = 1.0,
        w_spatio: float = 1.0,
        smooth_kernel: int = 1,
    ):
        self.msg_n = msg_n
        self.w_temporal = w_temporal
        self.w_spatio = w_spatio
        self.smooth_kernel = smooth_kernel

    def __call__(
        self,
        heads: dict,
        s_target: jnp.ndarray,  # [B] int
        o_target: jnp.ndarray,  # [B, L] int label sequences
        v_target: jnp.ndarray,  # [B, L] int
        target_lengths: jnp.ndarray,  # [B]
        *,
        synchronous: bool = False,
    ):
        s_seq, o_seq, v_seq = mean_field_messages(
            heads,
            msg_n=self.msg_n,
            w_temporal=self.w_temporal,
            w_spatio=self.w_spatio,
        )
        batch = s_seq.shape[1]
        in_len = jnp.full((batch,), self.msg_n, jnp.int32)
        ones = jnp.ones((batch,), jnp.int32)
        loss = (
            ctc_loss(s_seq, s_target[:, None], in_len, ones, normalize=False)
            + ctc_loss(o_seq, o_target, in_len, target_lengths, normalize=False)
            + ctc_loss(v_seq, v_target, in_len, target_lengths, normalize=False)
        )
        if synchronous:
            s_seq = winsmooth(s_seq, self.smooth_kernel)
            o_seq = winsmooth(o_seq, self.smooth_kernel)
            v_seq = winsmooth(v_seq, self.smooth_kernel)
        return s_seq, o_seq, v_seq, loss


class MessageStore:
    """Cross-batch per-video message memory (MessagePassing, host-side).

    ``set(ids, times, msgs)`` appends bounded queues per video id;
    ``get(ids, times, size, direction)`` returns, per query, the
    decay-compounded Gaussian-time-kernel average of stored messages strictly
    before ('past') or after ('future') the query time.
    """

    def __init__(self, maxsize: int = 20, decay: float = 1.0,
                 sigma: float = 300.0):
        self.maxsize = maxsize
        self.decay = decay
        self.sigma = sigma
        self._store: dict = {}

    def set(self, ids, times, msgs):
        for vid, t, m in zip(ids, times, msgs):
            q = self._store.setdefault(vid, [])
            q.append((float(t), np.asarray(m)))
            if len(q) > self.maxsize:
                del q[0]

    def get(self, ids, times, size, direction: str = "past") -> np.ndarray:
        out = []
        for vid, t0 in zip(ids, times):
            entries = [
                (t, m)
                for t, m in self._store.get(vid, [])
                if (t < t0 if direction == "past" else t > t0)
            ]
            if not entries:
                out.append(np.zeros(size, np.float32))
                continue
            total = np.zeros(size, np.float32)
            norm = 0.0
            for i, (t, m) in enumerate(entries):
                w_decay = 1.0 if i == 0 else (1.0 / self.decay) ** i
                w_kernel = math.exp(-((t - t0) ** 2) / (2 * self.sigma**2))
                total += m * w_decay * w_kernel
                norm += w_decay
            out.append(total / max(norm, 1e-12))
        return np.stack(out)
