"""Sharded training steps: shard_map + explicit ``lax.psum``/``pmean``
gradient exchange over the ``data`` mesh axis.

This is the TPU-native replacement for the reference's
DataParallel/DistributedDataParallel wrap (/root/reference/models/__init__.py:33-43)
— and it synchronizes *everything* (the reference only wrapped the I3D; LSTM
head gradients were silently left unsynchronized, SURVEY.md §5.8).

Improvements over the reference, documented: BatchNorm batch statistics are
cross-replica averaged (the reference's per-GPU BN stats silently diverge).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ctc_tpu import losses
from ctc_tpu.parallel.mesh import DATA_AXIS
from ctc_tpu.train.metrics import topk_accuracy

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

_LOSS_FNS = losses.LOSS_FNS


def shard_batch(batch: dict, mesh) -> dict:
    """Place a host batch dict on the mesh, batch axis split over ``data``.

    Multi-host: each host passes its *local* batch (the loaders already
    shard samples by ``jax.process_index``) and the global array is
    assembled from the per-host shards — the jax-native replacement for the
    reference's DistributedSampler (/root/reference/datasets/__init__.py:17-20).
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        import numpy as np

        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), batch
    )


def replicate(tree, mesh):
    """Replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree
    )


def _make_local_step(model, loss_kind, implementation, ce_weight, interpret,
                     frozen_subtrees, loss_fn=None):
    """The per-shard (inside-shard_map) step body shared by the single-step
    and the K-steps-per-dispatch sharded programs: local forward/backward,
    pmean'd gradients/metrics/BN stats.  ``loss_fn`` overrides the
    registry lookup (e.g. a weighted joint loss)."""
    loss_fn_core = loss_fn if loss_fn is not None else _LOSS_FNS[loss_kind]
    kwargs = {"implementation": implementation}
    if interpret:
        kwargs["interpret"] = True
    # cross-replica (sync) BatchNorm so sharded training matches the
    # single-device batch statistics exactly
    if getattr(model, "bn_axis_name", None) is None and hasattr(model, "clone"):
        try:
            model = model.clone(bn_axis_name=DATA_AXIS)
        except TypeError:
            pass

    def local_step(params, batch_stats, batch, rng):
        feats = batch["feats"]
        if feats.ndim == 3:  # [Blocal, T, F] features -> time-major
            feats = jnp.transpose(feats, (1, 0, 2))
        # higher-rank pixel clips stay batch-major (I3DLSTM's own layout)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def loss_of(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                feats,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = loss_fn_core(
                logits,
                batch["paths"],
                batch["input_lengths"],
                batch["target_lengths"],
                **kwargs,
            )
            if ce_weight:
                from ctc_tpu.train.trainer import _head_logits

                loss = loss + ce_weight * losses.cross_entropy(
                    _head_logits(logits[-1], batch, loss_kind),
                    batch["future_target"],
                )
            return loss, (mutated["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(params)
        # Cross-chip exchange: gradients, loss, BN stats, metrics — all ride
        # ICI via one fused all-reduce each.  Frozen subtrees (grads are
        # exact zeros) skip the exchange.
        if frozen_subtrees:
            grads = {
                k: (v if k in frozen_subtrees
                    else jax.lax.pmean(v, DATA_AXIS))
                for k, v in grads.items()
            }
        else:
            grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        from ctc_tpu.train.trainer import _head_logits

        (top1, top5), _ = topk_accuracy(
            _head_logits(logits[-1], batch, loss_kind),
            batch["future_target"], topk=(1, 5)
        )
        top1 = jax.lax.pmean(top1, DATA_AXIS)
        top5 = jax.lax.pmean(top5, DATA_AXIS)
        return grads, loss, new_stats, top1, top5

    return local_step


def make_sharded_train_step(
    model, mesh, loss_kind: str = "noblank", implementation=None,
    ce_weight: float = 0.0, interpret: bool = False,
    frozen_subtrees: tuple = (), loss_fn=None,
):
    """Jitted train step with per-shard forward/backward and explicit
    ``lax.pmean`` gradient + metric exchange over the ``data`` axis.

    Use with a :class:`ctc_tpu.train.trainer.TrainState` whose params are
    replicated (:func:`replicate`) and batches placed by :func:`shard_batch`.

    ``implementation``/``interpret`` select the lattice kernel exactly like
    the unsharded step (Pallas on TPU by default; ``interpret=True`` runs
    the Pallas kernel in interpret mode for CPU-mesh parity tests) and
    ``ce_weight`` adds the reference's ``--alpha``-scaled final-step
    cross-entropy term, so the sharded step covers every configuration the
    single-device step does.

    ``frozen_subtrees``: top-level param keys whose gradients are
    structurally zero (stop_gradient'ed, e.g. the frozen I3D backbone) —
    they are EXCLUDED from the gradient pmean, cutting the pixels-mode
    exchange from 49.3 MB to 0.17 MB per step (docs/DISTRIBUTED.md's ICI
    table); zeros are unchanged by pmean, so the result is identical.
    """
    local_step = _make_local_step(model, loss_kind, implementation, ce_weight,
                                  interpret, frozen_subtrees, loss_fn)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def train_step(state, batch, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)
        grads, loss, new_stats, top1, top5 = sharded(
            state.params, state.batch_stats, batch, rng
        )
        state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        return state, {"loss": loss, "top1": top1, "top5": top5}

    return train_step


def _make_local_eval(model, loss_kind, implementation, transition_metrics,
                     loss_fn):
    """Per-shard eval body: the plain eval metrics, pmean'd over ``data``.
    Numerically equal to the unsharded eval step (running BN stats; every
    metric is a per-sample mean, so the pmean of equal-sized shard means
    is the global mean) — shared by the single and K-per-dispatch sharded
    eval builders."""
    from ctc_tpu.train.trainer import _make_eval_body

    body = _make_eval_body(model, loss_kind, implementation,
                           transition_metrics, loss_fn)

    def local_eval(state, batch):
        return jax.tree_util.tree_map(
            lambda v: jax.lax.pmean(v, DATA_AXIS), body(state, batch)
        )

    return local_eval


def make_sharded_eval_step(
    model, mesh, loss_kind: str = "noblank", implementation=None,
    transition_metrics: bool = False, loss_fn=None,
):
    """Eval step under shard_map: per-shard loss/metrics, pmean'd over the
    ``data`` axis — keeps the lattice Pallas kernel under shard_map with
    per-shard operands (like the train step) instead of under
    GSPMD-sharded ones."""
    local_eval = _make_local_eval(model, loss_kind, implementation,
                                  transition_metrics, loss_fn)
    sharded = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_multi_eval_step(
    model, mesh, loss_kind: str = "noblank", implementation=None,
    transition_metrics: bool = False, loss_fn=None,
):
    """K eval steps per dispatch on a data mesh: ``lax.scan`` over the
    stacked batches inside the shard_map body (the eval twin of
    :func:`make_sharded_multi_train_step`); metrics come back as ``[K]``
    vectors."""
    local_eval = _make_local_eval(model, loss_kind, implementation,
                                  transition_metrics, loss_fn)

    def local_multi(state, batches):
        def scan_body(_, batch):
            return None, local_eval(state, batch)

        _, metrics = jax.lax.scan(scan_body, None, batches)
        return metrics

    sharded = shard_map(
        local_multi,
        mesh=mesh,
        in_specs=(P(), P(None, DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_multi_train_step(
    model, mesh, loss_kind: str = "noblank", implementation=None,
    ce_weight: float = 0.0, interpret: bool = False,
    frozen_subtrees: tuple = (), loss_fn=None,
):
    """K optimizer steps per dispatch on a data mesh: ``lax.scan`` over the
    stacked batches *inside* the shard_map body.

    This makes the K-group program exactly K applications of
    :func:`make_sharded_train_step`'s step — same per-shard BN stats
    (pmean'd each substep), same dropout streams (rng folds by
    ``state.step`` then the shard index inside the body), and the lattice
    Pallas kernel always sits under shard_map with replicated-per-shard
    operands instead of under GSPMD-sharded ones (the plain-jit multi-step
    relied on GSPMD to partition the pallas_call, which has no sharding
    rule).  Takes a batch dict stacked ``[K, B, ...]`` placed
    ``P(None, 'data')``; returns ``(state, metrics)`` with ``[K]`` metric
    vectors.
    """
    local_step = _make_local_step(model, loss_kind, implementation, ce_weight,
                                  interpret, frozen_subtrees, loss_fn)

    def local_multi(state, batches, dropout_rng):
        def body(s, batch):
            rng = jax.random.fold_in(dropout_rng, s.step)
            grads, loss, new_stats, top1, top5 = local_step(
                s.params, s.batch_stats, batch, rng
            )
            s = s.apply_gradients(grads).replace(batch_stats=new_stats)
            return s, {"loss": loss, "top1": top1, "top5": top5}

        return jax.lax.scan(body, state, batches)

    sharded = shard_map(
        local_multi,
        mesh=mesh,
        in_specs=(P(), P(None, DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
