"""Training engine: jitted train/eval steps + an epoch-loop Trainer.

TPU-native redesign of the reference Trainer (/root/reference/train.py:339-620):

* the whole step — model forward, CTC-family loss, backward, optimizer
  update, metrics — is ONE jitted function; no per-batch python DP, no
  host<->device ping-pong.
* optimizers are optax transforms; torch.optim.Adam semantics (L2 folded
  into the gradient, reference models/__init__.py:69) are reproduced with
  ``add_decayed_weights`` *before* ``scale_by_adam``.
* batches may be sharded over a ``data`` mesh axis; under ``jax.jit`` with
  sharded inputs XLA inserts the gradient all-reduce automatically (the
  ``lax.psum`` path lives in :mod:`ctc_tpu.parallel` for shard_map use).
* checkpoints are SAVED every epoch (the reference wires load but never
  calls save — SURVEY.md §2.3).
"""

from __future__ import annotations

import csv
import itertools
import os
import time

import numpy as np
from functools import partial
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax

from ctc_tpu import losses
from ctc_tpu.train.metrics import (
    AverageMeter,
    topk_accuracy,
    transition_accuracy,
    transition_recall,
)
from ctc_tpu.train.schedule import step_decay_schedule


@flax.struct.dataclass
class TrainState:
    """Model + optimizer state (a pytree; flax.struct so it jits cleanly)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def torch_style_adam(
    schedule: Callable[[int], float] | float, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay): L2 added to the raw gradient."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam())
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def torch_style_sgd(
    schedule: Callable[[int], float] | float,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch.optim.SGD semantics (reference models/__init__.py:46)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def _model_input(x):
    """Batch-major features ``[B, T, F]`` go to the time-major ``[T, B, F]``
    the LSTM head scans; higher-rank pixel clips ``[B, T, stack, h, w, 3]``
    pass through batch-major (I3DLSTM handles its own layout)."""
    return jnp.transpose(x, (1, 0, 2)) if x.ndim == 3 else x


# loss-kind registry shared with the sharded step (models/__init__.py:82-86)
_LOSS_FNS = losses.LOSS_FNS


def _head_logits(logits_last, batch, loss_kind):
    """Final-step logits in the metric/CE class space — the verb slice for
    the joint (o, v) head (future_target is the future VERB, reference
    train.py:427-434), the whole head otherwise."""
    if loss_kind == "joint":
        o_class = batch["paths"].shape[-1] - 1
        return logits_last[..., : logits_last.shape[-1] - o_class]
    return logits_last


def make_train_step(model, loss_kind: str = "noblank", implementation=None,
                    ce_weight: float = 0.0, loss_fn=None):
    """Build the jitted train step.

    Batch dict (host layout, batch-major):
      ``feats [B, T, F]``, ``paths`` (``[B, L]`` int for noblank/blank or
      ``[B, L, C]`` float for binary), ``input_lengths [B]``,
      ``target_lengths [B]``, ``future_target [B]`` int (top-k metric).

    ``ce_weight`` > 0 adds a cross-entropy term on the final timestep vs the
    future target, scaled by the reference's ``--alpha`` (opts.py:74,
    Trainer.train's CE-vs-CTC mixing scale).

    ``loss_fn`` overrides the registry lookup (e.g. the sequence-sharded
    lattice loss from :func:`ctc_tpu.parallel.seq_lattice.make_seq_sharded_loss`).
    """
    body = _make_step_body(model, loss_kind, implementation, ce_weight,
                           loss_fn)
    return jax.jit(body)


def _make_step_body(model, loss_kind, implementation, ce_weight, loss_fn):
    """The unjitted single-step body shared by the plain jitted step and
    the multi-step (steps-per-dispatch) scan."""
    loss_fn_core = loss_fn if loss_fn is not None else _LOSS_FNS[loss_kind]
    kwargs = {"implementation": implementation}

    def train_step(state: TrainState, batch, dropout_rng):
        feats = _model_input(batch["feats"])
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_of(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                feats,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )  # [T, B, C]
            loss = loss_fn_core(
                logits,
                batch["paths"],
                batch["input_lengths"],
                batch["target_lengths"],
                **kwargs,
            )
            if ce_weight:
                loss = loss + ce_weight * losses.cross_entropy(
                    _head_logits(logits[-1], batch, loss_kind),
                    batch["future_target"],
                )
            return loss, (mutated["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        (top1, top5), _ = topk_accuracy(
            _head_logits(logits[-1], batch, loss_kind),
            batch["future_target"], topk=(1, 5)
        )
        metrics = {"loss": loss, "top1": top1, "top5": top5}
        return state, metrics

    return train_step


def make_multi_train_step(model, loss_kind: str = "noblank",
                          implementation=None, ce_weight: float = 0.0,
                          loss_fn=None):
    """K optimizer steps as ONE jitted program (``lax.scan`` over batches
    stacked on a leading axis).

    On dispatch-latency-bound backends (this one: ~0.1 ms device time
    inside a ~1.2-1.7 ms dispatched feature-mode step) this amortizes the
    per-dispatch overhead K-fold.  Semantics are EXACTLY K calls of the
    single step: the dropout rng folds by ``state.step`` inside the body,
    so substep k reproduces the k-th individual call bit-for-bit
    (tests/test_trainer.py::test_steps_per_dispatch_matches_single_steps).

    Takes a batch dict whose leaves are stacked ``[K, ...]``; returns
    ``(state, metrics)`` with each metric a ``[K]`` vector (per substep).
    """
    body = _make_step_body(model, loss_kind, implementation, ce_weight,
                           loss_fn)

    @jax.jit
    def multi_step(state: TrainState, batches, dropout_rng):
        def scan_body(s, batch):
            s, metrics = body(s, batch, dropout_rng)
            return s, metrics

        return jax.lax.scan(scan_body, state, batches)

    return multi_step


def make_eval_step(model, loss_kind: str = "noblank", implementation=None,
                   transition_metrics: bool = False, loss_fn=None):
    """Build the jitted eval step (see :func:`_make_eval_body`)."""
    return jax.jit(_make_eval_body(model, loss_kind, implementation,
                                   transition_metrics, loss_fn))


def make_multi_eval_step(model, loss_kind: str = "noblank",
                         implementation=None,
                         transition_metrics: bool = False, loss_fn=None):
    """K eval steps as one jitted program (``lax.scan`` over stacked
    batches; metrics come back as ``[K]`` vectors) — the eval twin of
    :func:`make_multi_train_step`."""
    body = _make_eval_body(model, loss_kind, implementation,
                           transition_metrics, loss_fn)

    @jax.jit
    def multi_eval(state: TrainState, batches):
        def scan_body(_, batch):
            return None, body(state, batch)

        _, metrics = jax.lax.scan(scan_body, None, batches)
        return metrics

    return multi_eval


def _make_eval_body(model, loss_kind: str = "noblank", implementation=None,
                    transition_metrics: bool = False, loss_fn=None):
    """Build the unjitted eval-step body.

    ``transition_metrics=True`` additionally reports the DTW transition
    metric family the reference's validate intended to compute
    (/root/reference/train.py:556-584: accuracy_time / recall_time on the
    label paths): per-sample :func:`transition_accuracy` and
    :func:`transition_recall` over the full logit sequence, batch-averaged
    as ``trans_top{1,5}`` / ``recall_top{1,5}``.  Integer paths are
    one-hotted to the multi-hot form the matcher walks.
    """
    loss_fn_core = loss_fn if loss_fn is not None else _LOSS_FNS[loss_kind]
    kwargs = {"implementation": implementation}

    def eval_step(state: TrainState, batch):
        feats = _model_input(batch["feats"])
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            feats,
            train=False,
        )
        loss = loss_fn_core(
            logits,
            batch["paths"],
            batch["input_lengths"],
            batch["target_lengths"],
            **kwargs,
        )
        extra = {}
        if transition_metrics:
            paths = batch["paths"]
            out = logits
            tgt_len = batch["target_lengths"]
            if loss_kind == "joint":
                # verb-head DTW metrics: verb logits slice vs the one-hot
                # of the packed verb path column
                from ctc_tpu.losses.joint import (
                    split_joint_logits,
                    unpack_joint_paths,
                )

                out, _ = split_joint_logits(logits, paths)
                v_paths, _ = unpack_joint_paths(paths)
                paths = jax.nn.one_hot(
                    jnp.mod(v_paths, out.shape[2]), out.shape[2]
                )
                tgt_len = tgt_len[:, 0]
            elif paths.ndim == 2:  # int class-index paths -> multi-hot
                paths = jax.nn.one_hot(
                    jnp.mod(paths, logits.shape[2]), logits.shape[2]
                )
            out_bt = jnp.transpose(out, (1, 0, 2))  # [B, T, C]
            (t1, t5), _ = jax.vmap(
                lambda o, p, n: transition_accuracy(o, p, n)
            )(out_bt, paths, tgt_len)
            (r1, r5), _ = jax.vmap(
                lambda o, p, n: transition_recall(o, p, n)
            )(out_bt, paths, tgt_len)
            extra = {
                "trans_top1": jnp.mean(t1), "trans_top5": jnp.mean(t5),
                "recall_top1": jnp.mean(r1), "recall_top5": jnp.mean(r5),
            }
        (top1, top5), _ = topk_accuracy(
            _head_logits(logits[-1], batch, loss_kind),
            batch["future_target"], topk=(1, 5)
        )
        return {"loss": loss, "top1": top1, "top5": top5, **extra}

    return eval_step


class Trainer:
    """Epoch-loop driver with meters, CSV logs and checkpointing.

    The data-loader contract is any iterable of batch dicts (see
    :func:`make_train_step`); epochs re-iterate the loader.
    """

    def __init__(
        self,
        model,
        *,
        loss_kind: str = "noblank",
        lr: float = 1e-3,
        weight_decay: float = 0.0,
        lr_decay_epochs: int = 30,
        steps_per_epoch: int = 1,
        cache_dir: str | None = None,
        print_freq: int = 100,
        seed: int = 0,
        implementation=None,
        ce_weight: float = 0.0,
        accum_grad: int = 1,
        print_test_freq: int | None = None,
        train_size: float = 1.0,
        val_size: float = 1.0,
        i3d_optimizer: dict | None = None,
        transition_metrics: bool = False,
        mesh=None,
        skip_nonfinite: bool = False,
        grad_norm_freq: int = 0,
        seq_parallel: int = 0,
        seq_microbatches: int = 0,
        model_parallel: int = 1,
        steps_per_dispatch: int = 1,
        joint_object_weight: float = 1.0,
    ):
        """``mesh``: a ``jax.sharding.Mesh`` with a ``data`` axis — the
        trainer then runs the shard_map train step with explicit
        ``lax.pmean`` gradient exchange and shards every batch over the
        mesh (the product wiring of SURVEY.md §2.5 data parallelism; the
        reference's DDP wrap, models/__init__.py:33-43).

        ``skip_nonfinite``: wrap the optimizer in
        :func:`ctc_tpu.train.guards.skip_nonfinite_updates` — NaN/Inf
        updates are dropped instead of poisoning params (§5.2).

        ``grad_norm_freq`` > 0: log the global gradient norm every that
        many optimizer steps (the reference's VerboseGradients intent,
        models/layers/VerboseGradients.py:15-25, wired in).

        ``seq_parallel`` > 1: pipeline the lattice's T axis over that many
        devices (the long-T strategy of SURVEY.md §5.7 — boundary-row
        ppermute exchange); ``seq_microbatches`` ≥ the shard count shrinks
        the pipeline bubble.

        ``model_parallel`` > 1 (binary loss only): shard the 157-class BCE
        emission contraction over a ``model`` mesh axis with one psum of
        partial emissions (SURVEY.md §2.5 item 2,
        :mod:`ctc_tpu.parallel.class_sharded`).

        Axes COMPOSE: pass ``mesh=make_mesh(data=D, model=M)`` together
        with ``model_parallel=M`` (or ``make_mesh(data=D, seq=S)`` with
        ``seq_parallel=S``) and batches shard over ``data`` while the loss
        shards its second axis — the pod-scale composition of SURVEY.md
        §2.5 items 1-2 / §5.7.  Only ``model_parallel`` with
        ``seq_parallel`` is rejected (both shard the same lattice)."""
        if print_test_freq is None:
            print_test_freq = print_freq
        self.model = model
        # the schedule count advances once per OPTIMIZER step: subsampling
        # (--train-size < 1) shortens the epoch, and accumulation steps only
        # every accum_grad batches — fold both in so LR decay stays epoch-based
        # like the reference's adjust_learning_rate (train.py:34-38)
        effective_steps = max(int(steps_per_epoch * min(train_size, 1.0)), 1)
        opt_steps_per_epoch = max(effective_steps // max(accum_grad, 1), 1)
        self.schedule = step_decay_schedule(lr, lr_decay_epochs,
                                            opt_steps_per_epoch)
        self.tx = torch_style_adam(self.schedule, weight_decay)
        if i3d_optimizer is not None:
            # end-to-end pixels mode (I3DLSTM): Adam on the head, SGD on the
            # 'i3d' param subtree — the reference's two-optimizer factory
            # (models/__init__.py:46,69).  finetune=False = the live frozen
            # path (train.py:448-451): zero updates for the backbone.
            if i3d_optimizer.get("finetune", False):
                i3d_tx = torch_style_sgd(
                    step_decay_schedule(
                        i3d_optimizer.get("lr", lr), lr_decay_epochs,
                        opt_steps_per_epoch,
                    ),
                    momentum=i3d_optimizer.get("momentum", 0.9),
                    weight_decay=i3d_optimizer.get("weight_decay",
                                                   weight_decay),
                )
            else:
                i3d_tx = optax.set_to_zero()

            def label_fn(params):
                return {
                    k: jax.tree.map(
                        lambda _: "i3d" if k == "i3d" else "head", v
                    )
                    for k, v in params.items()
                }

            self.tx = optax.multi_transform(
                {"head": self.tx, "i3d": i3d_tx}, label_fn
            )
        if grad_norm_freq:
            from ctc_tpu.train.guards import log_grad_norms

            self.tx = optax.chain(log_grad_norms(grad_norm_freq), self.tx)
        if skip_nonfinite:
            from ctc_tpu.train.guards import skip_nonfinite_updates

            self.tx = skip_nonfinite_updates(self.tx)
        if accum_grad > 1:
            # gradient accumulation (reference --accum-grad, train.py:447-453):
            # torch SUMS .grad across the k batches and steps on the k-th;
            # use_grad_mean=False reproduces the sum exactly
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=accum_grad, use_grad_mean=False
            )
        self.mesh = mesh
        seq_loss_fn = None
        composed = False
        if loss_kind == "joint" and joint_object_weight != 1.0:
            # rebalance the two heads (--joint-object-weight): the binary
            # NLL's mean-over-classes emissions make it ~1/o_class the
            # verb NLL's magnitude
            from ctc_tpu.losses.joint import joint_ov_ctc_loss

            seq_loss_fn = partial(
                joint_ov_ctc_loss, object_weight=joint_object_weight
            )
        if model_parallel > 1 and seq_parallel > 1:
            raise ValueError(
                "model_parallel and seq_parallel cannot be combined — the "
                "class axis and the T pipeline shard the same lattice"
            )
        if model_parallel > 1:
            if loss_kind != "binary":
                raise ValueError(
                    "model_parallel shards the binary loss's class axis; "
                    f"got loss {loss_kind!r}"
                )
            from ctc_tpu.parallel.class_sharded import (
                make_class_sharded_binary_loss,
            )

            if mesh is not None:
                # composed data×model: the passed mesh carries both axes;
                # batches shard over 'data', the 157-class emission
                # contraction over 'model' (SURVEY.md §2.5 items 1-2)
                if dict(mesh.shape).get("model", 1) != model_parallel:
                    raise ValueError(
                        f"mesh {dict(mesh.shape)} lacks a 'model' axis of "
                        f"size {model_parallel} — build it with "
                        "make_mesh(data=..., model=...)"
                    )
                seq_loss_fn = make_class_sharded_binary_loss(
                    mesh, batch_axis="data"
                )
                composed = True
            else:
                import numpy as np
                from jax.sharding import Mesh

                cmesh = Mesh(
                    np.asarray(jax.devices()[:model_parallel]), ("model",)
                )
                seq_loss_fn = make_class_sharded_binary_loss(cmesh)

        if seq_parallel > 1:
            if loss_kind not in ("noblank", "binary", "blank"):
                raise ValueError(
                    f"seq_parallel needs a lattice loss, got {loss_kind!r}"
                )
            from ctc_tpu.parallel.seq_lattice import make_seq_sharded_loss

            if mesh is not None:
                # composed data×seq: per-data-shard T pipelines
                # (SURVEY.md §2.5 item 1 × §5.7)
                if dict(mesh.shape).get("seq", 1) != seq_parallel:
                    raise ValueError(
                        f"mesh {dict(mesh.shape)} lacks a 'seq' axis of "
                        f"size {seq_parallel} — build it with "
                        "make_mesh(data=..., seq=...)"
                    )
                seq_loss_fn = make_seq_sharded_loss(
                    mesh, loss_kind,
                    num_microbatches=(seq_microbatches or None),
                    batch_axis="data",
                )
                composed = True
            else:
                import numpy as np
                from jax.sharding import Mesh

                seq_mesh = Mesh(
                    np.asarray(jax.devices()[:seq_parallel]), ("seq",)
                )
                seq_loss_fn = make_seq_sharded_loss(
                    seq_mesh, loss_kind,
                    num_microbatches=(seq_microbatches or None),
                )
        # A plain (data-only) mesh runs EVERY step under shard_map — train,
        # eval, and their K-per-dispatch scans — so the Pallas loss always
        # sees per-shard operands (GSPMD has no sharding rule for the
        # pallas_call) and BN stats are pmean'd identically everywhere.
        # Single-device, or a composed mesh whose loss carries its own
        # shard_map, uses the plain jitted steps (GSPMD partitions the
        # model fwd/bwd around the loss's pinned second-axis layout).
        use_sharded = mesh is not None and not composed
        if use_sharded:
            from ctc_tpu.parallel.steps import (
                make_sharded_eval_step,
                make_sharded_multi_eval_step,
                make_sharded_multi_train_step,
                make_sharded_train_step,
            )

            # frozen-backbone pixels mode: the I3D grads are exact zeros
            # (stop_gradient), so skip their 49 MB share of the pmean
            frozen = (
                ("i3d",)
                if (i3d_optimizer is not None
                    and not i3d_optimizer.get("finetune", False))
                else ()
            )
            self.train_step = make_sharded_train_step(
                model, mesh, loss_kind, implementation, ce_weight=ce_weight,
                frozen_subtrees=frozen, loss_fn=seq_loss_fn,
            )
            self.eval_step = make_sharded_eval_step(
                model, mesh, loss_kind, implementation,
                transition_metrics, loss_fn=seq_loss_fn,
            )
        else:
            self.train_step = make_train_step(model, loss_kind,
                                              implementation, ce_weight,
                                              loss_fn=seq_loss_fn)
            self.eval_step = make_eval_step(model, loss_kind,
                                            implementation,
                                            transition_metrics,
                                            loss_fn=seq_loss_fn)
        self.steps_per_dispatch = max(steps_per_dispatch, 1)
        if self.steps_per_dispatch > 1:
            # K optimizer/eval steps per dispatched program (lax.scan over
            # stacked batches) — amortizes per-dispatch latency; exact
            # K-single-step semantics (on the sharded path the scan runs
            # INSIDE the shard_map body, so each substep is bit-identical
            # to the single step incl. dropout streams).  The sub-K
            # remainder falls back to the single steps.
            if use_sharded:
                self.multi_step = make_sharded_multi_train_step(
                    model, mesh, loss_kind, implementation,
                    ce_weight=ce_weight, frozen_subtrees=frozen,
                    loss_fn=seq_loss_fn,
                )
                self.multi_eval_step = make_sharded_multi_eval_step(
                    model, mesh, loss_kind, implementation,
                    transition_metrics, loss_fn=seq_loss_fn,
                )
            else:
                self.multi_step = make_multi_train_step(
                    model, loss_kind, implementation, ce_weight,
                    loss_fn=seq_loss_fn,
                )
                self.multi_eval_step = make_multi_eval_step(
                    model, loss_kind, implementation, transition_metrics,
                    loss_fn=seq_loss_fn,
                )
        self.cache_dir = cache_dir
        self.print_freq = print_freq
        self.print_test_freq = print_test_freq
        # epoch subsampling fractions (reference --train-size/--val-size,
        # train.py:363,508: itertools.islice(loader, int(len*size)))
        self.train_size = train_size
        self.val_size = val_size
        self.rng = jax.random.PRNGKey(seed)
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)

    @staticmethod
    def _uniform_shapes(group) -> bool:
        """True when every batch in a K-group has identical leaf shapes —
        ``np.stack`` would raise mid-epoch otherwise (e.g. a custom loader
        whose smaller final batch lands inside a full-size group); non-
        uniform groups fall back to single steps like the short remainder."""
        first = {k: np.asarray(v).shape for k, v in group[0].items()}
        return all(
            np.asarray(b[k]).shape == s
            for b in group[1:]
            for k, s in first.items()
        )

    @staticmethod
    def _part(loader, size: float):
        try:
            n = len(loader)
        except TypeError:
            return loader
        return itertools.islice(iter(loader), int(n * size))

    def _place(self, batch):
        """Shard a host batch over the mesh's ``data`` axis (identity when
        training single-device)."""
        if self.mesh is None:
            return batch
        from ctc_tpu.parallel.steps import shard_batch

        return shard_batch(batch, self.mesh)


    def _place_stacked(self, stacked):
        """Place a ``[K, B, ...]`` stacked batch dict: axis 1 over 'data'.

        Multi-host: each host passes its local stack and the global array
        is assembled per-process (mirrors :func:`parallel.steps.shard_batch`).
        """
        if self.mesh is None:
            return stacked
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(self.mesh, PartitionSpec(None, "data"))
        if jax.process_count() > 1:
            return {
                k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v)
                )
                for k, v in stacked.items()
            }
        return {
            k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in stacked.items()
        }

    def init_state(self, example_batch) -> TrainState:
        feats = _model_input(jnp.asarray(example_batch["feats"]))
        params_rng, dropout_rng, self.rng = jax.random.split(self.rng, 3)
        variables = self.model.init(
            {"params": params_rng, "dropout": dropout_rng}, feats, train=True
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.mesh is not None:
            from ctc_tpu.parallel.steps import replicate

            params = replicate(params, self.mesh)
            batch_stats = replicate(batch_stats, self.mesh)
        state = TrainState.create(
            params=params,
            batch_stats=batch_stats,
            tx=self.tx,
        )
        if self.mesh is not None:
            # step/opt_state ride the mesh too: every leaf then carries a
            # NamedSharding, so checkpoint restore (which re-places onto
            # the template's shardings) cannot mix committed device sets
            state = state.replace(
                step=replicate(state.step, self.mesh),
                opt_state=replicate(state.opt_state, self.mesh),
            )
        return state

    def _csv_writer(self, name):
        if not self.cache_dir:
            return None
        f = open(os.path.join(self.cache_dir, name), "a", newline="")
        return f, csv.writer(f)

    def train_epoch(self, state: TrainState, loader, epoch: int):
        meters = {k: AverageMeter() for k in ("loss", "top1", "top5", "time")}
        dropout_rng = jax.random.fold_in(self.rng, epoch)
        log = self._csv_writer("train_log.csv")
        end = time.time()
        k = self.steps_per_dispatch
        it = iter(self._part(loader, self.train_size))
        i = 0
        while True:
            group = list(itertools.islice(it, k))
            if not group:
                break
            if k > 1 and len(group) == k and self._uniform_shapes(group):
                stacked = self._place_stacked({
                    key: np.stack([np.asarray(b[key]) for b in group])
                    for key in group[0]
                })
                state, mk = self.multi_step(state, stacked, dropout_rng)
                metrics_list = [
                    {kk: v[j] for kk, v in mk.items()} for j in range(k)
                ]
            else:  # K=1, or the epoch's sub-K remainder: single steps
                metrics_list = []
                for b in group:
                    state, m = self.train_step(
                        state, self._place(b), dropout_rng
                    )
                    metrics_list.append(m)
            for batch, metrics in zip(group, metrics_list):
                n = batch["feats"].shape[0]
                meters["loss"].update(float(metrics["loss"]), n)
                meters["top1"].update(float(metrics["top1"]), n)
                meters["top5"].update(float(metrics["top5"]), n)
                meters["time"].update(time.time() - end)
                end = time.time()
                if i % self.print_freq == 0:
                    print(
                        f"Epoch: [{epoch}][{i}]\t"
                        f"Loss {meters['loss'].val:.3f} ({meters['loss'].avg:.3f})\t"
                        f"Prec@1 {meters['top1'].val:.3f} ({meters['top1'].avg:.3f})\t"
                        f"Prec@5 {meters['top5'].val:.3f} ({meters['top5'].avg:.3f})"
                    )
                    if log:
                        log[1].writerow(
                            [epoch, i, meters["loss"].val,
                             meters["top1"].val, meters["top5"].val]
                        )
                i += 1
        if log:
            log[0].close()
        return state, {k_: m.avg for k_, m in meters.items()}

    def validate(self, state: TrainState, loader, epoch: int):
        meters: dict[str, AverageMeter] = {}
        log = self._csv_writer("test_log.csv")
        k = self.steps_per_dispatch
        it = iter(self._part(loader, self.val_size))
        i = 0
        while True:
            group = list(itertools.islice(it, k))
            if not group:
                break
            if k > 1 and len(group) == k and self._uniform_shapes(group):
                stacked = self._place_stacked({
                    key: np.stack([np.asarray(b[key]) for b in group])
                    for key in group[0]
                })
                mk = self.multi_eval_step(state, stacked)
                metrics_list = [
                    {kk: v[j] for kk, v in mk.items()} for j in range(k)
                ]
            else:
                metrics_list = [
                    self.eval_step(state, self._place(b)) for b in group
                ]
            for batch, metrics in zip(group, metrics_list):
                n = batch["feats"].shape[0]
                for k_, v in metrics.items():
                    meters.setdefault(k_, AverageMeter()).update(float(v), n)
                if log and i % self.print_test_freq == 0:
                    log[1].writerow(
                        [epoch, i, meters["loss"].val, meters["top1"].val,
                         meters["top5"].val]
                    )
                i += 1
        if log:
            log[0].close()
        return {k_: m.avg for k_, m in meters.items()}

    def fit(
        self,
        train_loader,
        val_loader,
        *,
        epochs: int,
        state: TrainState | None = None,
        start_epoch: int = 0,
        checkpoint_best: bool = True,
        max_restarts: int = 0,
        video_eval: Callable[[TrainState], dict] | None = None,
        profile_dir: str | None = None,
    ):
        """Epoch loop with per-epoch checkpointing and, with
        ``max_restarts > 0``, crash recovery: an epoch that raises restores
        the last checkpoint and continues (failure-recovery capability the
        reference lacks entirely, SURVEY.md §5.3).  Requires ``cache_dir``.

        ``video_eval``: optional per-epoch video-level evaluation (e.g. a
        closure over :func:`ctc_tpu.eval.video.evaluate_videos`); must
        return a dict with an ``'mAP'`` key.  When present, mAP is recorded
        in the history/score log and selects the best checkpoint (the
        reference's checkpoints.save stores mAP as the score,
        /root/reference/checkpoints.py:59-76, but its video eval was dead
        code — here it runs inside the training loop).

        ``profile_dir``: collect a ``jax.profiler`` device trace of the
        FIRST trained epoch into this directory
        (:func:`ctc_tpu.utils.profiling.trace` — SURVEY.md §5.1; one epoch
        keeps the trace viewable)."""
        from ctc_tpu.train import checkpoints as ckpt

        if state is None:
            state = self.init_state(next(iter(train_loader)))
        best = -float("inf")
        history = []
        restarts = 0
        score_log = self._csv_writer("score.csv")
        import contextlib

        epoch = start_epoch
        traced = False
        while epoch < epochs:
            try:
                if profile_dir and not traced:
                    from ctc_tpu.utils.profiling import trace

                    ctx = trace(profile_dir)
                else:
                    ctx = contextlib.nullcontext()
                with ctx:
                    state, train_metrics = self.train_epoch(
                        state, train_loader, epoch
                    )
                # only a COMPLETED epoch counts as traced: a crash mid-epoch
                # (max_restarts path) retries with tracing still armed
                traced = traced or bool(profile_dir)
                val_metrics = self.validate(state, val_loader, epoch)
                if video_eval is not None:
                    vm = video_eval(state)
                    val_metrics["mAP"] = float(vm["mAP"])
            except Exception as e:
                if restarts >= max_restarts or not self.cache_dir:
                    raise
                restarts += 1
                state, last_epoch, _ = ckpt.load(self.cache_dir, state)
                print(
                    f"epoch {epoch} failed ({type(e).__name__}: {e}); "
                    f"restored epoch {last_epoch}, restart {restarts}"
                )
                epoch = last_epoch + 1 if last_epoch >= 0 else start_epoch
                continue
            history.append({"train": train_metrics, "val": val_metrics})
            if score_log:
                row = [epoch, train_metrics["loss"], val_metrics["loss"],
                       val_metrics["top1"], val_metrics["top5"]]
                if "mAP" in val_metrics:
                    row.append(val_metrics["mAP"])
                score_log[1].writerow(row)
                score_log[0].flush()
            if self.cache_dir:
                score = val_metrics.get("mAP", val_metrics["top1"])
                is_best = score > best
                best = max(best, score)
                ckpt.save(
                    self.cache_dir, state, epoch, score=score, is_best=is_best,
                )
            epoch += 1
        if score_log:
            score_log[0].close()
        return state, history
