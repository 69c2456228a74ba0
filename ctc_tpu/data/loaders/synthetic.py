"""Synthetic dataset loader (CI / smoke runs).

Follows the CLI's head-width convention: verb-index lattices (v_class),
multi-hot object spaces (o_class), combined blank-CTC classes (c_class).
Final-step losses (ce/bce/mlce) get the future label as the target instead of
a lattice path.
"""

from __future__ import annotations

import numpy as np

from ctc_tpu.data.synthetic import synthetic_feature_batches


def _final_step_batches(batches, loss: str):
    """Rewrite lattice batches into final-step classification batches."""
    out = []
    for b in batches:
        b = dict(b)
        future = b["future_target"]
        if loss == "ce":
            b["paths"] = future.astype(np.int32)
        else:  # bce / mlce: one-hot of the future label
            n_cls = b["paths"].shape[-1] if b["paths"].ndim == 3 else None
            one_hot = np.zeros((future.shape[0], n_cls), np.float32)
            one_hot[np.arange(future.shape[0]), future] = 1.0
            b["paths"] = one_hot
        b["target_lengths"] = np.ones_like(b["target_lengths"])
        out.append(b)
    return out


def get(cfg):
    """``cfg.batch_size`` is the PER-HOST batch (DataLoader +
    DistributedSampler semantics, reference datasets/__init__.py:17-20,28):
    multi-host runs generate the same seeded GLOBAL batches on every host
    and keep this host's contiguous row block — the trainer's
    ``make_array_from_process_local_data`` reassembles the identical global
    batch, so an H-host run reproduces the single-host run with batch
    ``H * batch_size`` exactly."""
    import jax

    num_classes = cfg.head_classes
    pc = jax.process_count()
    temporal = max(cfg.temporal, 2)
    # Blank CTC feasibility: a drawn label can equal 0 (the blank id), and
    # torch's skip rule (z[s] != blank) forces such labels through the
    # preceding blank slot — one extra frame.  L <= T/2 keeps every target
    # feasible (the reference's real datasets cap L = adjust_time << T the
    # same way, charades_ver2_c_class.py:333); L == T made one sample per
    # batch infeasible -> sentinel-scale NLL.
    common = dict(
        batch_size=cfg.batch_size * pc,
        temporal=temporal,
        # max(.., 1), not 2: at temporal 2-3 a 2-label path would break the
        # L <= T/2 invariant again (a drawn label equal to the blank id 0
        # needs its preceding blank slot — 3 frames > T)
        max_path=(max(temporal // 2, 1) if cfg.loss == "blank" else None),
        feat_dim=cfg.extract_feat_dim,
        num_classes=num_classes,
        binary=(cfg.loss in ("binary", "bce", "mlce")),
    )
    if cfg.loss == "joint":
        # verb-lattice batches packed with the fixed verb->object map
        common.update(num_classes=cfg.v_class, binary=False)
    train = synthetic_feature_batches(num_batches=8, seed=cfg.manual_seed, **common)
    val = synthetic_feature_batches(num_batches=2, seed=cfg.manual_seed + 1, **common)
    if cfg.loss in ("ce", "bce", "mlce"):
        train = _final_step_batches(train, cfg.loss)
        val = _final_step_batches(val, cfg.loss)
    elif cfg.loss == "joint":
        from ctc_tpu.data.synthetic import pack_joint_batches

        train = pack_joint_batches(train, cfg.o_class)
        val = pack_joint_batches(val, cfg.o_class)
    if pc > 1:
        lo = jax.process_index() * cfg.batch_size
        hi = lo + cfg.batch_size

        def local(batches):
            return [{k: v[lo:hi] for k, v in b.items()} for b in batches]

        train, val = local(train), local(val)
    return train, val


def get_val_video(cfg):
    """Synthetic val_video split + gt_table (the charades loaders'
    ``get_val_video`` contract) so ``--evaluate``'s video mAP and — under
    ``--loss joint`` — the (o, v) relation eval run without Charades data."""
    from ctc_tpu.data.synthetic import synthetic_val_video

    return synthetic_val_video(
        temporal=max(cfg.temporal, 2),
        feat_dim=cfg.extract_feat_dim,
        v_class=cfg.v_class,
        o_class=cfg.o_class,
        seed=cfg.manual_seed,
    )
