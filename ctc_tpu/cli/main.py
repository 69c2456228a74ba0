"""Experiment driver.

Equivalent of /root/reference/main.py:29-78 — seed, tee, build model +
trainer, build data loaders (string-keyed dataset registry like
datasets/__init__.py:14), optional resume, epoch loop with CSV score logs and
per-epoch checkpoints — with multi-host init and mesh-sharded training when
``num_hosts``/``data_parallel`` say so.

Run: ``python -m ctc_tpu.cli.main --dataset synthetic --epochs 3 ...``
"""

from __future__ import annotations

import importlib
import os

import jax

from ctc_tpu import config as config_lib
from ctc_tpu.models import LSTMHead
from ctc_tpu.train import Trainer
from ctc_tpu.utils import Tee, seed_everything


def get_dataset(cfg):
    """String-keyed dataset dispatch (reference datasets/__init__.py:11-44).

    A dataset module must expose ``get(cfg) -> (train_batches, val_batches)``
    where each is an iterable of batch dicts (see
    :func:`ctc_tpu.train.trainer.make_train_step`).
    """
    module = importlib.import_module(f"ctc_tpu.data.loaders.{cfg.dataset}")
    return module.get(cfg)


def main(argv=None):
    cfg = config_lib.parse(argv)
    if cfg.distributed:
        # must run before ANYTHING initializes the XLA backend
        # (seed_everything touches jax.random)
        from ctc_tpu.parallel.mesh import init_distributed

        init_distributed(cfg.coordinator, cfg.num_hosts, cfg.host_id)
    Tee(os.path.join(cfg.cache, "log.txt"))
    print(f"config: {cfg}")
    seed_everything(cfg.manual_seed)

    # data-parallel mesh (reference DDP wrap, models/__init__.py:33-43):
    # --data-parallel N shards batches over an N-device 'data' axis with
    # pmean gradient exchange; multi-host runs REQUIRE it so per-host models
    # can never silently train unsynced.  --model-parallel/--seq-parallel
    # COMPOSE with it: the mesh grows a second axis and the loss shards its
    # class/T dimension over it while batches stay split over 'data'.
    if cfg.seq_parallel > 1 and cfg.temporal % cfg.seq_parallel:
        raise SystemExit(
            f"--temporal {cfg.temporal} must be divisible by "
            f"--seq-parallel {cfg.seq_parallel} (the lattice T axis is "
            "split into equal shards)"
        )
    # decode compatibility fails HERE, before any compile/eval work (a
    # misconfigured eval run used to pay the full evaluation pass first);
    # gated on the flags that make decode run at all, so training-only
    # invocations carrying a stale decode flag keep working
    if cfg.evaluate and cfg.decode and cfg.decode_beam:
        if cfg.loss != "blank":
            raise SystemExit(
                "--decode-beam needs a blank symbol: use --loss blank"
            )
        if cfg.seq_parallel > 1:
            raise SystemExit(
                "--decode-beam does not compose with --seq-parallel "
                "(greedy decode does)"
            )
    if (cfg.evaluate and cfg.decode_align
            and cfg.loss not in ("noblank", "binary")):
        raise SystemExit(
            "--decode-align force-aligns the blank-free lattice: "
            "use --loss noblank or binary"
        )
    mesh = None
    if cfg.data_parallel is not None or cfg.distributed:
        from ctc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(  # data=None = all remaining devices
            data=cfg.data_parallel,
            model=max(cfg.model_parallel, 1),
            seq=max(cfg.seq_parallel, 1),
        )
        n_data = mesh.shape["data"]
        # --batch-size is per-host (DistributedSampler semantics): the
        # assembled global batch must split evenly over the data axis
        global_batch = cfg.batch_size * jax.process_count()
        if global_batch % n_data:
            raise SystemExit(
                f"--batch-size {cfg.batch_size} × {jax.process_count()} "
                f"hosts = global batch {global_batch} must be divisible by "
                f"the data-parallel axis ({n_data} devices)"
            )
        if cfg.seq_parallel > 1:
            local_b = global_batch // n_data
            m = cfg.seq_microbatches or cfg.seq_parallel
            if local_b % m:
                raise SystemExit(
                    f"per-data-shard batch {local_b} must be divisible by "
                    f"the seq pipeline's microbatch count {m} "
                    "(--seq-microbatches)"
                )
        second = [f"{ax}={n}" for ax, n in dict(mesh.shape).items()
                  if ax != "data" and n > 1]
        print(f"data-parallel: {n_data}-way mesh"
              + (f" × {' '.join(second)}" if second else "")
              + f" ({jax.process_count()} hosts, "
                f"{jax.device_count()} devices)")

    train_batches, val_batches = get_dataset(cfg)

    pixels = cfg.dataset.endswith("_pixels")
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bf16" else None
    if pixels:
        from ctc_tpu.models.i3d_lstm import I3DLSTM

        model = I3DLSTM(
            hidden=cfg.head_classes, dropout_rate=cfg.dropout,
            freeze_backbone=not cfg.finetune_i3d,
            i3d_dtype=dtype,
            i3d_act_dtype=(jnp.bfloat16 if cfg.i3d_act_dtype == "bf16"
                           else None),
            feat_chunk=cfg.i3d_chunk,
        )
    else:
        model = LSTMHead(hidden=cfg.head_classes, dropout_rate=cfg.dropout,
                         dtype=dtype)
    trainer = Trainer(
        model,
        loss_kind=cfg.loss,
        lr=cfg.lr,
        weight_decay=cfg.weight_decay,
        lr_decay_epochs=cfg.lr_decay_rate,
        steps_per_epoch=max(len(train_batches), 1),
        cache_dir=cfg.cache,
        print_freq=cfg.print_train_freq,
        seed=cfg.manual_seed,
        implementation=cfg.lattice_impl,
        ce_weight=(cfg.alpha if cfg.alpha != 1.0 else 0.0),
        accum_grad=cfg.accum_grad,
        print_test_freq=cfg.print_test_freq,
        train_size=cfg.train_size,
        val_size=cfg.val_size,
        i3d_optimizer=(
            {"lr": cfg.lr, "momentum": cfg.momentum,
             "weight_decay": cfg.weight_decay,
             "finetune": cfg.finetune_i3d}
            if pixels else None
        ),
        transition_metrics=cfg.transition_metrics,
        mesh=mesh,
        skip_nonfinite=cfg.skip_nonfinite,
        grad_norm_freq=cfg.grad_norm_freq,
        seq_parallel=cfg.seq_parallel,
        seq_microbatches=cfg.seq_microbatches,
        model_parallel=cfg.model_parallel,
        steps_per_dispatch=cfg.steps_per_dispatch,
        joint_object_weight=cfg.joint_object_weight,
    )

    state = trainer.init_state(train_batches[0])
    if pixels and cfg.rgb_pretrained_weights:
        import torch

        from ctc_tpu.models.i3d import convert_torch_state_dict

        conv = convert_torch_state_dict(
            torch.load(cfg.rgb_pretrained_weights, map_location="cpu")
        )
        params = dict(state.params)
        params["i3d"] = conv["params"]
        stats = dict(state.batch_stats)
        stats["i3d"] = conv["batch_stats"]
        state = state.replace(params=params, batch_stats=stats)
        print("loaded pretrained I3D backbone")
    start_epoch = cfg.start_epoch
    if cfg.resume:
        from ctc_tpu.train import checkpoints as ckpt

        state, epoch, score = ckpt.load(cfg.resume, state)
        if epoch >= 0:
            start_epoch = epoch + 1
            print(f"resumed epoch {epoch} (score {score:.4f})")
        else:
            print("no checkpoint found, starting from scratch")

    if cfg.evaluate:
        metrics = trainer.validate(state, val_batches, epoch=start_epoch)
        print(f"evaluate: {metrics}")
        if cfg.decode:
            # greedy-decoded transition paths per val window (the decode
            # product surface; blank collapse only for the blank loss)
            from ctc_tpu.eval.video import decode_windows

            seq_mesh = None
            if cfg.seq_parallel > 1:
                if mesh is not None and "seq" in mesh.shape:
                    seq_mesh = mesh
                else:
                    import numpy as np
                    from jax.sharding import Mesh

                    seq_mesh = Mesh(
                        np.asarray(jax.devices()[: cfg.seq_parallel]),
                        ("seq",),
                    )
            out_csv = os.path.join(cfg.cache, "decoded_predictions.csv")
            dec = decode_windows(
                model, state, val_batches,
                blank=(0 if cfg.loss == "blank" else -1),
                out_csv=out_csv, seq_mesh=seq_mesh,
                beam_width=cfg.decode_beam,
                # joint (o, v) head: decode the verb transition path
                head_slice=(cfg.v_class if cfg.loss == "joint" else None),
            )
            print(f"decoded transition paths: {len(dec['lengths'])} windows "
                  f"-> {out_csv}")
            metrics["decoded_csv"] = out_csv
        if cfg.decode_align:
            # forced alignment of the TARGET paths (Viterbi over the
            # trained lattice — SURVEY.md §2.4 decode row)
            from ctc_tpu.eval.video import align_windows

            align_csv = os.path.join(cfg.cache, "decoded_alignment.csv")
            ali = align_windows(
                trainer.model, state, val_batches, loss_kind=cfg.loss,
                out_csv=align_csv,
            )
            print(f"aligned target paths: {len(ali['score'])} windows "
                  f"-> {align_csv}")
            metrics["alignment_csv"] = align_csv
        # video-level mAP when the dataset provides a val_video split
        try:
            loader_mod = importlib.import_module(
                f"ctc_tpu.data.loaders.{cfg.dataset}"
            )
            get_vv = getattr(loader_mod, "get_val_video", None)
            if get_vv is not None:
                from ctc_tpu.eval.video import evaluate_videos

                data, gt_table = get_vv(cfg)
                # a precomputed lookup pickle overrides the rebuilt table
                # (reference --groundtruth-lookup, opts.py:19, ctc_exe.py:25)
                if cfg.groundtruth_lookup and os.path.exists(
                    cfg.groundtruth_lookup
                ):
                    from ctc_tpu.utils.groundtruth import load_groundtruth

                    gt_table = load_groundtruth(cfg.groundtruth_lookup)
                    print(f"groundtruth lookup: {cfg.groundtruth_lookup} "
                          f"({len(gt_table)} videos)")
                elif (cfg.groundtruth_lookup
                      != config_lib.Config.groundtruth_lookup):
                    # explicitly requested but missing: say so instead of
                    # silently scoring against the rebuilt table
                    print(f"WARNING: --groundtruth-lookup "
                          f"{cfg.groundtruth_lookup} not found; using the "
                          f"rebuilt gt table")
                if len(data["ids"]) and cfg.loss == "joint":
                    # joint (o, v) head: verb mAP + object mAP + the
                    # relation-tagging metrics (recall@N / precision@N)
                    from ctc_tpu.eval.video import evaluate_videos_joint

                    out = evaluate_videos_joint(
                        model, state, data, gt_table,
                        num_verbs=cfg.v_class, num_objects=cfg.o_class,
                    )
                    rec = " ".join(f"R@{n}={v:.4f}"
                                   for n, v in out["recall_at"].items())
                    prec = " ".join(f"P@{n}={v:.4f}"
                                    for n, v in out["prec_at"].items())
                    print(f"video mAP: {out['mAP']:.4f} "
                          f"(object mAP {out['object_mAP']:.4f})")
                    print(f"relation tagging: mAP {out['relation_mAP']:.4f} "
                          f"{rec} {prec}")
                    metrics["video_mAP"] = out["mAP"]
                    metrics["object_mAP"] = out["object_mAP"]
                    metrics["relation_mAP"] = out["relation_mAP"]
                    metrics["relation_recall_at"] = out["recall_at"]
                    metrics["relation_prec_at"] = out["prec_at"]
                elif len(data["ids"]):
                    out = evaluate_videos(
                        model, state, data, gt_table,
                        num_verbs=cfg.head_classes,
                        # multi-hot heads predict objects: score gt column 1
                        gt_col=(1 if cfg.head_is_object_space else 2),
                    )
                    print(f"video mAP: {out['mAP']:.4f}")
                    metrics["video_mAP"] = out["mAP"]
        except Exception as e:
            print(f"video eval skipped: {e}")
        # own-video qualitative predictions (the reference's my-dataset
        # loader, datasets/__init__.py:22,42)
        try:
            my_mod = importlib.import_module(
                f"ctc_tpu.data.loaders.{cfg.my_dataset}"
            )
            my_data, _ = my_mod.get(cfg)
            if len(my_data["ids"]):
                from ctc_tpu.eval.video import evaluate_own_video

                out_csv = os.path.join(cfg.cache, "myvideo_predictions.csv")
                evaluate_own_video(model, state, my_data, out_csv=out_csv)
                print(f"own-video predictions: {len(my_data['ids'])} windows "
                      f"-> {out_csv}")
        except Exception as e:
            print(f"own-video eval skipped: {e}")
        return metrics

    video_eval = None
    if cfg.video_eval:
        # per-epoch video mAP (reference's intended-but-dead val_video path)
        try:
            loader_mod = importlib.import_module(
                f"ctc_tpu.data.loaders.{cfg.dataset}"
            )
            get_vv = getattr(loader_mod, "get_val_video", None)
            if get_vv is not None:
                from ctc_tpu.eval.video import evaluate_videos

                vv_data, vv_gt = get_vv(cfg)
                if len(vv_data["ids"]) and cfg.loss == "joint":
                    from ctc_tpu.eval.video import evaluate_videos_joint

                    def video_eval(state, _d=vv_data, _g=vv_gt):
                        out = evaluate_videos_joint(
                            model, state, _d, _g,
                            num_verbs=cfg.v_class, num_objects=cfg.o_class,
                        )
                        print(f"video mAP: {out['mAP']:.4f} relation mAP: "
                              f"{out['relation_mAP']:.4f}")
                        return out
                elif len(vv_data["ids"]):
                    def video_eval(state, _d=vv_data, _g=vv_gt):
                        out = evaluate_videos(
                            model, state, _d, _g,
                            num_verbs=cfg.head_classes,
                            gt_col=(1 if cfg.head_is_object_space else 2),
                        )
                        print(f"video mAP: {out['mAP']:.4f}")
                        return out
        except Exception as e:
            print(f"per-epoch video eval disabled: {e}")

    state, history = trainer.fit(
        train_batches,
        val_batches,
        epochs=cfg.epochs,
        state=state,
        start_epoch=start_epoch,
        video_eval=video_eval,
        max_restarts=cfg.max_restarts,
        profile_dir=(cfg.profile_dir or None),
    )
    print(f"done: best val top1 "
          f"{max(h['val']['top1'] for h in history):.3f}")
    return history


if __name__ == "__main__":
    main()
