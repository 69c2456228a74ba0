"""Experiment configuration.

Dataclass mirror of the reference's argparse flags (/root/reference/opts.py:6-85)
plus TPU-specific knobs; parseable from the command line with the same flag
names (``--v-class``, ``--lr-decay-rate``, ...).  Derived fields (``cache``,
``distributed``) are computed in ``finalize()`` like opts.py:78-83.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field


@dataclass
class Config:
    # data paths (opts.py:9-21)
    rgb_data: str = "./charades/Charades_v1_rgb/"
    rgb_my_data: str = "./charades/Mydata_rgb"
    dataset: str = "charades_ctc_next_pred"
    my_dataset: str = "charades_my_pred"
    train_file: str = "./Charades_v1_train.csv"
    val_file: str = "./Charades_v1_test.csv"
    groundtruth_lookup: str = "./groundtruth.p"
    rgb_arch: str = "i3d"
    rgb_pretrained_weights: str = ""
    features_dir: str = ""  # cached-I3D-features mode (BASELINE config 4)

    # training geometry (opts.py:24-44)
    workers: int = 8
    epochs: int = 20
    start_epoch: int = 0
    batch_size: int = 10
    lr: float = 1e-3
    lr_decay_rate: int = 3
    momentum: float = 0.9
    weight_decay: float = 1e-4
    print_train_freq: int = 10
    print_test_freq: int = 10
    resume: str = ""
    evaluate: bool = False
    # per-epoch video-level mAP inside fit() (the reference's intended
    # val_video path, dead in its code — SURVEY.md §2.3) and the DTW
    # transition metric family in validate (train.py:556-584 intent)
    video_eval: bool = False
    transition_metrics: bool = False
    # --evaluate companion: greedy-decode the label-transition path of every
    # val window (collapse repeats; drop blanks for --loss blank) into
    # decoded_predictions.csv — uses the seq-sharded collective decode when
    # --seq-parallel is on (SURVEY.md §2.4 "greedy decode parity" surface)
    decode: bool = False
    # > 0: decode with prefix beam search of this width instead of greedy
    # (blank loss only — the beam tracks blank/non-blank prefix mass)
    decode_beam: int = 0
    # --evaluate companion: Viterbi time-alignment of each val window's
    # TARGET path (forced alignment over the trained blank-free lattice) to
    # decoded_alignment.csv — noblank/binary losses only
    decode_align: bool = False
    inputsize: int = 224
    extract_feat_dim: int = 1024
    manual_seed: int = 0
    train_size: float = 2.0
    val_size: float = 2.0
    cache_dir: str = "./cache/"
    name: str = "test"
    accum_grad: int = 1
    alpha: float = 1.0  # CE-vs-CTC mixing scale (opts.py:74)

    # class counts + temporal geometry (opts.py:59-67)
    num_low_rank: int = 5
    s_class: int = 16
    o_class: int = 38
    v_class: int = 33
    c_class: int = 157
    temporal: int = 1
    gap: int = 1
    num_trans: int = 1
    node_rnn_size: int = 1024
    edge_rnn_size: int = 1024

    # parallelism (replaces world-size/dist-url/dist-backend, opts.py:48-53)
    num_hosts: int = 1
    host_id: int = 0
    coordinator: str = ""
    data_parallel: int | None = None  # mesh data axis (None = all devices)
    model_parallel: int = 1
    # long-T lattice pipelining (SURVEY.md §5.7): shard the loss's T axis
    # over N devices; microbatches ≥ N shrink the pipeline bubble
    seq_parallel: int = 0
    seq_microbatches: int = 0

    # K optimizer steps per dispatched XLA program (lax.scan over stacked
    # batches) — amortizes per-dispatch latency on remote/tunneled
    # backends; exact K-single-step semantics. Composes with the mesh
    # flags: stacked batches are placed P(None, 'data') and GSPMD
    # partitions the scanned body.
    steps_per_dispatch: int = 1

    # training-health guards + crash recovery (SURVEY.md §5.1-§5.3; the
    # reference's closest artifacts are the unwired VerboseGradients and the
    # pdb post-mortem harness, ctc_exe.py:28-36)
    max_restarts: int = 0       # crash auto-resume: restore ckpt + continue
    skip_nonfinite: bool = False  # drop NaN/Inf updates instead of applying
    grad_norm_freq: int = 0     # log global grad norm every N optimizer steps
    # collect a jax.profiler device trace of the FIRST trained epoch into
    # this directory (view with TensorBoard/xprof — SURVEY.md §5.1)
    profile_dir: str = ""

    # loss/kernel selection (new)
    loss: str = "noblank"  # noblank | binary | blank | joint | ce | bce | mlce
    # --loss joint: scale on the object (binary-CTC) term — its
    # mean-over-classes emissions run ~1/o_class the verb NLL's magnitude
    joint_object_weight: float = 1.0
    lattice_impl: str | None = None  # xla | pallas | None(auto)
    # matmul/conv compute dtype: 'bf16' runs the I3D convs and LSTM matmuls
    # in bfloat16 on the MXU (params, BN, recurrence state stay f32 —
    # tests/test_mixed_precision.py); 'f32' is the parity default
    compute_dtype: str = "f32"  # f32 | bf16
    dropout: float = 0.3
    # end-to-end pixels mode (I3DLSTM; *_pixels datasets): unfreeze the I3D
    # and step it with SGD like the reference's second optimizer
    finetune_i3d: bool = False
    # pixels-mode backbone inter-layer activation dtype: 'bf16' halves
    # conv activation HBM traffic (measured -2.7% step time, docs/PIXELS.md;
    # ~4% relative feature deviation vs f32)
    i3d_act_dtype: str = "f32"  # f32 | bf16
    # frozen-backbone memory bound: extract I3D features in sequential
    # chunks of this many folded clips (0 = one-shot); lets B=32+ pixel
    # batches fit one v5e (one-shot OOMs past ~B=16 at 224^2 x stack 10)
    i3d_chunk: int = 0

    # derived (finalize())
    cache: str = ""
    distributed: bool = False

    def finalize(self) -> "Config":
        self.distributed = self.num_hosts > 1
        self.cache = os.path.join(self.cache_dir, self.name) + os.sep
        os.makedirs(self.cache, exist_ok=True)
        # fail at parse time, not after a multi-minute remote compile: the
        # chunked I3D extraction path requires a frozen backbone and a chunk
        # that divides the folded clip count (I3DLSTM.__call__ re-checks)
        if self.i3d_chunk:
            if self.finetune_i3d:
                raise ValueError(
                    "--i3d-chunk requires a frozen backbone; drop "
                    "--finetune-i3d or --i3d-chunk"
                )
            folded = self.batch_size * self.temporal
            if folded % self.i3d_chunk:
                raise ValueError(
                    f"--i3d-chunk {self.i3d_chunk} must divide "
                    f"batch_size*temporal = {folded}"
                )
        return self

    @property
    def head_classes(self) -> int:
        """Model head width for the selected loss target space: verb-index
        lattices (33), multi-hot object paths/targets (38), combined
        157-class blank CTC, or the joint (verb + object) two-head width
        (reference class-count flags, opts.py:59-62)."""
        return {
            "binary": self.o_class,
            "bce": self.o_class,
            "mlce": self.o_class,
            "blank": self.c_class,
            "joint": self.v_class + self.o_class,
        }.get(self.loss, self.v_class)

    @property
    def head_is_object_space(self) -> bool:
        """True when the head predicts the 38-object space (multi-hot
        losses); decides which gt-table column video eval scores against."""
        return self.loss in ("binary", "bce", "mlce")


def parse(argv=None) -> Config:
    """Parse CLI flags into a Config (same flag spelling as the reference)."""
    parser = argparse.ArgumentParser(description="ctc_tpu training")
    for f in dataclasses.fields(Config):
        if f.name in ("cache", "distributed"):
            continue
        flag = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(flag, action="store_true", default=f.default)
        else:
            # None-defaulted optional ints (e.g. --data-parallel) must still
            # parse as ints, not strings
            typ = (type(f.default) if f.default is not None
                   else (int if "int" in str(f.type) else str))
            parser.add_argument(flag, type=typ, default=f.default)
    ns = parser.parse_args(argv)
    cfg = Config(**{f.name: getattr(ns, f.name)
                    for f in dataclasses.fields(Config)
                    if f.name not in ("cache", "distributed")})
    return cfg.finalize()
