"""Checkpoint save/load (orbax-backed).

Equivalent of /root/reference/checkpoints.py — save the full training state
(params, batch stats, optimizer state, step/epoch, score) plus a ``best``
copy — except it is actually *called* (the reference never invokes save,
SURVEY.md §2.3) and works multi-host via orbax.
"""

from __future__ import annotations

import os
import shutil
import jax
import orbax.checkpoint as ocp


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(os.path.join(directory, "ckpt")),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save(directory: str, state, epoch: int, *, score: float = 0.0,
         is_best: bool = False) -> None:
    """Persist ``state`` (a TrainState) under ``directory/ckpt/<epoch>``."""
    mgr = _manager(directory)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": epoch,
        "score": score,
    }
    # Re-running training into an existing cache dir (fresh run, no
    # --resume) re-saves an epoch the previous run already wrote: without
    # force orbax silently skips steps older than its latest and the
    # best-copy below finds nothing, and an existing same-numbered step
    # raises StepAlreadyExistsError — delete it first (the reference just
    # overwrites model.pth.tar, checkpoints.py:65)
    if epoch in mgr.all_steps():
        mgr.delete(epoch)
    mgr.save(epoch, args=ocp.args.StandardSave(payload), force=True)
    mgr.wait_until_finished()
    # human-readable per-epoch score file + best copy, like the reference
    # (checkpoints.py:66-76)
    if jax.process_index() == 0:
        with open(os.path.join(directory, f"model_{epoch:03d}_{score:.4f}.txt"),
                  "w") as f:
            f.write(f"epoch {epoch} score {score}\n")
        if is_best:
            src = os.path.join(directory, "ckpt", str(epoch))
            dst = os.path.join(directory, "ckpt_best")
            if os.path.isdir(src):
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                shutil.copytree(src, dst)


def load(directory: str, state, *, epoch: int | None = None):
    """Restore into the structure of ``state``; returns (state, epoch, score).

    Missing checkpoint -> returns the input state unchanged with epoch -1
    (the reference's "no checkpoint found, starting from scratch",
    checkpoints.py:49).
    """
    mgr = _manager(directory)
    step = epoch if epoch is not None else mgr.latest_step()
    if step is None:
        return state, -1, 0.0
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": 0,
        "score": 0.0,
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))

    def _replace(t, r):
        # mesh-trained states: re-place every restored leaf onto the
        # template's sharding so a replicated state restores replicated
        # (a scalar coming back committed to device 0 next to 8-device
        # params would make the jitted step reject the state)
        if isinstance(t, jax.Array):
            return jax.device_put(r, t.sharding)
        return r

    restored = jax.tree_util.tree_map(_replace, template, restored)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, int(restored["epoch"]), float(restored["score"])
