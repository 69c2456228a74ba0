"""On-chip spot-validation of the REAL Mosaic-compiled kernels at the fuzz
suite's adversarial geometries (VERDICT r4 weak #3: the randomized
`tests/test_kernel_fuzz.py` sweep runs interpret-mode only, which does not
exercise Mosaic lowering), plus the new boundary-init shard kernels
(`noblank_shard_lattice_pallas` / `blank_shard_lattice_pallas`) chained
into an emulated multi-shard pipeline on the single chip.

One TPU-claiming python; budget-bounded (a handful of tiny geometries, one
process, compile-cache reuse).  Writes VALIDATE_FUZZ_r5.json.
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp


# CPU smoke mode: FUZZ_INTERPRET=1 runs the kernels in interpret mode
INTERP = bool(os.environ.get("FUZZ_INTERPRET"))


def _delta(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.max(np.abs(a - b)) if a.size else 0.0
    scale = max(np.max(np.abs(b)), 1e-9)
    return float(d), float(d / scale)


def case_noblank(T, B, C, L, seed):
    """no_blank_ctc_loss pallas vs xla: loss value + d(loss)/d(logits)."""
    from ctc_tpu import losses

    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    paths = jnp.asarray(rng.integers(0, C, size=(B, L)).astype(np.int32))
    in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
    tgt_len = jnp.asarray(
        np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len))
    )

    def run(impl):
        f = lambda x: losses.no_blank_ctc_loss(
            x, paths, in_len, tgt_len, implementation=impl, interpret=INTERP
        )
        return jax.value_and_grad(f)(logits)

    (v_p, g_p), (v_x, g_x) = run("pallas"), run("xla")
    dv, _ = _delta(v_p, v_x)
    dg, dg_rel = _delta(g_p, g_x)
    return {"value_delta": dv, "grad_max_delta": dg,
            "grad_rel_delta": dg_rel}


def case_binary(T, B, C, L, seed):
    from ctc_tpu import losses

    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    paths = jnp.asarray((rng.random((B, L, C)) < 0.2).astype(np.float32))
    in_len = jnp.asarray(np.full((B,), T, np.int64))
    tgt_len = jnp.asarray(rng.integers(1, L + 1, size=B))

    def run(impl):
        f = lambda x: losses.no_blank_binary_ctc_loss(
            x, paths, in_len, tgt_len, implementation=impl, interpret=INTERP
        )
        return jax.value_and_grad(f)(logits)

    (v_p, g_p), (v_x, g_x) = run("pallas"), run("xla")
    dv, _ = _delta(v_p, v_x)
    dg, dg_rel = _delta(g_p, g_x)
    return {"value_delta": dv, "grad_max_delta": dg,
            "grad_rel_delta": dg_rel}


def case_blank(T, B, C, L, seed):
    from ctc_tpu import losses

    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    targets = np.asarray(rng.integers(1, C, size=(B, max(L, 1))), np.int32)
    targets[:, 1::2] = targets[:, ::2][:, : targets[:, 1::2].shape[1]]
    targets = jnp.asarray(targets)
    in_len = jnp.asarray(np.full((B,), T, np.int64))
    tgt_len = jnp.asarray(rng.integers(0, L + 1, size=B))

    def run(impl):
        f = lambda x: losses.ctc_loss(
            x, targets, in_len, tgt_len, implementation=impl, interpret=INTERP
        )
        return jax.value_and_grad(f)(logits)

    (v_p, g_p), (v_x, g_x) = run("pallas"), run("xla")
    dv, _ = _delta(v_p, v_x)
    dg, dg_rel = _delta(g_p, g_x)
    return {"value_delta": dv, "grad_max_delta": dg,
            "grad_rel_delta": dg_rel}


def case_noblank_chain(T, B, L, n_shards, seed):
    """Emulated n-shard pipeline on one chip: chain the boundary-init
    shard kernels sequentially (boundary row handed shard->shard in-program)
    vs the unsharded XLA custom_vjp — value + d/d(emissions)."""
    from ctc_tpu.ops import lattice_xla
    from ctc_tpu.ops.lattice_pallas import (
        NEG_SENTINEL,
        boundary_width,
        noblank_shard_lattice_pallas,
    )

    rng = np.random.default_rng(seed)
    em = jnp.asarray(
        (rng.standard_normal((T, B, L)) - 1).astype(np.float32)
    )
    in_len = jnp.asarray(rng.integers(1, T + 1, size=B))
    tgt_len = jnp.asarray(
        np.minimum(rng.integers(1, L + 1, size=B), np.asarray(in_len))
    )
    t_s = T // n_shards
    w = boundary_width(L, "tlb")

    def chain(em_in):
        em_tlb = jnp.pad(
            jnp.transpose(em_in, (0, 2, 1)), ((0, 0), (0, w - L), (0, 0))
        )
        std_init = (
            jnp.full((B, w), NEG_SENTINEL, jnp.float32).at[:, 0].set(0.0)
        )
        sent = jnp.full((B, w), NEG_SENTINEL, jnp.float32)
        boundary = std_init
        finals = jnp.zeros((B,), jnp.float32)
        for k in range(n_shards):
            stay0 = std_init if k == 0 else boundary
            adv0 = sent if k == 0 else boundary
            f, boundary = noblank_shard_lattice_pallas(
                em_tlb[k * t_s:(k + 1) * t_s], stay0, adv0,
                in_len - k * t_s, tgt_len, "tlb", INTERP, None,
            )
            finals = finals + f
        return jnp.sum(-finals)

    def unsharded(em_in):
        return jnp.sum(lattice_xla.noblank_lattice_nll(em_in, in_len,
                                                       tgt_len))

    (v_c, g_c) = jax.value_and_grad(jax.jit(chain))(em)
    (v_u, g_u) = jax.value_and_grad(jax.jit(unsharded))(em)
    dv, _ = _delta(v_c, v_u)
    dg, dg_rel = _delta(g_c, g_u)
    return {"value_delta": dv, "grad_max_delta": dg,
            "grad_rel_delta": dg_rel}


def case_blank_chain(T, B, C, L, n_shards, seed):
    """Emulated n-shard blank pipeline (boundary-init blank kernels) vs the
    unsharded XLA blank loss — value + d/d(logits)."""
    from ctc_tpu import losses
    from ctc_tpu.losses.blank import blank_alpha_init, blank_emissions_and_skip
    from ctc_tpu.ops.blank_lattice_pallas import blank_shard_lattice_pallas
    from ctc_tpu.ops.logspace import BLANK_NEG

    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((T, B, C)).astype(np.float32))
    targets = np.asarray(rng.integers(1, C, size=(B, L)), np.int32)
    targets[:, 1::2] = targets[:, ::2][:, : targets[:, 1::2].shape[1]]
    targets = jnp.asarray(targets)
    in_len = jnp.asarray(rng.integers(2 * L + 1, T + 1, size=B))
    tgt_len = jnp.asarray(rng.integers(0, L + 1, size=B))
    t_s = T // n_shards

    def chain(x):
        em, skip_ok = blank_emissions_and_skip(
            x, targets, 0, pad_multiple=8, layout="tlb", normalize=True
        )
        s_pad = em.shape[1]
        virt = blank_alpha_init(B, s_pad, em.dtype)
        sent = jnp.full((B, s_pad), BLANK_NEG, em.dtype)
        boundary = virt
        finals = jnp.zeros((B,), em.dtype)
        for k in range(n_shards):
            init0 = virt if k == 0 else boundary
            skip0 = sent if k == 0 else boundary
            f, boundary = blank_shard_lattice_pallas(
                em[k * t_s:(k + 1) * t_s], init0, skip0, skip_ok,
                in_len - k * t_s, tgt_len, "tlb", INTERP, None,
            )
            finals = finals + f
        nll = -finals
        return jnp.mean(nll / jnp.maximum(tgt_len, 1).astype(nll.dtype))

    def unsharded(x):
        return losses.ctc_loss(x, targets, in_len, tgt_len,
                               implementation="xla")

    (v_c, g_c) = jax.value_and_grad(jax.jit(chain))(logits)
    (v_u, g_u) = jax.value_and_grad(jax.jit(unsharded))(logits)
    dv, _ = _delta(v_c, v_u)
    dg, dg_rel = _delta(g_c, g_u)
    return {"value_delta": dv, "grad_max_delta": dg,
            "grad_rel_delta": dg_rel}


CASES = [
    # adversarial unsharded geometries (from tests/test_kernel_fuzz.py's
    # families): L=1 minimal lattice, non-tile-divisible batches, short T,
    # wide L at tiny B
    ("noblank_L1_B100_T12", lambda: case_noblank(12, 100, 9, 1, 0)),
    ("noblank_L157_B40_T20", lambda: case_noblank(20, 40, 157, 157, 1)),
    ("binary_B36_C157_L9_T16", lambda: case_binary(16, 36, 157, 9, 2)),
    ("blank_B52_C11_L5_T24", lambda: case_blank(24, 52, 11, 5, 3)),
    # boundary-init shard kernels, emulated 4-shard chains
    ("noblank_chain4_T64_B64_L21",
     lambda: case_noblank_chain(64, 64, 21, 4, 4)),
    ("blank_chain4_T64_B64_L9",
     lambda: case_blank_chain(64, 64, 23, 9, 4, 5)),
]


def main():
    print("devices:", jax.devices(), flush=True)
    results = {}
    ok = True
    for name, fn in CASES:
        try:
            r = fn()
            # pass = grads agree to the known kernel-vs-autodiff band
            # (ROOFLINE: ~2e-4 at grad scale 1); values to 1e-3 absolute
            r["pass"] = bool(
                r["value_delta"] < 1e-3 and r["grad_rel_delta"] < 2e-3
            )
        except Exception as e:  # record, don't abort the artifact
            r = {"error": f"{type(e).__name__}: {e}"}
            r["pass"] = False
        ok = ok and r["pass"]
        print(name, json.dumps(r), flush=True)
        results[name] = r
    out = {"round": 5, "all_pass": ok, "cases": results}
    with open("VALIDATE_FUZZ_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"all_pass": ok}))


if __name__ == "__main__":
    main()
