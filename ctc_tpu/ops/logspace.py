"""Log-space numerics for the CTC-family lattices.

The reference implementation (see ``/root/reference/NoBlankCTC.py:25``) uses a
finite sentinel ``-1e13`` instead of ``-inf`` as "log zero".  A true ``-inf``
produces NaNs in gradients wherever ``-inf - (-inf)`` appears inside a
log-sum-exp, so the sentinel is load-bearing for gradient parity and we mirror
it exactly.  At float32, ``exp(NEG_SENTINEL - x)`` underflows to exactly 0 for
any practically reachable ``x``, so the sentinel behaves as an exact log-zero
in every log-add while keeping all gradients finite.
"""

from __future__ import annotations

import jax.numpy as jnp

# The reference's ``zero_padding`` value (/root/reference/NoBlankCTC.py:25).
NEG_SENTINEL = -1.0e13

# Log-zero for the *blank* CTC lattice (torch.nn.CTCLoss uses true -inf; a
# finite sentinel keeps gradients NaN-free, and at float32 exp(BLANK_NEG - x)
# underflows to exactly 0 for any reachable x, so it is an exact log-zero).
BLANK_NEG = -1.0e30

# torch.nn.BCELoss clamps each log term at -100 so that a saturated sigmoid
# contributes a large-but-finite penalty with zero gradient; mirrored for
# loss/grad parity with the reference's BCE-emission lattice
# (/root/reference/NoBlankBinaryCTC.py:26,112).
BCE_LOG_CLAMP = -100.0


def clamped_log_sigmoid_pair(logits: jnp.ndarray):
    """Return ``(clamp(log sigmoid(x)), clamp(log(1 - sigmoid(x))))``.

    Computed stably from logits: ``log p = -softplus(-x)`` and
    ``log (1-p) = -softplus(x)``, each clamped at ``BCE_LOG_CLAMP`` to match
    torch.nn.BCELoss semantics (clamp has zero gradient once saturated).
    """
    log_p = -jnp.logaddexp(0.0, -logits)
    log_1mp = -jnp.logaddexp(0.0, logits)
    return (
        jnp.maximum(log_p, BCE_LOG_CLAMP),
        jnp.maximum(log_1mp, BCE_LOG_CLAMP),
    )
