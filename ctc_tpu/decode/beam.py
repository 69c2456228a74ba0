"""CTC prefix beam search, TPU-style: static shapes, ``lax.scan`` over time,
vectorized candidate expansion + pairwise prefix merging, ``vmap`` over the
batch.

Classic prefix beam search (Graves 2008 / Hannun 2014) keeps, per prefix, the
probability of ending in blank (``p_b``) and in non-blank (``p_nb``).  Each
step expands every beam by {blank, repeat-last, top-P new classes}, merges
candidates with identical prefixes by log-sum-exp, and keeps the top K.  All
of it is dense tensor work (the merge is an O(N^2 L) equality matrix,
N = K(P+1) — trivial for TPU), so the whole decode jits into one program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG = -1.0e30


def _merge_duplicates(prefixes, lens, p_b, p_nb):
    """Log-sum-exp merge of candidates with identical prefixes.

    Representative = smallest candidate index of each group; all group mass
    moves there, non-representatives drop to -inf.
    """
    n = prefixes.shape[0]
    eq = (lens[:, None] == lens[None, :]) & jnp.all(
        prefixes[:, None, :] == prefixes[None, :, :], axis=-1
    )  # [N, N]
    idx = jnp.arange(n)
    # rep[i] = smallest j with eq[i, j] (eq[i, i] is always True)
    rep = jnp.argmax(eq, axis=1)
    is_rep = rep == idx

    def gather_merge(scores):
        # merged[j] = logsumexp_{i: rep[i] == j} scores[i]
        contrib = jnp.where(rep[:, None] == idx[None, :], scores[:, None], _NEG)
        return jax.scipy.special.logsumexp(contrib, axis=0)

    m_p_b = jnp.where(is_rep, gather_merge(p_b), _NEG)
    m_p_nb = jnp.where(is_rep, gather_merge(p_nb), _NEG)
    return m_p_b, m_p_nb


def _step(state, lp_t, active, *, beam_width, prune, blank, max_len):
    prefixes, lens, p_b, p_nb = state  # [K,Lmax], [K], [K], [K]
    k = beam_width

    top_lp, top_cls = jax.lax.top_k(lp_t, prune)  # [P]
    lp_blank = lp_t[blank]
    last = jnp.take_along_axis(
        prefixes, jnp.clip(lens - 1, 0, max_len - 1)[:, None], axis=1
    )[:, 0]  # [K]
    has_last = lens > 0

    # --- unchanged-prefix candidates (K) ---
    u_p_b = jnp.logaddexp(p_b, p_nb) + lp_blank
    lp_last = jnp.where(has_last, lp_t[jnp.clip(last, 0, None)], _NEG)
    u_p_nb = jnp.where(has_last, p_nb + lp_last, _NEG)

    # --- extension candidates (K x P) ---
    cls = jnp.broadcast_to(top_cls[None, :], (k, prune))  # [K,P]
    clp = jnp.broadcast_to(top_lp[None, :], (k, prune))
    same_as_last = has_last[:, None] & (cls == last[:, None])
    base = jnp.where(
        same_as_last, p_b[:, None], jnp.logaddexp(p_b, p_nb)[:, None]
    )
    e_p_nb = clp + base  # [K,P]
    e_p_b = jnp.full((k, prune), _NEG)
    beam_alive = jnp.logaddexp(p_b, p_nb)[:, None] > _NEG / 2
    valid_ext = (cls != blank) & (lens[:, None] < max_len) & beam_alive
    e_p_nb = jnp.where(valid_ext, e_p_nb, _NEG)

    ext_prefixes = jnp.broadcast_to(
        prefixes[:, None, :], (k, prune, max_len)
    ).reshape(k * prune, max_len)
    ext_lens = jnp.broadcast_to(lens[:, None], (k, prune)).reshape(-1)
    ext_cls = cls.reshape(-1)
    write_pos = jnp.clip(ext_lens, 0, max_len - 1)
    ext_prefixes = jax.vmap(lambda p, pos, c: p.at[pos].set(c))(
        ext_prefixes, write_pos, ext_cls
    )
    ext_ok = (ext_cls != blank) & (ext_lens < max_len)
    new_ext_lens = jnp.where(ext_ok, ext_lens + 1, -7)  # invalid -> len -7

    cand_prefixes = jnp.concatenate([prefixes, ext_prefixes], axis=0)
    cand_lens = jnp.concatenate([lens, new_ext_lens], axis=0)
    cand_p_b = jnp.concatenate([u_p_b, e_p_b.reshape(-1)], axis=0)
    cand_p_nb = jnp.concatenate([u_p_nb, e_p_nb.reshape(-1)], axis=0)
    cand_p_nb = jnp.where(cand_lens == -7, _NEG, cand_p_nb)
    cand_p_b = jnp.where(cand_lens == -7, _NEG, cand_p_b)

    m_p_b, m_p_nb = _merge_duplicates(
        cand_prefixes, cand_lens, cand_p_b, cand_p_nb
    )
    total = jnp.logaddexp(m_p_b, m_p_nb)
    _, sel = jax.lax.top_k(total, k)
    new_state = (
        cand_prefixes[sel],
        jnp.maximum(cand_lens[sel], 0),
        m_p_b[sel],
        m_p_nb[sel],
    )
    # frozen once past this sample's input length
    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(active, new, old), new_state, state
    )


@partial(
    jax.jit, static_argnames=("beam_width", "prune", "blank", "max_len")
)
def beam_search_decode(
    logits: jnp.ndarray,
    input_lengths: jnp.ndarray,
    *,
    beam_width: int = 8,
    prune: int = 8,
    blank: int = 0,
    max_len: int | None = None,
):
    """Prefix beam search over ``[T, B, C]`` logits.

    Returns ``(prefixes [B, K, max_len] -1-padded, lengths [B, K],
    scores [B, K])``, beams sorted best-first.
    """
    max_t, batch, num_classes = logits.shape
    if max_len is None:
        max_len = max_t
    prune = min(prune, num_classes)
    log_probs = jax.nn.log_softmax(logits, axis=2)

    def decode_one(lp, length):  # lp [T, C]
        prefixes = jnp.zeros((beam_width, max_len), jnp.int32)
        lens = jnp.zeros((beam_width,), jnp.int32)
        p_b = jnp.full((beam_width,), _NEG).at[0].set(0.0)
        p_nb = jnp.full((beam_width,), _NEG)

        def body(state, inp):
            t, lp_t = inp
            state = _step(
                state, lp_t, t < length,
                beam_width=beam_width, prune=prune, blank=blank,
                max_len=max_len,
            )
            return state, None

        (prefixes, lens, p_b, p_nb), _ = jax.lax.scan(
            body, (prefixes, lens, p_b, p_nb), (jnp.arange(max_t), lp)
        )
        total = jnp.logaddexp(p_b, p_nb)
        order = jnp.argsort(-total)
        prefixes = prefixes[order]
        lens = lens[order]
        total = total[order]
        mask = jnp.arange(max_len)[None, :] < lens[:, None]
        return jnp.where(mask, prefixes, -1), lens, total

    return jax.vmap(decode_one, in_axes=(1, 0))(log_probs, input_lengths)
