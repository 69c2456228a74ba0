"""bf16 compute-dtype knobs: outputs close to f32 within bf16 tolerance."""

import numpy as np

import jax
import jax.numpy as jnp

from ctc_tpu.models import InceptionI3d, LSTMHead


def test_lstm_head_bf16_close_to_f32(rng):
    feats = jnp.asarray(rng.standard_normal((6, 4, 64)).astype(np.float32))
    f32 = LSTMHead(hidden=12, dropout_rate=0.0)
    bf16 = LSTMHead(hidden=12, dropout_rate=0.0, dtype=jnp.bfloat16)
    variables = f32.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, train=True,
    )
    out32 = f32.apply(variables, feats, train=False)
    out16 = bf16.apply(variables, feats, train=False)
    assert out16.dtype == jnp.float32  # recurrence state stays f32
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), rtol=0.05, atol=0.05
    )


def test_unit3d_bf16_close_to_f32(rng):
    from ctc_tpu.models import Unit3D

    x = jnp.asarray(
        rng.standard_normal((2, 6, 16, 16, 8)).astype(np.float32)
    )
    f32 = Unit3D(12, (3, 3, 3))
    bf16 = Unit3D(12, (3, 3, 3), dtype=jnp.bfloat16)
    variables = f32.init(jax.random.PRNGKey(0), x)
    out32 = f32.apply(variables, x)
    out16 = bf16.apply(variables, x)
    assert out16.dtype == jnp.float32  # BN/activation stay f32
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), rtol=0.1, atol=0.05
    )


def test_i3d_act_dtype_bf16_tracks_f32():
    """InceptionI3d(act_dtype=bf16): inter-layer activations in bf16 track
    the f32 default loosely and share the identical param tree (the
    pixels-MFU experiment knob, docs/PIXELS.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctc_tpu.models.i3d import InceptionI3d

    m32 = InceptionI3d()
    mb = InceptionI3d(dtype=jnp.bfloat16, act_dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((1, 1, 10, 224, 224, 3))
        .astype(np.float32)
    )
    v = m32.init(jax.random.PRNGKey(0), x)
    assert (
        jax.tree_util.tree_structure(v)
        == jax.tree_util.tree_structure(mb.init(jax.random.PRNGKey(0), x))
    )
    f32 = np.asarray(m32.apply(v, x, train=False))
    fb = np.asarray(mb.apply(v, x, train=False))
    rel = np.max(np.abs(f32 - fb)) / (np.max(np.abs(f32)) + 1e-9)
    assert np.isfinite(fb).all()
    assert rel < 0.1, rel  # bf16 through 18 layers: measured ~4%
