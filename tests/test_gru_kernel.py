"""Fused Pallas GRU kernel: forward and gradient equivalence against the
lax.scan reference (interpreter mode on the CPU mesh), including masking,
padding paths, and aligned shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2i_tpu.ops.gru_kernel import fused_gru, gru_scan_reference


def _inputs(t=9, b=3, h=5, seed=0, full_mask=False):
    rng = np.random.default_rng(seed)
    xw = jnp.asarray(rng.standard_normal((t, b, 3 * h)).astype(np.float32))
    w_h = jnp.asarray(
        (rng.standard_normal((h, 3 * h)) * 0.3).astype(np.float32)
    )
    b_h = jnp.asarray(rng.standard_normal(3 * h).astype(np.float32) * 0.1)
    if full_mask:
        mask = jnp.ones((t, b), jnp.float32)
    else:
        lens = rng.integers(t // 2, t + 1, b)
        mask = jnp.asarray(
            (np.arange(t)[:, None] < lens[None, :]).astype(np.float32)
        )
    h0 = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32) * 0.5)
    return xw, w_h, b_h, mask, h0


@pytest.mark.parametrize("shape", [(9, 3, 5), (6, 8, 128), (4, 2, 130)])
def test_forward_matches_scan(shape):
    t, b, h = shape
    args = _inputs(t, b, h, seed=t)
    ys = fused_gru(*args)
    want = gru_scan_reference(*args)
    assert ys.shape == (t, b, h)
    np.testing.assert_allclose(
        np.asarray(ys), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_masking_freezes_state():
    args = _inputs(8, 2, 4, seed=1)
    xw, w_h, b_h, mask, h0 = args
    mask = mask.at[5:, 0].set(0.0)
    ys = np.asarray(fused_gru(xw, w_h, b_h, mask, h0))
    np.testing.assert_allclose(ys[5:, 0], np.broadcast_to(ys[4, 0], (3, 4)))


@pytest.mark.parametrize("seed", [0, 3])
def test_gradients_match_scan(seed):
    args = _inputs(7, 2, 4, seed=seed)

    def loss_fused(xw, w_h, b_h, h0):
        return jnp.sum(jnp.sin(fused_gru(xw, w_h, b_h, args[3], h0)))

    def loss_scan(xw, w_h, b_h, h0):
        return jnp.sum(jnp.sin(gru_scan_reference(xw, w_h, b_h, args[3], h0)))

    diff_args = (args[0], args[1], args[2], args[4])
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*diff_args)
    g2 = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(*diff_args)
    names = ["dxw", "dwh", "dbh", "dh0"]
    for n, a, b_ in zip(names, g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5, err_msg=n
        )


def test_gradients_with_full_mask_aligned_shapes():
    args = _inputs(5, 8, 128, seed=2, full_mask=True)

    def loss(f):
        return lambda *a: jnp.sum(f(a[0], a[1], a[2], args[3], a[3]) ** 2)

    diff_args = (args[0], args[1], args[2], args[4])
    g1 = jax.grad(loss(fused_gru), argnums=(0, 1, 2, 3))(*diff_args)
    g2 = jax.grad(loss(gru_scan_reference), argnums=(0, 1, 2, 3))(*diff_args)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5
        )


def test_grulayer_pallas_matches_scan_path():
    """GRULayer with use_pallas forced on (interpret mode) vs the scan path,
    including the reverse direction."""
    from s2i_tpu.models.encoder import GRULayer

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 6)).astype(np.float32))
    mask = jnp.asarray(
        (np.arange(9)[None, :] < np.array([[9], [5]])).reshape(2, 9)
    )
    for reverse in (False, True):
        l_scan = GRULayer(hidden=4, reverse=reverse, use_pallas=False)
        l_pal = GRULayer(hidden=4, reverse=reverse, use_pallas=True)
        v = l_scan.init(jax.random.key(0), x, mask)
        a = np.asarray(l_scan.apply(v, x, mask))
        b = np.asarray(l_pal.apply(v, x, mask))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
