"""Golden regression tests (SURVEY.md §4 "Golden/parity"): fixed-seed,
tiny-shape forwards pinned to stored values on the CPU backend. Catches
unintended numeric drift in the frontend and model stacks. Values were
captured on jax 0.9.0 / CPU; tolerances absorb BLAS variation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2i_tpu.audio import FrontendParams, logmel_jnp
from s2i_tpu.models import CANet, GNet, SpeechEncoder


def _signal(n=4000):
    t = np.arange(n) / 16000.0
    x = np.sin(2 * np.pi * 440 * t) + 0.1 * np.cos(2 * np.pi * 97 * t)
    return x.astype(np.float32)


def test_golden_logmel_stats():
    p = FrontendParams(max_frames=32)
    lm = np.asarray(logmel_jnp(jnp.asarray(_signal())[None], p))[0]
    # Pinned statistics of the log-mel output for the fixed tone signal.
    assert lm.shape == (23, 40)
    np.testing.assert_allclose(float(lm.mean()), -10.516380, rtol=1e-4)
    np.testing.assert_allclose(float(lm.max()), 5.292706, rtol=1e-4)
    np.testing.assert_allclose(float(lm[10, 14]), -13.301148, rtol=1e-3)


def test_golden_generator_forward():
    g = GNet(gf_dim=8, branch_num=2, num_res=1)
    z = jnp.asarray(np.linspace(-1, 1, 2 * 16, dtype=np.float32).reshape(2, 16))
    c = jnp.asarray(np.linspace(1, -1, 2 * 8, dtype=np.float32).reshape(2, 8))
    v = g.init(jax.random.key(123), z, c)
    imgs = g.apply(v, z, c, train=False)
    out = np.asarray(imgs[-1])
    assert out.shape == (2, 128, 128, 3)
    # pinned under the orthogonal conv init (StackGAN-v2 weights_init
    # lineage, layers.conv_init); was 3.81747e-4 under the round-1..3
    # N(0, 0.02) DCGAN init
    np.testing.assert_allclose(float(np.abs(out).mean()), 8.146852e-2, rtol=5e-2)


def test_golden_encoder_forward():
    enc = SpeechEncoder(
        emb_dim=64, conv_channels=(8,), rnn_hidden=8, n_classes=0
    )
    feats = jnp.asarray(
        np.sin(np.arange(2 * 16 * 10, dtype=np.float32)).reshape(2, 16, 10)
    )
    v = enc.init(jax.random.key(7), feats, train=False)
    emb = enc.apply(v, feats, train=False)
    assert emb.shape == (2, 64)
    np.testing.assert_allclose(float(np.abs(np.asarray(emb)).mean()), 0.226808, rtol=2e-2)


@pytest.fixture(autouse=True)
def _pin_backend():
    assert jax.default_backend() == "cpu"
