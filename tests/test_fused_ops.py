"""Fused panorama gather+attention: parity and gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.ops import fused
from curriculum_learning_for_vln_tpu.ops import rnn as rnn_ops


@pytest.fixture()
def setup(rng):
    N, V, D, A, B = 20, 36, 128, 128, 8
    features = jnp.asarray(rng.standard_normal((N, V, D)).astype(np.float32))
    loc_embed = jnp.asarray(rng.standard_normal((V, V, A)).astype(np.float32))
    nodes = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    views = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    target = jnp.asarray(rng.standard_normal((B, D + A)).astype(np.float32) * 0.1)
    return nodes, views, features, loc_embed, target


def test_pallas_pano_attn_interpret_parity(setup):
    from curriculum_learning_for_vln_tpu.ops.pallas.pano_attn import pano_attend_pallas

    nodes, views, features, loc_embed, target = setup
    ref, _ = fused.pano_attend_xla(nodes, views, features, loc_embed, target)
    got = pano_attend_pallas(nodes, views, features, loc_embed, target, interpret=True)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_backend_gradients(setup):
    import curriculum_learning_for_vln_tpu.ops.pallas.pano_attn as PA

    nodes, views, features, loc_embed, target = setup

    def loss(t):
        return jnp.sum(fused.pano_attend(nodes, views, features, loc_embed, t) ** 2)

    val_x, grad_x = jax.value_and_grad(loss)(target)

    orig = PA.pano_attend_pallas
    PA.pano_attend_pallas = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        rnn_ops.set_backend("pallas")
        val_p, grad_p = jax.value_and_grad(loss)(target)
    finally:
        rnn_ops.set_backend("xla")
        PA.pano_attend_pallas = orig

    assert np.allclose(float(val_p), float(val_x), rtol=1e-4)
    assert np.allclose(np.asarray(grad_p), np.asarray(grad_x), atol=1e-4)
