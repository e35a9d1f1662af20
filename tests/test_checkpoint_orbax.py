"""Orbax checkpoint backend (TPU.CKPT_BACKEND=orbax): directory-format
save/load round-trips the full training bundle — including optax
NamedTuple optimizer chains and SPCL curriculum state — identically to
the pickle backend."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from curriculum_learning_for_vln_tpu.engine.checkpoint import (load_checkpoint,
                                                               save_checkpoint)


@pytest.fixture()
def bundle_parts():
    params = {"encoder": {"w": jnp.ones((3, 4)), "b": jnp.zeros(4)},
              "critic": {"fc": {"w": jnp.full((2, 2), 0.5)}}}
    opt = optax.rmsprop(1e-4, decay=0.99, eps=1e-8)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(3)
    cur = {"weight": jnp.arange(7, dtype=jnp.float32), "lamb": jnp.float32(2.0)}
    return opt, params, opt_state, rng, cur


def test_orbax_roundtrip_matches_pickle(tmp_path, bundle_parts):
    opt, params, opt_state, rng, cur = bundle_parts
    p_pkl = os.path.join(tmp_path, "pkl.ckpt")
    p_orb = os.path.join(tmp_path, "orb.ckpt")
    for path, backend in ((p_pkl, "pickle"), (p_orb, "orbax")):
        save_checkpoint(path, params, opt_state, {"bn": jnp.ones(2)}, rng, 5,
                        curriculum=cur, cfg_yaml="A: 1\n", backend=backend)
    assert os.path.isfile(p_pkl) and os.path.isdir(p_orb)

    b_pkl, b_orb = load_checkpoint(p_pkl), load_checkpoint(p_orb)
    flat_p, tree_p = jax.tree_util.tree_flatten(b_pkl)
    flat_o, tree_o = jax.tree_util.tree_flatten(b_orb)
    assert tree_p == tree_o  # exact structure incl. optax NamedTuples
    for a, b in zip(flat_p, flat_o):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored optimizer state drives an update without re-init
    upd, _ = opt.update(jax.tree_util.tree_map(jnp.asarray, b_orb["params"]),
                        jax.tree_util.tree_map(jnp.asarray, b_orb["opt_state"]),
                        jax.tree_util.tree_map(jnp.asarray, b_orb["params"]))
    assert jax.tree_util.tree_structure(upd) == jax.tree_util.tree_structure(params)


def test_orbax_overwrite_latest(tmp_path, bundle_parts):
    """Rotating "latest" checkpoints overwrite the directory atomically."""
    opt, params, opt_state, rng, cur = bundle_parts
    p = os.path.join(tmp_path, "latest.ckpt")
    for epoch in (1, 2, 3):
        save_checkpoint(p, params, opt_state, None, rng, epoch, backend="orbax")
        assert load_checkpoint(p)["epoch"] == epoch
