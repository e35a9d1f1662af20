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


def test_orbax_crash_recovery_from_old_copy(tmp_path, bundle_parts):
    """A crash between the set-aside rename and the swap leaves only
    <path>.orbax_old; load_checkpoint recovers it in place."""
    opt, params, opt_state, rng, cur = bundle_parts
    p = os.path.join(tmp_path, "latest.ckpt")
    save_checkpoint(p, params, opt_state, None, rng, 1, backend="orbax")
    os.rename(p, p + ".orbax_old")  # simulate the crash window
    assert load_checkpoint(p)["epoch"] == 1
    assert os.path.isdir(p) and not os.path.exists(p + ".orbax_old")


@pytest.mark.parametrize("backend", ["pickle", "orbax"])
def test_async_checkpoint_writes(tmp_path, bundle_parts, backend):
    """TPU.CKPT_ASYNC path: async writes land after wait_for_checkpoints,
    pre_tasks (rotation deletes) are serialized with the writes, and the
    snapshot reflects the state at call time (later mutation of the numpy
    source must not leak in)."""
    from curriculum_learning_for_vln_tpu.engine.checkpoint import \
        wait_for_checkpoints

    opt, params, opt_state, rng, cur = bundle_parts
    params = jax.tree_util.tree_map(np.asarray, params)  # host-mutable

    deleted = []
    p1 = os.path.join(tmp_path, "latest_ep1.ckpt")
    p2 = os.path.join(tmp_path, "latest_ep2.ckpt")
    save_checkpoint(p1, params, opt_state, None, rng, 1, backend=backend,
                    async_write=True)
    params["encoder"]["w"] = params["encoder"]["w"] + 100.0  # rebind, not in-place
    save_checkpoint(p2, params, opt_state, None, rng, 2, backend=backend,
                    async_write=True,
                    pre_tasks=(lambda: deleted.append(os.path.exists(p1)),))
    wait_for_checkpoints()
    assert deleted == [True]  # pre_task ran after p1's write, before p2's
    b1, b2 = load_checkpoint(p1), load_checkpoint(p2)
    np.testing.assert_array_equal(b1["params"]["encoder"]["w"], np.ones((3, 4)))
    np.testing.assert_array_equal(b2["params"]["encoder"]["w"],
                                  np.ones((3, 4)) + 100.0)


def test_async_writer_exception_surfaces(tmp_path, bundle_parts):
    from curriculum_learning_for_vln_tpu.engine.checkpoint import \
        wait_for_checkpoints

    opt, params, opt_state, rng, cur = bundle_parts
    boom = lambda: (_ for _ in ()).throw(RuntimeError("disk full"))
    save_checkpoint(os.path.join(tmp_path, "x.ckpt"), params, backend="pickle",
                    async_write=True, pre_tasks=(boom,))
    with pytest.raises(RuntimeError, match="disk full"):
        wait_for_checkpoints()
