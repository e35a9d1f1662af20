"""Pure-functional environment: reset/observe/step semantics + teacher rollout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.env import env as E
from curriculum_learning_for_vln_tpu.env.host_env import R2RBatchEnv
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.utils.angles import ANGLE_INC, make_angle_feat_np


@pytest.fixture(scope="module")
def setup(synth_world, synth_dataset, tokenizer):
    data = expand_r2r_items(synth_dataset, tokenizer)
    henv = R2RBatchEnv(synth_world, data, batch_size=8, tokenizer=tokenizer, seed=1)
    tables = synth_world.device_tables()
    return synth_world, henv, tables


def test_reset_snaps_heading(setup):
    world, henv, tables = setup
    ep = henv.next_batch()
    state = E.reset(tables, ep)
    # heading snapped to 30-degree grid, elevation 0, view row = level
    h_idx = np.mod(np.round(np.asarray(ep.start_heading) / ANGLE_INC), 12)
    assert np.array_equal(np.asarray(state.view_idx), 12 + h_idx.astype(np.int64))
    assert np.allclose(np.asarray(state.heading), h_idx * ANGLE_INC, atol=1e-6)
    assert not np.asarray(state.ended).any()


def test_observe_shapes_and_teacher(setup):
    world, henv, tables = setup
    ep = henv.next_batch()
    state = E.reset(tables, ep)
    obs = E.observe(tables, state)
    B = ep.start_node.shape[0]
    D = tables.feat_dim
    MC = tables.max_candidates
    assert obs.pano_feat.shape == (B, 36, D + 128)
    assert obs.cand_feat.shape == (B, MC + 1, D + 128)
    assert obs.cand_mask.shape == (B, MC + 1)

    nodes = np.asarray(state.node)
    n = np.asarray(obs.n_cands)
    teacher = np.asarray(obs.teacher)
    for b in range(B):
        # teacher index points at the candidate that decreases goal distance optimally
        t = teacher[b]
        assert 0 <= t <= n[b]
        if t < n[b]:
            nxt = int(world.cand_next[nodes[b], t])
            expected = int(world.next_hop[nodes[b], int(np.asarray(state.goal_local)[b])])
            assert nxt == expected
        else:
            assert nodes[b] == int(np.asarray(state.goal)[b])
        # mask: slots beyond stop masked, stop+cands not
        assert not np.asarray(obs.cand_mask)[b, : n[b] + 1].any()
        assert np.asarray(obs.cand_mask)[b, n[b] + 1 :].all()


def test_candidate_features_match_reference_formula(setup):
    world, henv, tables = setup
    ep = henv.next_batch()
    state = E.reset(tables, ep)
    obs = E.observe(tables, state)
    b = 0
    g = int(np.asarray(state.node)[b])
    view = int(np.asarray(state.view_idx)[b])
    base_heading = (view % 12) * ANGLE_INC
    D = tables.feat_dim
    for j in range(int(world.n_cands[g])):
        # angle feature = make_angle_feat(normalized_heading - base, elevation)
        # (ref: common_env.py:281-296)
        loc_heading = world.cand_heading[g, j] - base_heading
        expected_angle = make_angle_feat_np(loc_heading, world.cand_elev[g, j])
        got = np.asarray(obs.cand_feat)[b, j]
        assert np.allclose(got[D:], expected_angle, atol=1e-5)
        expected_img = world.features[g, world.cand_view[g, j]]
        assert np.allclose(got[:D], expected_img, atol=1e-5)
    # STOP slot and padding are zero
    n = int(world.n_cands[g])
    assert np.allclose(np.asarray(obs.cand_feat)[b, n:], 0.0)


def test_step_moves_and_stops(setup):
    world, henv, tables = setup
    ep = henv.next_batch()
    state = E.reset(tables, ep)
    obs = E.observe(tables, state)
    # take teacher action
    state2 = E.step(tables, state, obs.teacher)
    nodes, nodes2 = np.asarray(state.node), np.asarray(state2.node)
    teacher = np.asarray(obs.teacher)
    n = np.asarray(obs.n_cands)
    for b in range(len(nodes)):
        if teacher[b] < n[b]:
            assert nodes2[b] == world.cand_next[nodes[b], teacher[b]]
            assert not np.asarray(state2.ended)[b]
            v = int(np.asarray(state2.view_idx)[b])
            assert np.isclose(np.asarray(state2.heading)[b], (v % 12) * ANGLE_INC)
        else:
            assert nodes2[b] == nodes[b]
            assert np.asarray(state2.ended)[b]
    # stop action (STOP index = n_cands of the *current* node) ends and freezes
    obs2 = E.observe(tables, state2)
    stop = obs2.n_cands
    state3 = E.step(tables, state2, stop)
    assert np.array_equal(np.asarray(state3.node), nodes2)
    # once ended, further moves ignored
    state4 = E.step(tables, state3, jnp.zeros_like(stop))
    assert np.array_equal(np.asarray(state4.node), nodes2)
    assert np.asarray(state4.ended).all()


def test_teacher_rollout_reaches_goal(setup):
    """check_the_code equivalent: pure teacher-following hits SR=1
    (ref: trainer.py:27-39, base.py:484-571)."""
    world, henv, tables = setup

    def teacher_step(state, _):
        obs = E.observe(tables, state)
        new_state = E.step(tables, state, obs.teacher)
        return new_state, state.node

    @jax.jit
    def run(ep):
        state = E.reset(tables, ep)
        state, nodes = jax.lax.scan(teacher_step, state, None, length=12)
        return state, nodes

    ep = henv.next_batch()
    final, _ = run(ep)
    assert np.array_equal(np.asarray(final.node), np.asarray(ep.goal))
    assert np.asarray(final.ended).all()


def test_eval_batches_exact_coverage(setup):
    world, henv, tables = setup
    seen = []
    for ep in henv.eval_batches():
        idx = np.asarray(ep.item_idx)
        valid = np.asarray(ep.valid)
        seen.extend(idx[valid].tolist())
    assert sorted(seen) == list(range(henv.size()))


def test_restart_reuses_batch(setup):
    world, henv, tables = setup
    ep1 = henv.next_batch()
    ep2 = henv.next_batch(restart=True)
    assert np.array_equal(np.asarray(ep1.item_idx), np.asarray(ep2.item_idx))
    ep3 = henv.next_batch()
    # statistically different next batch
    assert not np.array_equal(np.asarray(ep1.item_idx), np.asarray(ep3.item_idx))
