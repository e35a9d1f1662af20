"""Serving API: checkpoint -> Navigator -> trajectories."""
import jax
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents import FollowerAgent
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.engine.checkpoint import save_checkpoint
from curriculum_learning_for_vln_tpu.serve import Navigator
from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults

FEAT_DIM = 64


def test_navigator(synth_world, synth_dataset, tokenizer, tmp_path):
    cfg = get_cfg_defaults()
    m = cfg.MODEL.FOLLOWER
    m.WORD_EMB_SIZE = 32
    m.HIDDEN_SIZE = 64
    m.ENC_LAYERS = 1
    agent = FollowerAgent(m, tokenizer.vocab_size(), FEAT_DIM, episode_len=8)
    params, mstate = agent.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "nav.ckpt")
    save_checkpoint(ckpt, params, model_state=mstate, epoch=1)

    nav = Navigator.from_checkpoint(synth_world, agent, ckpt, tokenizer, max_batch=4)

    item = synth_dataset[0]
    out = nav.navigate(item["instructions"][0], scan=item["scan"],
                       start_viewpoint=item["path"][0], heading=item["heading"])
    traj = out["trajectory"]
    assert traj[0][0] == item["path"][0]
    assert 1 <= len(traj) <= 9
    # consecutive trajectory nodes are graph neighbors
    for a, b in zip(traj[:-1], traj[1:]):
        ga = synth_world.global_id(item["scan"], a[0])
        gb = synth_world.global_id(item["scan"], b[0])
        assert gb in synth_world.cand_next[ga][synth_world.cand_valid[ga]]

    # micro-batched requests
    reqs = [{"instruction": it["instructions"][0], "scan": it["scan"],
             "start_viewpoint": it["path"][0], "heading": it["heading"]}
            for it in synth_dataset[:3]]
    outs = nav.navigate_batch(reqs)
    assert len(outs) == 3
    for req, o in zip(reqs, outs):
        assert o["trajectory"][0][0] == req["start_viewpoint"]

    with pytest.raises(AssertionError):
        nav.navigate_batch([reqs[0]] * 9)  # over the micro-batch limit
