"""ViLBERT multi-modal pretraining driver + CLR2R difficulty scoring.

The reference ships the heads but no driver (SURVEY §2.1 VLNBert row);
these tests cover the capability-exceed path end to end on a tiny
grounded world."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents.vln_bert import VLNBertScorer
from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
from curriculum_learning_for_vln_tpu.engine.pretrain import (
    VLNBertPretrainer, make_clr2r_rounds, mask_lm_tokens, mask_regions,
    pretrain_batches, score_difficulty, views_along_path)
from curriculum_learning_for_vln_tpu.models.vilbert import VilBertConfig
from curriculum_learning_for_vln_tpu.utils.tokenizer import Tokenizer, build_vocab
from curriculum_learning_for_vln_tpu.world import compiler, synthetic

MAX_PATH = 8
FEAT = 64


def tiny_cfg(vocab_size):
    return VilBertConfig(
        vocab_size=vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=32,
        v_feature_size=FEAT, v_target_size=len(synthetic.ROOM_TYPES),
        v_hidden_size=32, v_num_hidden_layers=2, v_num_attention_heads=4,
        v_intermediate_size=64, bi_hidden_size=32, bi_num_attention_heads=4,
        v_biattention_id=(0, 1), t_biattention_id=(0, 1))


@pytest.fixture(scope="module")
def grounded():
    graphs = synthetic.make_world_graphs(num_scans=2, nodes_per_scan=24, seed=5)
    world = compiler.compile_world(graphs, max_candidates=16, use_native=False)
    rooms = synthetic.assign_rooms(world, seed=5)
    synthetic.attach_grounded_features(world, rooms, feature_dim=FEAT, seed=5)
    items = synthetic.make_grounded_dataset(graphs, world, rooms, num_paths=24, seed=1)
    tok = Tokenizer(build_vocab(items, min_count=1), encoding_length=24)
    data = expand_r2r_items(items, tok)
    return world, rooms, data, tok


def test_mask_lm_tokens_distribution():
    rng = jax.random.PRNGKey(0)
    tokens = jnp.full((64, 32), 10, jnp.int32)
    masked, labels = mask_lm_tokens(rng, tokens, vocab_size=50, mask_idx=1, p=0.15)
    sel = np.asarray(labels >= 0)
    frac = sel.mean()
    assert 0.10 < frac < 0.20          # ~15% selected
    m = np.asarray(masked)[sel]
    assert (m == 1).mean() > 0.6       # ~80% -> [MASK]
    assert np.all(np.asarray(labels)[sel] == 10)
    # special tokens never masked
    specials = jnp.zeros((64, 32), jnp.int32)
    _, labels2 = mask_lm_tokens(rng, specials, 50, 1, p=0.5)
    assert np.all(np.asarray(labels2) == -1)


def test_mask_regions_respects_validity():
    rng = jax.random.PRNGKey(0)
    feats = jnp.ones((16, MAX_PATH, FEAT))
    region_mask = jnp.zeros((16, MAX_PATH)).at[:, :4].set(1.0)
    masked, sel = mask_regions(rng, feats, region_mask, p=0.5)
    sel = np.asarray(sel)
    assert sel[:, 4:].sum() == 0                 # padding never selected
    assert sel[:, :4].sum() > 0
    assert np.all(np.asarray(masked)[sel] == 0.0)


def test_pretrainer_loss_decreases(grounded):
    world, rooms, data, tok = grounded
    cfg = tiny_cfg(tok.vocab_size())
    trainer = VLNBertPretrainer(cfg, mask_idx=1, lr=3e-4)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    def batches(epochs):
        return pretrain_batches(world, data, tok, batch_size=8, max_path_len=MAX_PATH,
                                feat_dim=FEAT, region_classes=rooms,
                                n_region_classes=len(synthetic.ROOM_TYPES),
                                epochs=epochs, seed=0)

    first = None
    params, opt_state, logs0 = trainer.train(params, opt_state,
                                             list(batches(1))[:2], jax.random.PRNGKey(1),
                                             log_every=0)
    first = float(logs0["loss"])
    params, opt_state, logs = trainer.train(params, opt_state, batches(8),
                                            jax.random.PRNGKey(2), log_every=0)
    last = float(logs["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


def test_views_along_path(grounded):
    world, rooms, data, tok = grounded
    item = data[0]
    nodes = [world.global_id(item["scan"], vp) for vp in item["path"]]
    views = views_along_path(world, nodes)
    assert len(views) == len(nodes)
    # each view must be the candidate view toward the next node
    for t in range(len(nodes) - 1):
        g = nodes[t]
        j = [int(world.cand_next[g, k]) for k in range(int(world.n_cands[g]))].index(nodes[t + 1])
        assert views[t] == int(world.cand_view[g, j])


def test_difficulty_scoring_and_rounds(grounded):
    world, rooms, data, tok = grounded
    cfg = tiny_cfg(tok.vocab_size())
    scorer = VLNBertScorer(cfg)
    params, _ = scorer.init(jax.random.PRNGKey(3))
    scores = score_difficulty(scorer, params, world, data, tok,
                              max_path_len=MAX_PATH, feat_dim=FEAT, batch_size=8)
    assert scores.shape == (len(data),)
    assert np.all(np.isfinite(scores))

    rounds = make_clr2r_rounds(data, scores, n_rounds=5)
    assert set(rounds) == {f"round_{k}" for k in range(1, 6)}
    total = sum(len(v) for v in rounds.values())
    assert total == len(data)
    # easiest (highest score) items land in round_1
    ids = {it["instr_id"]: s for it, s in zip(data, scores)}
    r1_min = min(ids[it["instr_id"]] for it in rounds["round_1"])
    r5_max = max(ids[it["instr_id"]] for it in rounds["round_5"])
    assert r1_min >= r5_max
