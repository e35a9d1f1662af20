"""Tensor-parallel ViLBERT: sharded scoring matches replicated scoring."""
import jax
import jax.numpy as jnp
import numpy as np

from curriculum_learning_for_vln_tpu.models.vilbert import (VilBertConfig, vlnbert_apply,
                                                            vlnbert_init)
from curriculum_learning_for_vln_tpu.parallel import mesh as M
from curriculum_learning_for_vln_tpu.parallel.vilbert_sharding import (shard_vilbert_params,
                                                                       vilbert_param_specs)


def tp_cfg():
    return VilBertConfig(
        vocab_size=80, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=32, v_feature_size=48,
        v_target_size=16, v_hidden_size=32, v_num_hidden_layers=2,
        v_num_attention_heads=4, v_intermediate_size=64, bi_hidden_size=32,
        bi_num_attention_heads=4, v_biattention_id=(0, 1), t_biattention_id=(0, 1),
    )


def test_specs_cover_tree():
    cfg = tp_cfg()
    params = vlnbert_init(jax.random.PRNGKey(0), cfg)
    specs = vilbert_param_specs(params)
    # structural match: tree_map succeeds and every leaf gets a spec
    out = jax.tree_util.tree_map(lambda x, s: s is not None, params, specs)
    assert all(jax.tree_util.tree_leaves(out))


def test_tp_sharded_scoring_matches_replicated():
    cfg = tp_cfg()
    params = vlnbert_init(jax.random.PRNGKey(0), cfg)
    B, Lt, Lv = 8, 12, 4
    txt = jnp.ones((B, Lt), jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (B, Lv, cfg.v_feature_size))
    loc = jnp.zeros((B, Lv, 12))

    @jax.jit
    def score(params, txt, imgs, loc):
        logit, _, _, _ = vlnbert_apply(params, cfg, txt, imgs, loc)
        return logit

    ref = np.asarray(score(params, txt, imgs, loc))

    # mesh (data=4, model=2): params TP-sharded, batch dp-sharded
    mesh = M.make_mesh(data=4, model=2)
    with mesh:
        params_tp = shard_vilbert_params(params, mesh)
        txt_s = M.shard_batch(txt, mesh)
        imgs_s = M.shard_batch(imgs, mesh)
        loc_s = M.shard_batch(loc, mesh)
        got = np.asarray(score(params_tp, txt_s, imgs_s, loc_s))
    assert np.allclose(got, ref, atol=1e-4)

    # the q projection really is sharded over 'model'
    q = params_tp["bert"]["t_layers"][0]["attn"]["query"]["w"]
    assert "model" in str(q.sharding.spec)
