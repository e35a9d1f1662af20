"""Two-stream ViLBERT + VLN-BERT scorer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.agents.vln_bert import VLNBertScorer, path_scorer_inputs
from curriculum_learning_for_vln_tpu.models.vilbert import (VilBertConfig, convert_torch_state_dict,
                                                            vilbert_apply, vilbert_init,
                                                            vlnbert_apply, vlnbert_init)


def tiny_cfg():
    return VilBertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40, v_feature_size=48,
        v_target_size=20, v_hidden_size=24, v_num_hidden_layers=2,
        v_num_attention_heads=4, v_intermediate_size=48, bi_hidden_size=40,
        bi_num_attention_heads=4, v_biattention_id=(0, 1), t_biattention_id=(1, 2),
    )


def test_vilbert_shapes_and_jit():
    cfg = tiny_cfg()
    params = vilbert_init(jax.random.PRNGKey(0), cfg)
    B, Lt, Lv = 2, 10, 6
    txt = jnp.ones((B, Lt), jnp.int32)
    imgs = jnp.ones((B, Lv, cfg.v_feature_size))
    loc = jnp.zeros((B, Lv, 12))
    mask = jnp.ones((B, Lt))

    @jax.jit
    def run(params, txt, imgs, loc, mask):
        return vilbert_apply(params, cfg, txt, imgs, loc, attention_mask=mask)

    seq_t, seq_v, pooled_t, pooled_v = run(params, txt, imgs, loc, mask)
    assert seq_t.shape == (B, Lt, cfg.hidden_size)
    assert seq_v.shape == (B, Lv, cfg.v_hidden_size)
    assert pooled_t.shape == (B, cfg.bi_hidden_size)
    assert pooled_v.shape == (B, cfg.bi_hidden_size)
    for x in (seq_t, seq_v, pooled_t, pooled_v):
        assert np.all(np.isfinite(np.asarray(x)))


def test_attention_mask_suppresses_padding():
    cfg = tiny_cfg()
    params = vilbert_init(jax.random.PRNGKey(0), cfg)
    B, Lt, Lv = 1, 8, 4
    txt = jnp.array([[5, 6, 7, 8, 0, 0, 0, 0]], jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (B, Lv, cfg.v_feature_size))
    loc = jnp.zeros((B, Lv, 12))
    mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]], jnp.float32)
    out1 = vilbert_apply(params, cfg, txt, imgs, loc, attention_mask=mask)
    # changing a masked token's id must not change pooled outputs
    txt2 = txt.at[0, 6].set(42)
    out2 = vilbert_apply(params, cfg, txt2, imgs, loc, attention_mask=mask)
    assert np.allclose(np.asarray(out1[2]), np.asarray(out2[2]), atol=1e-5)
    assert np.allclose(np.asarray(out1[3]), np.asarray(out2[3]), atol=1e-5)


@pytest.mark.parametrize("fusion", ["sum", "mul"])
def test_vlnbert_scorer(fusion):
    cfg = tiny_cfg()
    cfg.fusion_method = fusion
    scorer = VLNBertScorer(cfg)
    params, _ = scorer.init(jax.random.PRNGKey(0))
    B, Lt, Lv = 3, 10, 5
    txt = jnp.ones((B, Lt), jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (B, Lv, cfg.v_feature_size))
    loc = jnp.zeros((B, Lv, 12))
    logit, vis_pred, lang_pred, seq_rel = scorer.apply(params, txt, imgs, loc)
    assert logit.shape == (B, 1)
    assert vis_pred.shape == (B, Lv, cfg.v_target_size)
    assert lang_pred.shape == (B, Lt, cfg.vocab_size)
    assert seq_rel.shape == (B, 2)
    scores = scorer.score_paths(params, txt, imgs, loc)
    assert scores.shape == (B,)


def test_torch_checkpoint_conversion():
    """Round-trip a torch-style state_dict for the text embedding + pooler."""
    cfg = tiny_cfg()
    params = vlnbert_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    word = rng.standard_normal((cfg.vocab_size, cfg.hidden_size)).astype(np.float32)
    pooler_w = rng.standard_normal((cfg.bi_hidden_size, cfg.hidden_size)).astype(np.float32)
    sd = {
        "bert.embeddings.word_embeddings.weight": word,
        "bert.t_pooler.dense.weight": pooler_w,
        "bert.t_pooler.dense.bias": np.zeros(cfg.bi_hidden_size, np.float32),
        "bert.encoder.layer.0.attention.self.query.weight":
            rng.standard_normal((cfg.hidden_size, cfg.hidden_size)).astype(np.float32),
        "cls.predictions.bias": rng.standard_normal(cfg.vocab_size).astype(np.float32),
    }
    out = convert_torch_state_dict(sd, cfg, params)
    assert np.allclose(np.asarray(out["bert"]["embeddings"]["word"]), word)
    assert np.allclose(np.asarray(out["bert"]["t_pooler"]["w"]), pooler_w.T)
    assert np.allclose(np.asarray(out["cls"]["decoder_bias"]), sd["cls.predictions.bias"])
    assert np.allclose(
        np.asarray(out["bert"]["t_layers"][0]["attn"]["query"]["w"]),
        sd["bert.encoder.layer.0.attention.self.query.weight"].T)
    # untouched leaves keep their init values
    assert np.allclose(np.asarray(out["bert"]["v_pooler"]["w"]),
                       np.asarray(params["bert"]["v_pooler"]["w"]))


def test_path_scorer_inputs(synth_world):
    w = synth_world
    scan = w.scan_ids[0]
    # a 4-node path within the scan
    nodes = [0, int(w.cand_next[0, 0]), 0, int(w.cand_next[0, 0])]
    views = [int(w.cand_view[0, 0])] * 4
    feats, locs, mask = path_scorer_inputs(w, scan, nodes, views, max_path_len=6, feat_dim=64)
    assert feats.shape == (6, 64) and locs.shape == (6, 12) and mask.shape == (6,)
    assert mask.sum() == 4
    assert np.all(locs[:4, 11] == [0, 1, 2, 3])
    # orientation slots are unit-circle pairs
    assert np.allclose(locs[0, 5] ** 2 + locs[0, 6] ** 2, 1.0, atol=1e-5)


def test_config_json_roundtrip(tmp_path):
    """VilBertConfig from_dict/from_json_file/to_dict/to_json_string parity
    with the reference BertConfig contract (vilbert.py:129-272), including
    unknown-key tolerance (HF config.json files carry extras)."""
    cfg = tiny_cfg()
    d = cfg.to_dict()
    assert d["v_biattention_id"] == list(cfg.v_biattention_id)
    cfg2 = VilBertConfig.from_dict({**d, "unknown_hf_key": 123})
    assert cfg2 == cfg

    p = tmp_path / "config.json"
    p.write_text(cfg.to_json_string())
    cfg3 = VilBertConfig.from_json_file(str(p))
    assert cfg3 == cfg


def test_mean_pooling_masked_and_variant():
    """pool_method="mean": pooled outputs are the masked mean of the
    stream (padding-invariant), and differ from the reference-parity
    "first" pooling.  The mean option exists because from-scratch
    tiny-scale pretraining saddles under position-0 pooling (see
    VilBertConfig.pool_method; measured in scripts/clr2r_e2e.py)."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg(), pool_method="mean")
    params = vilbert_init(jax.random.PRNGKey(0), cfg)
    B, Lt, Lv = 2, 8, 4
    txt = jnp.array([[5, 6, 7, 8, 0, 0, 0, 0], [9, 10, 0, 0, 0, 0, 0, 0]], jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (B, Lv, cfg.v_feature_size))
    loc = jnp.zeros((B, Lv, 12))
    mask = (txt != 0).astype(jnp.float32)
    imask = jnp.array([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.float32)
    out = vilbert_apply(params, cfg, txt, imgs, loc, attention_mask=mask,
                        image_attention_mask=imask)
    # padding-invariance: changing a masked token / region leaves pooled alone
    txt2 = txt.at[0, 6].set(42)
    imgs2 = imgs.at[1, 3].set(7.0)
    out2 = vilbert_apply(params, cfg, txt2, imgs2, loc, attention_mask=mask,
                         image_attention_mask=imask)
    assert np.allclose(np.asarray(out[2]), np.asarray(out2[2]), atol=1e-5)
    assert np.allclose(np.asarray(out[3]), np.asarray(out2[3]), atol=1e-5)
    # differs from "first" pooling on the same params/inputs
    cfg_first = dataclasses.replace(cfg, pool_method="first")
    out_first = vilbert_apply(params, cfg_first, txt, imgs, loc, attention_mask=mask,
                              image_attention_mask=imask)
    assert not np.allclose(np.asarray(out[2]), np.asarray(out_first[2]), atol=1e-4)
