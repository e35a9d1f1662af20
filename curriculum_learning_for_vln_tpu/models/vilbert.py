"""Two-stream ViLBERT with VLN modifications, pure-JAX functional.

TPU-native rebuild of `tasks/R2R-judy/src/model/vilbert.py` (1593 LoC of
torch) and the path-scoring head `src/agent/vln_bert.py:11-75`:

* text stream (BertLayer stack) and vision stream (BertImageLayer stack)
  with gelu FFNs and post-LN residuals;
* co-attention connection layers (BertBiAttention + BertBiOutput + both
  streams' FFNs) interleaved at the configured biattention layer ids,
  with stop-gradient emulation of the fixed-layer no-grad ranges
  (vilbert.py:758-895);
* VLN-modified image embeddings: location(5) + orientation(4) +
  next-orientation(2) + sequence-position Embedding(32)
  (vilbert.py:1398-1428);
* additive -10000 attention masks and the 5.0-scaled co-attention mask
  (vilbert.py:1340-1375);
* first-token ReLU poolers to bi_hidden, pretraining heads with tied LM
  decoder, and the VLNBert vil_logit path-selection head with sum/mul
  fusion.

Everything is bf16-friendly: matmuls carry preferred f32 accumulation via
jnp.einsum defaults, and the whole scorer jits into a single program.
``convert_torch_state_dict`` maps reference/HF-style checkpoint tensors
onto this parameter tree.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import dense, dropout


@dataclasses.dataclass
class VilBertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    v_feature_size: int = 2048
    v_target_size: int = 1601
    v_hidden_size: int = 768
    v_num_hidden_layers: int = 3
    v_num_attention_heads: int = 12
    v_intermediate_size: int = 3072
    bi_hidden_size: int = 1024
    bi_num_attention_heads: int = 16
    v_attention_probs_dropout_prob: float = 0.1
    v_hidden_dropout_prob: float = 0.1
    v_biattention_id: Tuple[int, ...] = (0, 1)
    t_biattention_id: Tuple[int, ...] = (10, 11)
    fixed_v_layer: int = 0
    fixed_t_layer: int = 0
    fusion_method: str = "mul"
    with_coattention: bool = True
    # "first" = pool position 0 of each stream (reference parity,
    # vilbert.py:970-996 BertTextPooler/BertImagePooler — correct when
    # finetuning a large pretrained checkpoint whose [CLS] already
    # aggregates the sequence).  "mean" = masked mean over valid
    # positions — needed when pretraining small models FROM SCRATCH:
    # position-0 pooling is a saddle there (the input at position 0 is a
    # constant [CLS]/<BOS> embedding, so pooled batch-variance starts
    # near zero and alignment-style objectives collapse it to a dead
    # constant; measured in scripts/clr2r_e2e.py — align acc pinned at
    # 0.50 for 600 steps under "first", learnable under "mean").
    pool_method: str = "first"

    def __post_init__(self):
        assert len(self.v_biattention_id) == len(self.t_biattention_id)
        assert max(self.v_biattention_id) < self.v_num_hidden_layers
        assert max(self.t_biattention_id) < self.num_hidden_layers

    # -- (de)serialization, reference BertConfig contract
    # (ref: vilbert.py:129-272 from_dict/from_json_file/to_dict/to_json_string)
    @classmethod
    def from_dict(cls, json_object: dict) -> "VilBertConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in json_object.items():
            if k in known:
                if k in ("v_biattention_id", "t_biattention_id"):
                    v = tuple(v)
                kwargs[k] = v
        return cls(**kwargs)

    @classmethod
    def from_json_file(cls, json_file: str) -> "VilBertConfig":
        import json

        with open(json_file, encoding="utf-8") as f:
            return cls.from_dict(json.loads(f.read()))

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["v_biattention_id"] = list(d["v_biattention_id"])
        d["t_biattention_id"] = list(d["t_biattention_id"])
        return d

    def to_json_string(self) -> str:
        import json

        return json.dumps(self.to_dict(), indent=2, sort_keys=True) + "\n"


def _normal_init(key, shape, std):
    return jax.random.normal(key, shape) * std


def _linear_init(key, din, dout, std):
    kw, _ = jax.random.split(key)
    return {"w": _normal_init(kw, (din, dout), std), "b": jnp.zeros((dout,))}


def _ln_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p, x, eps: float = 1e-12):
    # stats in f32 even under bf16 compute params (mean/var of ~768-wide
    # rows lose real precision in bf16); output returns to x.dtype so a
    # bf16-cast parameter tree keeps every matmul on the MXU in bf16
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _attention_init(key, q_dim, kv_dim, heads, std):
    ks = jax.random.split(key, 4)
    all_head = q_dim
    return {
        "query": _linear_init(ks[0], q_dim, all_head, std),
        "key": _linear_init(ks[1], kv_dim, all_head, std),
        "value": _linear_init(ks[2], kv_dim, all_head, std),
    }


def _mha(q_p, q_x, kv_x, heads: int, mask, rng, train: bool, drop: float):
    """Multi-head attention core with additive mask (already -10000-form)."""
    B, Lq, _ = q_x.shape
    Lk = kv_x.shape[1]
    q = dense(q_p["query"], q_x)
    k = dense(q_p["key"], kv_x)
    v = dense(q_p["value"], kv_x)
    hd = q.shape[-1] // heads

    def split(x, L):
        return x.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q, Lq), split(k, Lk), split(v, Lk)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    if mask is not None:
        scores = scores + mask  # [B, 1, 1, Lk] additive (f32 -> promotes)
    # softmax in f32, probs back to the activation dtype: under bf16
    # compute the f32 -10000 mask must not promote the ctx matmul off
    # the bf16 MXU path
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    probs = dropout(rng, probs, drop, deterministic=not train)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return ctx.transpose(0, 2, 1, 3).reshape(B, Lq, heads * hd), probs


def _bert_layer_init(key, hidden, heads, inter, std):
    ks = jax.random.split(key, 5)
    return {
        "attn": _attention_init(ks[0], hidden, hidden, heads, std),
        "attn_out": _linear_init(ks[1], hidden, hidden, std),
        "attn_ln": _ln_init(hidden),
        "inter": _linear_init(ks[2], hidden, inter, std),
        "out": _linear_init(ks[3], inter, hidden, std),
        "out_ln": _ln_init(hidden),
    }


def _bert_layer(p, x, mask, heads, rng, train, drop_h, drop_a):
    r = jax.random.split(rng, 3)
    ctx, probs = _mha(p["attn"], x, x, heads, mask, r[0], train, drop_a)
    ctx = dropout(r[1], dense(p["attn_out"], ctx), drop_h, deterministic=not train)
    x = layer_norm(p["attn_ln"], x + ctx)
    h = jax.nn.gelu(dense(p["inter"], x), approximate=False)
    h = dropout(r[2], dense(p["out"], h), drop_h, deterministic=not train)
    return layer_norm(p["out_ln"], x + h), probs


def _connection_layer_init(key, cfg: VilBertConfig):
    std = cfg.initializer_range
    ks = jax.random.split(key, 12)
    bi = cfg.bi_hidden_size
    return {
        # biattention (vilbert.py:589-700): stream1 = vision, stream2 = text
        "q1": _linear_init(ks[0], cfg.v_hidden_size, bi, std),
        "k1": _linear_init(ks[1], cfg.v_hidden_size, bi, std),
        "v1": _linear_init(ks[2], cfg.v_hidden_size, bi, std),
        "q2": _linear_init(ks[3], cfg.hidden_size, bi, std),
        "k2": _linear_init(ks[4], cfg.hidden_size, bi, std),
        "v2": _linear_init(ks[5], cfg.hidden_size, bi, std),
        # biOutput (vilbert.py:698-726)
        "dense1": _linear_init(ks[6], bi, cfg.v_hidden_size, std),
        "ln1": _ln_init(cfg.v_hidden_size),
        "dense2": _linear_init(ks[7], bi, cfg.hidden_size, std),
        "ln2": _ln_init(cfg.hidden_size),
        # per-stream FFNs
        "v_inter": _linear_init(ks[8], cfg.v_hidden_size, cfg.v_intermediate_size, std),
        "v_out": _linear_init(ks[9], cfg.v_intermediate_size, cfg.v_hidden_size, std),
        "v_ln": _ln_init(cfg.v_hidden_size),
        "t_inter": _linear_init(ks[10], cfg.hidden_size, cfg.intermediate_size, std),
        "t_out": _linear_init(ks[11], cfg.intermediate_size, cfg.hidden_size, std),
        "t_ln": _ln_init(cfg.hidden_size),
    }


def _connection_layer(p, cfg: VilBertConfig, v_x, v_mask, t_x, t_mask, co_mask, rng, train):
    heads = cfg.bi_num_attention_heads
    hd = cfg.bi_hidden_size // heads
    B, Lv, _ = v_x.shape
    Lt = t_x.shape[1]
    r = jax.random.split(rng, 6)

    def split(x, L):
        return x.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)

    q1, k1, v1 = split(dense(p["q1"], v_x), Lv), split(dense(p["k1"], v_x), Lv), split(dense(p["v1"], v_x), Lv)
    q2, k2, v2 = split(dense(p["q2"], t_x), Lt), split(dense(p["k2"], t_x), Lt), split(dense(p["v2"], t_x), Lt)

    # text queries attend vision (scores1), vision queries attend text (scores2)
    s1 = jnp.einsum("bhqd,bhkd->bhqk", q2, k1) / math.sqrt(hd) + v_mask
    if co_mask is not None:
        s1 = s1 + jnp.swapaxes(co_mask, -1, -2)
    p1 = dropout(r[0], jax.nn.softmax(s1.astype(jnp.float32), -1).astype(v1.dtype),
                 cfg.v_attention_probs_dropout_prob, deterministic=not train)
    ctx1 = jnp.einsum("bhqk,bhkd->bhqd", p1, v1).transpose(0, 2, 1, 3).reshape(B, Lt, -1)

    s2 = jnp.einsum("bhqd,bhkd->bhqk", q1, k2) / math.sqrt(hd) + t_mask
    if co_mask is not None:
        s2 = s2 + co_mask
    p2 = dropout(r[1], jax.nn.softmax(s2.astype(jnp.float32), -1).astype(v2.dtype),
                 cfg.attention_probs_dropout_prob, deterministic=not train)
    ctx2 = jnp.einsum("bhqk,bhkd->bhqd", p2, v2).transpose(0, 2, 1, 3).reshape(B, Lv, -1)

    # biOutput: ctx2 (text-informed) -> vision stream, ctx1 -> text stream
    v_res = dropout(r[2], dense(p["dense1"], ctx2), cfg.v_hidden_dropout_prob,
                    deterministic=not train)
    v_att = layer_norm(p["ln1"], v_res + v_x)
    t_res = dropout(r[3], dense(p["dense2"], ctx1), cfg.hidden_dropout_prob,
                    deterministic=not train)
    t_att = layer_norm(p["ln2"], t_res + t_x)

    v_h = jax.nn.gelu(dense(p["v_inter"], v_att), approximate=False)
    v_h = dropout(r[4], dense(p["v_out"], v_h), cfg.v_hidden_dropout_prob,
                  deterministic=not train)
    v_out = layer_norm(p["v_ln"], v_att + v_h)
    t_h = jax.nn.gelu(dense(p["t_inter"], t_att), approximate=False)
    t_h = dropout(r[5], dense(p["t_out"], t_h), cfg.hidden_dropout_prob,
                  deterministic=not train)
    t_out = layer_norm(p["t_ln"], t_att + t_h)
    return v_out, t_out


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def vilbert_init(key, cfg: VilBertConfig) -> dict:
    std = cfg.initializer_range
    ks = jax.random.split(key, 16)
    params = {
        "embeddings": {
            "word": _normal_init(ks[0], (cfg.vocab_size, cfg.hidden_size), std),
            "position": _normal_init(ks[1], (cfg.max_position_embeddings, cfg.hidden_size), std),
            "token_type": _normal_init(ks[2], (cfg.type_vocab_size, cfg.hidden_size), std),
            "ln": _ln_init(cfg.hidden_size),
        },
        "v_embeddings": {  # VLN-modified (vilbert.py:1398-1428)
            "image": _linear_init(ks[3], cfg.v_feature_size, cfg.v_hidden_size, std),
            "location": _linear_init(ks[4], 5, cfg.v_hidden_size, std),
            "orientation": _linear_init(ks[5], 4, cfg.v_hidden_size, std),
            "next_orientation": _linear_init(ks[6], 2, cfg.v_hidden_size, std),
            "sequence": _normal_init(ks[7], (32, cfg.v_hidden_size), std),
            "ln": _ln_init(cfg.v_hidden_size),
        },
        "t_layers": [
            _bert_layer_init(jax.random.fold_in(ks[8], i), cfg.hidden_size,
                             cfg.num_attention_heads, cfg.intermediate_size, std)
            for i in range(cfg.num_hidden_layers)
        ],
        "v_layers": [
            _bert_layer_init(jax.random.fold_in(ks[9], i), cfg.v_hidden_size,
                             cfg.v_num_attention_heads, cfg.v_intermediate_size, std)
            for i in range(cfg.v_num_hidden_layers)
        ],
        "c_layers": [
            _connection_layer_init(jax.random.fold_in(ks[10], i), cfg)
            for i in range(len(cfg.v_biattention_id))
        ],
        "t_pooler": _linear_init(ks[11], cfg.hidden_size, cfg.bi_hidden_size, std),
        "v_pooler": _linear_init(ks[12], cfg.v_hidden_size, cfg.bi_hidden_size, std),
    }
    return params


def vilbert_apply(
    params: dict,
    cfg: VilBertConfig,
    input_txt: jnp.ndarray,            # [B, Lt] int32
    input_imgs: jnp.ndarray,           # [B, Lv, v_feature_size]
    image_loc: jnp.ndarray,            # [B, Lv, 12] (5 loc + 4 orient + 2 next + 1 seq-pos)
    token_type_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,       # [B, Lt] 1 = attend
    image_attention_mask: Optional[jnp.ndarray] = None, # [B, Lv]
    co_attention_mask: Optional[jnp.ndarray] = None,    # [B, Lv, Lt]
    rng=None,
    train: bool = False,
):
    """Returns (seq_t, seq_v, pooled_t, pooled_v)."""
    B, Lt = input_txt.shape
    Lv = input_imgs.shape[1]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if attention_mask is None:
        attention_mask = jnp.ones((B, Lt))
    if token_type_ids is None:
        token_type_ids = jnp.zeros((B, Lt), jnp.int32)
    if image_attention_mask is None:
        image_attention_mask = jnp.ones((B, Lv))

    # additive masks (vilbert.py:1340-1362)
    t_mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -10000.0
    v_mask = (1.0 - image_attention_mask[:, None, None, :].astype(jnp.float32)) * -10000.0
    co_mask = None
    if co_attention_mask is not None:
        co_mask = co_attention_mask[:, None].astype(jnp.float32) * 5.0  # (vilbert.py:1369)

    r = jax.random.split(rng, 4)
    emb = params["embeddings"]
    pos_ids = jnp.arange(Lt)
    t_x = emb["word"][input_txt] + emb["position"][pos_ids][None] + emb["token_type"][token_type_ids]
    t_x = layer_norm(emb["ln"], t_x)
    t_x = dropout(r[0], t_x, cfg.hidden_dropout_prob, deterministic=not train)

    ve = params["v_embeddings"]
    v_img = dense(ve["image"], input_imgs)
    v_loc = (dense(ve["location"], image_loc[..., :5])
             + dense(ve["orientation"], image_loc[..., 5:9])
             + dense(ve["next_orientation"], image_loc[..., 9:11])
             + ve["sequence"][image_loc[..., 11].astype(jnp.int32)])
    v_x = layer_norm(ve["ln"], v_img + v_loc)
    v_x = dropout(r[1], v_x, cfg.hidden_dropout_prob, deterministic=not train)

    # interleaved encoder (vilbert.py:758-895)
    v_start = t_start = 0
    rr = jax.random.fold_in(r[2], 0)
    for count, (v_end, t_end) in enumerate(zip(cfg.v_biattention_id, cfg.t_biattention_id)):
        for idx in range(v_start, v_end):
            v_x, _ = _bert_layer(params["v_layers"][idx], v_x, v_mask, cfg.v_num_attention_heads,
                                 jax.random.fold_in(rr, 100 + idx), train,
                                 cfg.v_hidden_dropout_prob, cfg.v_attention_probs_dropout_prob)
            if idx < cfg.fixed_v_layer:
                v_x = jax.lax.stop_gradient(v_x)
        for idx in range(t_start, t_end):
            t_x, _ = _bert_layer(params["t_layers"][idx], t_x, t_mask, cfg.num_attention_heads,
                                 jax.random.fold_in(rr, 200 + idx), train,
                                 cfg.hidden_dropout_prob, cfg.attention_probs_dropout_prob)
            if idx < cfg.fixed_t_layer:
                t_x = jax.lax.stop_gradient(t_x)
        if cfg.with_coattention:
            v_x, t_x = _connection_layer(params["c_layers"][count], cfg, v_x, v_mask,
                                         t_x, t_mask, co_mask,
                                         jax.random.fold_in(rr, 300 + count), train)
        v_start, t_start = v_end, t_end

    for idx in range(v_start, cfg.v_num_hidden_layers):
        v_x, _ = _bert_layer(params["v_layers"][idx], v_x, v_mask, cfg.v_num_attention_heads,
                             jax.random.fold_in(rr, 100 + idx), train,
                             cfg.v_hidden_dropout_prob, cfg.v_attention_probs_dropout_prob)
    for idx in range(t_start, cfg.num_hidden_layers):
        t_x, _ = _bert_layer(params["t_layers"][idx], t_x, t_mask, cfg.num_attention_heads,
                             jax.random.fold_in(rr, 200 + idx), train,
                             cfg.hidden_dropout_prob, cfg.attention_probs_dropout_prob)

    if cfg.pool_method == "mean":
        tm = attention_mask.astype(jnp.float32)
        vm = image_attention_mask.astype(jnp.float32)
        t_in = jnp.sum(t_x * tm[..., None], 1) / jnp.maximum(jnp.sum(tm, 1, keepdims=True), 1.0)
        v_in = jnp.sum(v_x * vm[..., None], 1) / jnp.maximum(jnp.sum(vm, 1, keepdims=True), 1.0)
    else:  # "first": reference parity (vilbert.py:970-996)
        t_in, v_in = t_x[:, 0], v_x[:, 0]
    pooled_t = jax.nn.relu(dense(params["t_pooler"], t_in))
    pooled_v = jax.nn.relu(dense(params["v_pooler"], v_in))
    return t_x, v_x, pooled_t, pooled_v


# ---------------------------------------------------------------------------
# Heads + VLNBert scorer (ref: vln_bert.py:11-75; vilbert.py:1007-1047)
# ---------------------------------------------------------------------------

def vlnbert_init(key, cfg: VilBertConfig) -> dict:
    std = cfg.initializer_range
    ks = jax.random.split(key, 6)
    params = {
        "bert": vilbert_init(ks[0], cfg),
        "cls": {
            "transform": _linear_init(ks[1], cfg.hidden_size, cfg.hidden_size, std),
            "transform_ln": _ln_init(cfg.hidden_size),
            "decoder_bias": jnp.zeros((cfg.vocab_size,)),  # decoder weight tied to word emb
            "bi_seq_relationship": _linear_init(ks[2], cfg.bi_hidden_size, 2, std),
            "v_transform": _linear_init(ks[3], cfg.v_hidden_size, cfg.v_hidden_size, std),
            "v_transform_ln": _ln_init(cfg.v_hidden_size),
            "v_decoder": _linear_init(ks[4], cfg.v_hidden_size, cfg.v_target_size, std),
        },
        "vil_logit": _linear_init(ks[5], cfg.bi_hidden_size, 1, std),
    }
    return params


def vlnbert_apply(
    params: dict,
    cfg: VilBertConfig,
    instr_tokens: jnp.ndarray,
    image_features: jnp.ndarray,
    image_locations: jnp.ndarray,
    token_type_ids=None,
    attention_mask=None,
    image_attention_mask=None,
    co_attention_mask=None,
    rng=None,
    train: bool = False,
    dropout_prob: float = 0.1,
    compute_heads: bool = True,
):
    """Path-instruction compatibility scoring.

    Returns (vil_logit [B, 1], vision_prediction, linguistic_prediction).

    ``compute_heads=False`` skips the masked-LM / masked-region prediction
    heads (vision_pred and linguistic_pred return None).  CLR2R difficulty
    scoring only reads vil_logit, and at reference scale the tied LM
    decoder alone ([B, Lt, 768] @ [768, 30522]) is ~25% of the whole
    forward's FLOPs — the reference (vln_bert.py:60-69) pays it anyway
    because torch builds the full graph; here the dead heads are simply
    not traced."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    seq_t, seq_v, pooled_t, pooled_v = vilbert_apply(
        params["bert"], cfg, instr_tokens, image_features, image_locations,
        token_type_ids, attention_mask, image_attention_mask, co_attention_mask,
        rng=jax.random.fold_in(rng, 0), train=train,
    )
    cls = params["cls"]
    linguistic_pred = vision_pred = None
    if compute_heads:
        # tied LM head
        h = jax.nn.gelu(dense(cls["transform"], seq_t), approximate=False)
        h = layer_norm(cls["transform_ln"], h)
        linguistic_pred = h @ params["bert"]["embeddings"]["word"].T + cls["decoder_bias"]
        # image head
        hv = jax.nn.gelu(dense(cls["v_transform"], seq_v), approximate=False)
        hv = layer_norm(cls["v_transform_ln"], hv)
        vision_pred = dense(cls["v_decoder"], hv)
    # fusion + path logit (vln_bert.py:60-69)
    if cfg.fusion_method == "sum":
        pooled = pooled_t + pooled_v
    elif cfg.fusion_method == "mul":
        pooled = pooled_t * pooled_v
    else:
        raise AssertionError(cfg.fusion_method)
    pooled = dropout(jax.random.fold_in(rng, 1), pooled, dropout_prob, deterministic=not train)
    vil_logit = dense(params["vil_logit"], pooled)
    # alignment (is-next-sentence analog) head for pretraining
    # (ref: BertForMultiModalPreTraining, vilbert.py:1431-1513)
    seq_relationship = dense(cls["bi_seq_relationship"], pooled)
    return vil_logit, vision_pred, linguistic_pred, seq_relationship


# ---------------------------------------------------------------------------
# Torch/HF checkpoint conversion
# ---------------------------------------------------------------------------

def vlnbert_from_pretrained(path_or_url: str, cfg: VilBertConfig, key=None,
                            cache_dir: str = None) -> dict:
    """Reference ``from_pretrained`` analog (ref: vilbert.py:1049-1254):
    resolve through the cache layer (local path / file:// / http(s) / s3),
    load the torch state_dict (or an .npz of arrays), and overlay it on a
    fresh parameter tree via convert_torch_state_dict."""
    from .file_utils import cached_path

    resolved = cached_path(path_or_url, cache_dir)
    if resolved.endswith(".npz"):
        with np.load(resolved) as z:
            state_dict = {k: z[k] for k in z.files}
    else:
        import torch

        sd = torch.load(resolved, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        state_dict = {k: v.numpy() for k, v in sd.items()}
    params = vlnbert_init(key if key is not None else jax.random.PRNGKey(0), cfg)
    return convert_torch_state_dict(state_dict, cfg, params)


_LAYER_MAP = {
    "attention.self.query": ("attn", "query"),
    "attention.self.key": ("attn", "key"),
    "attention.self.value": ("attn", "value"),
    "attention.output.dense": ("attn_out",),
    "attention.output.LayerNorm": ("attn_ln",),
    "intermediate.dense": ("inter",),
    "output.dense": ("out",),
    "output.LayerNorm": ("out_ln",),
}


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"], cfg: VilBertConfig,
                             params: dict) -> dict:
    """Overlay a torch ViLBERT state_dict (reference/HF naming) onto a
    freshly initialized parameter tree; unknown tensors are skipped (the
    reference's from_pretrained does the same partial-load)."""
    import copy

    out = copy.deepcopy(params)

    def arr(v):
        return np.asarray(v)

    def set_linear(dst, prefix):
        if f"{prefix}.weight" in state_dict:
            dst["w"] = jnp.asarray(arr(state_dict[f"{prefix}.weight"]).T)
        if f"{prefix}.bias" in state_dict:
            dst["b"] = jnp.asarray(arr(state_dict[f"{prefix}.bias"]))

    def set_ln(dst, prefix):
        for torch_k, ours in (("weight", "scale"), ("gamma", "scale"),
                              ("bias", "bias"), ("beta", "bias")):
            if f"{prefix}.{torch_k}" in state_dict:
                dst[ours] = jnp.asarray(arr(state_dict[f"{prefix}.{torch_k}"]))

    bert = out["bert"] if "bert" in out else out
    base = "bert." if any(k.startswith("bert.") for k in state_dict) else ""

    emb = bert["embeddings"]
    for name, key in (("word_embeddings", "word"), ("position_embeddings", "position"),
                      ("token_type_embeddings", "token_type")):
        k = f"{base}embeddings.{name}.weight"
        if k in state_dict:
            emb[key] = jnp.asarray(arr(state_dict[k]))
    set_ln(emb["ln"], f"{base}embeddings.LayerNorm")

    ve = bert["v_embeddings"]
    set_linear(ve["image"], f"{base}v_embeddings.image_embeddings")
    set_linear(ve["location"], f"{base}v_embeddings.image_location_embeddings")
    set_linear(ve["orientation"], f"{base}v_embeddings.image_orientation_embeddings")
    set_linear(ve["next_orientation"], f"{base}v_embeddings.image_next_orientation_embeddings")
    k = f"{base}v_embeddings.image_sequence_embeddings.weight"
    if k in state_dict:
        ve["sequence"] = jnp.asarray(arr(state_dict[k]))
    set_ln(ve["ln"], f"{base}v_embeddings.LayerNorm")

    for stream, count, torch_name in (("t_layers", cfg.num_hidden_layers, "encoder.layer"),
                                      ("v_layers", cfg.v_num_hidden_layers, "encoder.v_layer")):
        for i in range(count):
            for torch_sub, path in _LAYER_MAP.items():
                prefix = f"{base}{torch_name}.{i}.{torch_sub}"
                node = bert[stream][i]
                for pk in path[:-1]:
                    node = node[pk]
                leaf = node.get(path[-1])
                if leaf is None:
                    continue
                if "LayerNorm" in torch_sub or path[-1].endswith("ln"):
                    set_ln(leaf, prefix)
                else:
                    set_linear(leaf, prefix)

    # biattention/connection layers
    cmap = {"biattention.query1": "q1", "biattention.key1": "k1", "biattention.value1": "v1",
            "biattention.query2": "q2", "biattention.key2": "k2", "biattention.value2": "v2",
            "biOutput.dense1": "dense1", "biOutput.dense2": "dense2",
            "v_intermediate.dense": "v_inter", "v_output.dense": "v_out",
            "t_intermediate.dense": "t_inter", "t_output.dense": "t_out"}
    lnmap = {"biOutput.LayerNorm1": "ln1", "biOutput.LayerNorm2": "ln2",
             "v_output.LayerNorm": "v_ln", "t_output.LayerNorm": "t_ln"}
    for i in range(len(cfg.v_biattention_id)):
        for torch_sub, ours in cmap.items():
            set_linear(bert["c_layers"][i][ours], f"{base}encoder.c_layer.{i}.{torch_sub}")
        for torch_sub, ours in lnmap.items():
            set_ln(bert["c_layers"][i][ours], f"{base}encoder.c_layer.{i}.{torch_sub}")

    set_linear(bert["t_pooler"], f"{base}t_pooler.dense")
    set_linear(bert["v_pooler"], f"{base}v_pooler.dense")

    if "cls" in out:
        cls = out["cls"]
        set_linear(cls["transform"], "cls.predictions.transform.dense")
        set_ln(cls["transform_ln"], "cls.predictions.transform.LayerNorm")
        if "cls.predictions.bias" in state_dict:
            cls["decoder_bias"] = jnp.asarray(arr(state_dict["cls.predictions.bias"]))
        set_linear(cls["bi_seq_relationship"], "cls.bi_seq_relationship")
        set_linear(cls["v_transform"], "cls.imagePredictions.transform.dense")
        set_ln(cls["v_transform_ln"], "cls.imagePredictions.transform.LayerNorm")
        set_linear(cls["v_decoder"], "cls.imagePredictions.decoder")
    if "vil_logit" in out:
        set_linear(out["vil_logit"], "vil_logit")
    return out
