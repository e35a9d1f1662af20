"""Hand-written BPTT for the EnvDrop rollout (fused backward pass).

Differentiating the rollout `lax.scan` with autodiff makes XLA's scan
transpose do three expensive things per timestep (measured on v5e — the
backward pass is ~3x the forward, BASELINE.md):

* save the post-dropout panorama tensor ([B, 36, 2176] ~ 10 MB/step) and
  other large intermediates as residuals,
* accumulate every weight-gradient matrix (LSTM w_ih alone is
  [2240, 2048]) in the reverse-scan carry — tens of MB of HBM read+write
  per step,
* re-read the weight matrices for the input-cotangent matmuls.

This module differentiates the rollout by hand instead:

* the reverse scan carries only the true recurrence cotangents
  (d h_tilde, d c — two [B, H] vectors),
* per-step weight-gradient *factors* (gate/attention cotangents) are
  emitted as stacked outputs, and every weight gradient is formed after
  the scan as one large MXU-shaped contraction
  ``dW = einsum('tbi,tbo->io', inputs, cotangents)``,
* observations are re-gathered from the world tables in the backward
  pass (the tables carry no gradient, so d(pano) is never needed), and
  dropout masks are regenerated from the same PRNG keys via
  ``models.core.make_keep_mask`` instead of being stored,
* d(ctx) — the encoder cotangent — is likewise assembled post-scan from
  the stacked attention factors instead of riding the reverse carry as a
  [B, L, H] accumulator.

Semantics being differentiated: ``envdrop_decoder_step``
(models/decoders.py) inside ``rollout_scan``
(agents/common.py:125-217), which itself mirrors the reference hot loop
`tasks/R2R-judy/src/agent/envdrop.py:151-220` +
`src/model/policy.py:208-246`.  Forward outputs are bit-identical to the
unfused path and gradients match autodiff to numerical tolerance
(tests/test_bptt.py).

MEASURED OUTCOME (v5e, scripts/perf_probe.py, round 2): this rewrite is
~5% SLOWER than XLA's own scan transpose (rl-only 14.17 vs 13.40
ms/iter; full 18.73 vs 18.16) — XLA already fuses residual saves into
the forward and keeps the bf16 dW accumulators cheap, while this
backward re-gathers + re-drops the panorama (~30 MB/step) that XLA
reads back as a 10 MB residual.  Kept as a tested alternative mode
(TPU.FUSED_BPTT, default off); the production win on the same traffic
came from the fused observation kernel instead (ops/fused_obs.py),
which cuts the panorama chain in BOTH directions inside the standard
autodiff path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..env import env as E
from ..env.env import EnvState
from ..models.attention import NEG_INF
from ..models.core import apply_keep_mask, make_keep_mask
from ..utils.angles import ANGLE_INC, make_angle_feat


class BpttStatics(NamedTuple):
    """Hashable static configuration for the custom-VJP rollout."""

    episode_len: int
    feedback: int
    train: bool
    drop: float
    fdrop: float
    angle_feat_size: int
    avoid_cyclic: bool
    has_feat_mask: bool
    compute_dtype: str  # 'float32' | 'bfloat16'


def _cdt(cfg: BpttStatics):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _dense(p: dict, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _mask_or_none(cfg: BpttStatics, key, shape, rate: float):
    if not cfg.train or rate == 0.0:
        return None
    return make_keep_mask(key, shape, rate)


def _apply(x, mask, rate: float):
    if mask is None:
        return x
    return apply_keep_mask(x, mask, rate)


def _split_feat(cfg: BpttStatics, feat):
    a = cfg.angle_feat_size
    return feat[..., :-a], feat[..., -a:]


def _feat_masked(cfg: BpttStatics, feat, feat_mask):
    img, ang = _split_feat(cfg, feat)
    return jnp.concatenate([img * feat_mask, ang], axis=-1)


def _drop_feats(cfg: BpttStatics, km, pano, cand, feat_mask):
    """Environmental dropout / shared-noise application on the image dims
    (ref: policy.py:226-232; envdrop.py:105-121)."""
    if cfg.has_feat_mask:
        return _feat_masked(cfg, pano, feat_mask), _feat_masked(cfg, cand, feat_mask)
    img, ang = _split_feat(cfg, pano)
    m_p = _mask_or_none(cfg, jax.random.fold_in(km, 1), img.shape, cfg.fdrop)
    pano = jnp.concatenate([_apply(img, m_p, cfg.fdrop), ang], axis=-1)
    cimg, cang = _split_feat(cfg, cand)
    m_c = _mask_or_none(cfg, jax.random.fold_in(km, 2), cimg.shape, cfg.fdrop)
    cand = jnp.concatenate([_apply(cimg, m_c, cfg.fdrop), cang], axis=-1)
    return pano, cand


def _lstm_gates(dec, x, h, c):
    """The f32-accumulating gate math of ops.rnn.lstm_cell_xla, with the
    raw gate pre-activations exposed for the backward pass."""
    lp = dec["lstm"]
    b = lp["b_ih"] + lp["b_hh"]
    gates = (jnp.dot(x, lp["w_ih"], preferred_element_type=jnp.float32)
             + jnp.dot(h, lp["w_hh"], preferred_element_type=jnp.float32)
             + b.astype(jnp.float32))
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:4 * H])
    c1 = f * c + i * g
    h1 = o * jnp.tanh(c1)
    return gates, h1, c1


def _step_keys(rng, T: int):
    """Replicates rollout_scan's in-carry key chain
    (agents/common.py:154): per step, split(rng, 3) -> (rng, model, act)."""

    def ks(r, _):
        r, rm, ra = jax.random.split(r, 3)
        return r, (rm, ra)

    _, (keys_m, keys_a) = jax.lax.scan(ks, rng, None, length=T)
    return keys_m, keys_a


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _forward(cfg: BpttStatics, dec, ctx, ctx_mask, h0, c0, tables, ep, rng, feat_mask):
    from ..agents import common as C  # deferred: agents imports ops

    T = cfg.episode_len
    cdt = _cdt(cfg)
    state0 = E.reset(tables, ep)
    B = state0.node.shape[0]
    keys_m, keys_a = _step_keys(rng, T)
    visited0 = jnp.full((B, T + 1), -1, jnp.int32)
    visited0 = visited0.at[:, 0].set(state0.node)

    def step(carry, xs):
        state, h, c, h_tilde, visited = carry
        t, km, ka = xs

        obs = E.observe(tables, state, compute_dtype=cdt)
        pano, cand = _drop_feats(cfg, km, obs.pano_feat, obs.cand_feat, feat_mask)

        # --- decoder (envdrop_decoder_step, residual-capturing inline) ---
        a_ang = make_angle_feat(state.heading, state.elevation)
        act_pre = jnp.tanh(_dense(dec["act_embed"], a_ang))
        m0 = _mask_or_none(cfg, jax.random.fold_in(km, 0), act_pre.shape, cfg.drop)
        act_emb = _apply(act_pre, m0, cfg.drop)

        m3 = _mask_or_none(cfg, jax.random.fold_in(km, 3), h_tilde.shape, cfg.drop)
        q = _apply(h_tilde, m3, cfg.drop)
        tv = _dense(dec["visual_attn"]["linear_in"], q)
        alpha_v = jax.nn.softmax(jnp.einsum("blc,bc->bl", pano, tv), axis=-1)
        vis = jnp.einsum("bl,blc->bc", alpha_v, pano)

        x = jnp.concatenate([act_emb, vis], axis=-1)
        gates, h1, c1 = _lstm_gates(dec, x, h_tilde, c)

        m4 = _mask_or_none(cfg, jax.random.fold_in(km, 4), h1.shape, cfg.drop)
        hd = _apply(h1, m4, cfg.drop)
        tt = _dense(dec["text_attn"]["linear_in"], hd)
        s_c = jnp.einsum("blc,bc->bl", ctx, tt)
        alpha_c = jax.nn.softmax(jnp.where(ctx_mask, NEG_INF, s_c), axis=-1)
        wctx = jnp.einsum("bl,blc->bc", alpha_c, ctx)
        h_tilde_new = jnp.tanh(_dense(dec["text_attn"]["linear_out"],
                                      jnp.concatenate([wctx, hd], axis=-1)))

        m5 = _mask_or_none(cfg, jax.random.fold_in(km, 5), h_tilde_new.shape, cfg.drop)
        htd = _apply(h_tilde_new, m5, cfg.drop)
        logits = jnp.einsum("bkf,bf->bk", cand, _dense(dec["cand_attn"], htd))

        # --- shared rollout tail (rollout_scan, agents/common.py:156-206) ---
        cand_mask = obs.cand_mask
        if cfg.avoid_cyclic:
            c_next = tables.cand_next[state.node]
            seen = jnp.any(c_next[:, :, None] == visited[:, None, :], axis=-1)
            seen = seen & tables.cand_valid[state.node]
            K = cand_mask.shape[1]
            cand_mask = cand_mask | jnp.pad(seen, ((0, 0), (0, K - seen.shape[1])))
        masked_logits = jnp.where(cand_mask, NEG_INF, logits)

        teacher = obs.teacher
        ce = C._ce_per_sample(masked_logits, teacher)
        ce_count = jnp.sum((teacher != E.IGNORE_ID).astype(jnp.int32))
        action, log_prob, entropy = C.select_action(cfg.feedback, masked_logits, teacher, ka)

        alive_before = jnp.logical_not(state.ended)
        is_stop = E.action_is_stop(tables, state, action)
        new_state = E.step(tables, state, action)
        dist_after = jnp.take_along_axis(
            tables.dist[new_state.node], state.goal_local[:, None], axis=1
        )[:, 0]
        reward = C.shaped_reward(is_stop, obs.dist, dist_after, alive_before)
        moved = jnp.logical_and(alive_before, jnp.logical_not(is_stop))
        if cfg.avoid_cyclic:
            visited = visited.at[:, t + 1].set(new_state.node)

        rec = C.StepRecord(
            node_after=new_state.node, view_after=new_state.view_idx, moved=moved,
            alive_before=alive_before, ce=ce, ce_count=ce_count, log_prob=log_prob,
            entropy=entropy, hidden=h1, reward=reward, dist_after=dist_after,
            teacher=teacher, action=action, progress=jnp.zeros(B),
        )
        extras = {
            "node_b": state.node, "view_b": state.view_idx, "ended_b": state.ended,
            "cand_mask": cand_mask, "action": action, "teacher": teacher,
            "gates": gates, "vis": vis, "act_pre": act_pre,
            "c1": c1, "h_tilde": h_tilde_new, "wctx": wctx,
            "alpha_v": alpha_v, "alpha_c": alpha_c,
        }
        return (new_state, h1, c1, h_tilde_new, visited), (rec, extras)

    (final_state, hT, cT, htT, _), (steps, extras) = jax.lax.scan(
        step, (state0, h0, c0, h0, visited0),
        (jnp.arange(T), keys_m, keys_a),
    )
    out = C.RolloutResult(
        final_state=final_state,
        start_node=state0.node,
        start_view=state0.view_idx,
        steps=steps,
        model_carry=(hT, cT, htT),
    )
    extras["h1"] = steps.hidden
    extras["keys_m"] = keys_m
    res = (dec, ctx, ctx_mask, h0, c0, tables, ep, feat_mask, extras)
    return out, res


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _softmax_bwd(alpha, d_alpha):
    """VJP of y = softmax(z) at cotangent d_alpha: alpha*(d_alpha - <alpha, d_alpha>)."""
    inner = jnp.sum(alpha * d_alpha, axis=-1, keepdims=True)
    return alpha * (d_alpha - inner)


def _backward(cfg: BpttStatics, res, g):
    dec, ctx, ctx_mask, h0, c0, tables, ep, feat_mask, ex = res
    T = cfg.episode_len
    cdt = _cdt(cfg)
    g_steps = g.steps
    g_ce, g_lp = g_steps.ce, g_steps.log_prob
    g_ent, g_hid = g_steps.entropy, g_steps.hidden
    g_hF, g_cF, g_htF = g.model_carry

    # the final carry h aliases hidden[T-1] (same tensor in the forward)
    g_hid = g_hid.at[T - 1].add(g_hF)

    K = ex["cand_mask"].shape[-1]
    h_tilde_prev = jnp.concatenate([h0[None], ex["h_tilde"][:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None], ex["c1"][:-1]], axis=0)

    W_ih = dec["lstm"]["w_ih"]
    W_hh = dec["lstm"]["w_hh"]
    W_v = dec["visual_attn"]["linear_in"]["w"]
    W_t = dec["text_attn"]["linear_in"]["w"]
    W_o = dec["text_attn"]["linear_out"]["w"]
    W_c = dec["cand_attn"]["w"]
    H = W_hh.shape[0]

    def step(carry, xs):
        dht_carry, dc_carry = carry
        (km, node_b, view_b, ended_b, cand_mask, action, teacher, gates, h1, c1,
         htp, cp, h_tilde, alpha_v, alpha_c, act_pre, g_ce_t, g_lp_t, g_ent_t,
         g_hid_t) = xs

        # ---- re-gather the observation (tables carry no gradient) ----
        heading = (view_b % 12).astype(jnp.float32) * ANGLE_INC
        elevation = (view_b // 12 - 1).astype(jnp.float32) * ANGLE_INC
        state = EnvState(node=node_b, view_idx=view_b, heading=heading,
                         elevation=elevation, goal=ep.goal,
                         goal_local=ep.goal_local, ended=ended_b,
                         path_local=ep.path_local, path_len=ep.path_len)
        obs = E.observe(tables, state, compute_dtype=cdt)
        pano, cand = _drop_feats(cfg, km, obs.pano_feat, obs.cand_feat, feat_mask)

        # ---- regenerate the small dropout masks ----
        m0 = _mask_or_none(cfg, jax.random.fold_in(km, 0), act_pre.shape, cfg.drop)
        m3 = _mask_or_none(cfg, jax.random.fold_in(km, 3), htp.shape, cfg.drop)
        m4 = _mask_or_none(cfg, jax.random.fold_in(km, 4), h1.shape, cfg.drop)
        m5 = _mask_or_none(cfg, jax.random.fold_in(km, 5), h_tilde.shape, cfg.drop)
        q = _apply(htp, m3, cfg.drop)
        hd = _apply(h1, m4, cfg.drop)
        htd = _apply(h_tilde, m5, cfg.drop)
        act_emb = _apply(act_pre, m0, cfg.drop)

        # ---- d logits from the ce / log_prob / entropy cotangents ----
        logits = jnp.einsum("bkf,bf->bk", cand, _dense(dec["cand_attn"], htd))
        masked_logits = jnp.where(cand_mask, NEG_INF, logits)
        lp = jax.nn.log_softmax(masked_logits, axis=-1)
        p = jnp.exp(lp)

        tgt = jnp.clip(teacher, 0, K - 1)
        one_t = jax.nn.one_hot(tgt, K, dtype=p.dtype)
        not_ign = (teacher != E.IGNORE_ID).astype(p.dtype)[:, None]
        d_ml = g_ce_t[:, None] * (p - one_t) * not_ign

        a_safe = jnp.clip(action, 0, K - 1)
        one_a = jax.nn.one_hot(a_safe, K, dtype=p.dtype)
        d_ml = d_ml + g_lp_t[:, None] * (one_a - p)

        ent = -jnp.sum(p * jnp.where(p > 0, lp, 0.0), axis=-1, keepdims=True)
        d_ml = d_ml + g_ent_t[:, None] * (-p * (lp + ent))

        d_logits = jnp.where(cand_mask, 0.0, d_ml)

        # ---- candidate scorer ----
        d_u = jnp.einsum("bk,bkf->bf", d_logits, cand)
        d_htd = jnp.dot(d_u, W_c.T, preferred_element_type=jnp.float32)
        d_h_tilde = _apply(d_htd, m5, cfg.drop) + dht_carry

        # ---- text attention + output projection ----
        da = d_h_tilde * (1.0 - h_tilde * h_tilde)
        d_cat = jnp.dot(da, W_o.T, preferred_element_type=jnp.float32)
        d_wctx, d_hd = d_cat[:, :H], d_cat[:, H:]
        d_alpha_c = jnp.einsum("bh,blh->bl", d_wctx, ctx)
        d_s = _softmax_bwd(alpha_c, d_alpha_c)
        d_tt = jnp.einsum("bl,blh->bh", d_s, ctx)
        d_hd = d_hd + jnp.dot(d_tt, W_t.T, preferred_element_type=jnp.float32)
        d_h1 = _apply(d_hd, m4, cfg.drop) + g_hid_t

        # ---- LSTM cell ----
        i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        gg = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        tc = jnp.tanh(c1)
        d_o = d_h1 * tc
        d_c1 = d_h1 * o * (1.0 - tc * tc) + dc_carry
        d_i = d_c1 * gg
        d_g = d_c1 * i
        d_f = d_c1 * cp
        dc_next = d_c1 * f
        dgates = jnp.concatenate([
            d_i * i * (1.0 - i), d_f * f * (1.0 - f),
            d_g * (1.0 - gg * gg), d_o * o * (1.0 - o),
        ], axis=-1)
        d_x = jnp.dot(dgates, W_ih.T, preferred_element_type=jnp.float32)
        d_act_emb, d_vis = d_x[:, :act_pre.shape[-1]], d_x[:, act_pre.shape[-1]:]

        # ---- visual attention ----
        d_alpha_v = jnp.einsum("bf,blf->bl", d_vis, pano)
        d_sv = _softmax_bwd(alpha_v, d_alpha_v)
        d_tv = jnp.einsum("bl,blf->bf", d_sv, pano)
        d_q = jnp.dot(d_tv, W_v.T, preferred_element_type=jnp.float32)

        dht_next = (jnp.dot(dgates, W_hh.T, preferred_element_type=jnp.float32)
                    + _apply(d_q, m3, cfg.drop))
        d_act_pre = _apply(d_act_emb, m0, cfg.drop) * (1.0 - act_pre * act_pre)

        emits = (dgates, d_tv, d_tt, d_s, d_wctx, da, d_u, d_act_pre,
                 act_emb, q, hd, htd)
        return (dht_next, dc_next), emits

    rev = lambda a: a[::-1]
    xs = (ex["keys_m"], ex["node_b"], ex["view_b"], ex["ended_b"], ex["cand_mask"],
          ex["action"], ex["teacher"], ex["gates"], ex["h1"], ex["c1"],
          h_tilde_prev, c_prev, ex["h_tilde"], ex["alpha_v"], ex["alpha_c"],
          ex["act_pre"], g_ce, g_lp, g_ent, g_hid)
    xs = jax.tree_util.tree_map(rev, xs)
    (dht0, dc0), emits = jax.lax.scan(step, (g_htF, g_cF), xs)
    (dgates, d_tv, d_tt, d_s, d_wctx, da, d_u, d_act_pre,
     act_emb, q, hd, htd) = jax.tree_util.tree_map(rev, emits)

    # ---- weight gradients as single large contractions over [T, B] ----
    def dW(inp, cot, like):
        w = jnp.einsum("tbi,tbo->io", inp, cot,
                       preferred_element_type=jnp.float32)
        return w.astype(like.dtype)

    x_st = jnp.concatenate([act_emb, ex["vis"]], axis=-1)
    heading = (ex["view_b"] % 12).astype(jnp.float32) * ANGLE_INC
    elevation = (ex["view_b"] // 12 - 1).astype(jnp.float32) * ANGLE_INC
    a_ang = make_angle_feat(heading, elevation)

    db = jnp.sum(dgates, axis=(0, 1))
    d_dec = {
        "act_embed": {
            "w": dW(a_ang, d_act_pre, dec["act_embed"]["w"]),
            "b": jnp.sum(d_act_pre, axis=(0, 1)).astype(dec["act_embed"]["b"].dtype),
        },
        "lstm": {
            "w_ih": dW(x_st, dgates, W_ih),
            "w_hh": dW(h_tilde_prev, dgates, W_hh),
            "b_ih": db.astype(dec["lstm"]["b_ih"].dtype),
            "b_hh": db.astype(dec["lstm"]["b_hh"].dtype),
        },
        "text_attn": {
            "linear_in": {"w": dW(hd, d_tt, W_t)},
            "linear_out": {"w": dW(jnp.concatenate([ex["wctx"], hd], axis=-1), da, W_o)},
        },
        "visual_attn": {"linear_in": {"w": dW(q, d_tv, W_v)}},
        "cand_attn": {"w": dW(htd, d_u, W_c)},
    }

    # d(ctx): rank-structured accumulation deferred out of the scan
    tt = jnp.einsum("tbh,hc->tbc", hd, W_t)
    d_ctx = (jnp.einsum("tbl,tbh->blh", ex["alpha_c"], d_wctx)
             + jnp.einsum("tbl,tbh->blh", d_s, tt)).astype(ctx.dtype)

    return (d_dec, d_ctx, None, dht0.astype(h0.dtype), dc0.astype(c0.dtype),
            None, None, None, None)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rollout(cfg: BpttStatics, dec, ctx, ctx_mask, h0, c0, tables, ep, rng, feat_mask):
    out, _ = _forward(cfg, dec, ctx, ctx_mask, h0, c0, tables, ep, rng, feat_mask)
    return out


def _rollout_fwd(cfg, dec, ctx, ctx_mask, h0, c0, tables, ep, rng, feat_mask):
    return _forward(cfg, dec, ctx, ctx_mask, h0, c0, tables, ep, rng, feat_mask)


_rollout.defvjp(_rollout_fwd, _backward)


def envdrop_rollout_bptt(
    dec_params, ctx, ctx_mask, h0, c0, tables, ep, rng,
    episode_len: int, feedback: int, train: bool, drop: float, fdrop: float,
    angle_feat_size: int = 128, avoid_cyclic: bool = False, feat_mask=None,
    compute_dtype=jnp.float32,
):
    """EnvDrop rollout with the hand-written backward pass.

    Drop-in equivalent of ``rollout_scan`` specialized to the EnvDrop
    decoder: identical forward outputs (same PRNG chain, same masks, same
    op order), autodiff-matching gradients for the decoder parameters,
    encoder context and initial state, at a fraction of the backward-pass
    HBM traffic.
    """
    cfg = BpttStatics(
        episode_len=int(episode_len), feedback=int(feedback), train=bool(train),
        drop=float(drop), fdrop=float(fdrop), angle_feat_size=int(angle_feat_size),
        avoid_cyclic=bool(avoid_cyclic), has_feat_mask=feat_mask is not None,
        compute_dtype="bfloat16" if compute_dtype == jnp.bfloat16 else "float32",
    )
    if feat_mask is None:
        feat_mask = jnp.zeros((1,), jnp.float32)  # unused placeholder
    return _rollout(cfg, dec_params, ctx, ctx_mask, h0, c0, tables, ep, rng, feat_mask)
