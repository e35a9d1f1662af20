"""Speaker: instruction generator for back-translation and beam rescoring.

TPU-native rebuild of `tasks/R2R-judy/src/agent/speaker.py:16-422`
(airsplay-derived).  Differences from the reference are architectural,
not behavioral:

* ``from_shortest_path`` — the teacher-forced feature-collection rollout
  (ref: speaker.py:191-226) is a device `lax.scan` over the compiled
  world (no sims, no host loop), padded to the static episode length
  with zero can-features after stop (parity with the reference's
  zero-vector stop candidates).
* ``teacher_forcing`` — sequence CE vs ground-truth instructions with
  <PAD> ignored; ``for_listener`` returns the per-word loss matrix used
  for beam-search speaker scores (ref: speaker.py:235-290).
* ``infer_batch`` — greedy/sampled decode up to MAX_DECODE with <UNK>
  banned and post-EOS positions forced to <PAD>
  (ref: speaker.py:292-376), implemented as a decode `lax.scan`.
* the speaker owns its optimizers (Adam per module + grad-norm 40), and
  save/load includes optimizer state (ref: speaker.py:63-64, 378-413).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..env import env as E
from ..env.env import EpisodeBatch
from ..models.attention import NEG_INF
from ..models.core import dropout_mask
from ..models.speaker_model import (speaker_decoder_apply, speaker_decoder_init,
                                    speaker_encoder_apply, speaker_encoder_init)
from ..utils.tokenizer import BOS_IDX, EOS_IDX, PAD_IDX, UNK_IDX
from ..world.compiler import WorldTables
from .common import cast_compute_params, gather_prev_action_feature


class SpeakerFeatures(NamedTuple):
    img_feats: jnp.ndarray   # [B, T, 36, F]
    can_feats: jnp.ndarray   # [B, T, F]
    lengths: jnp.ndarray     # [B] steps incl. the stop step


def collect_shortest_path_features(world: WorldTables, ep: EpisodeBatch,
                                   episode_len: int,
                                   compute_dtype=jnp.float32) -> SpeakerFeatures:
    """Teacher-forced rollout collecting per-step panoramas and chosen
    candidate features (ref: speaker.py:191-226).

    ``compute_dtype=bfloat16`` keeps the [B, T, 36, F] pano stack in bf16
    end to end: at production shapes that stack is ~700 MB in f32 and the
    round-5 device trace showed it paid several times over (gather, layout
    copy, feature dropout, view attention) — the f32 speaker step was
    2.7x the EnvDrop train iteration for this reason (BASELINE.md)."""
    state = E.reset(world, ep)

    def step(carry, _):
        state = carry
        obs = E.observe(world, state, compute_dtype=compute_dtype)
        teacher = obs.teacher
        alive = jnp.logical_not(state.ended)
        is_move = (teacher >= 0) & (teacher < obs.n_cands)
        can_feat = jnp.where(
            (alive & is_move)[:, None], gather_prev_action_feature(obs, teacher), 0.0
        )
        new_state = E.step(world, state, teacher)
        return new_state, (obs.pano_feat, can_feat, alive)

    _, (img_feats, can_feats, alives) = jax.lax.scan(step, state, None, length=episode_len)
    lengths = jnp.sum(alives.astype(jnp.int32), axis=0)
    return SpeakerFeatures(
        img_feats=jnp.swapaxes(img_feats, 0, 1),
        can_feats=jnp.swapaxes(can_feats, 0, 1),
        lengths=lengths,
    )


def generated_to_instr_tokens(words: np.ndarray, enc_len: int):
    """Pack generated word ids into encoder-shaped instruction arrays:
    [BOS] + words up to and including EOS, truncated to ``enc_len`` with a
    forced terminal EOS, padded with PAD (encode_sentence layout,
    mirroring the reference's BOS-prepend + EOS-termination fixup,
    envdrop.py:110-119)."""
    B, L = words.shape
    tokens = np.full((B, enc_len), PAD_IDX, np.int32)
    lengths = np.zeros(B, np.int32)
    for b in range(B):
        seq = [BOS_IDX]
        for w in words[b]:
            w = int(w)
            if w == PAD_IDX:
                break
            seq.append(w)
            if w == EOS_IDX:
                break
        if seq[-1] != EOS_IDX:
            seq.append(EOS_IDX)
        if len(seq) > enc_len:
            seq = seq[:enc_len]
            seq[-1] = EOS_IDX
        tokens[b, : len(seq)] = seq
        lengths[b] = len(seq)
    return tokens, lengths


class Speaker:
    def __init__(self, spk_cfg, vocab_size: int, feat_dim: int = 2048,
                 angle_feat_size: int = 128, episode_len: int = 35,
                 compute_dtype=jnp.float32):
        self.cfg = spk_cfg
        self.vocab_size = vocab_size
        self.feature_size = feat_dim + angle_feat_size
        self.angle_feat_size = angle_feat_size
        self.episode_len = episode_len
        # bf16 compute / f32 masters, same contract as the agents
        # (common.cast_compute_params): on TPU the f32 speaker step was
        # bandwidth-bound on its [B,T,36,F] pano traffic (BASELINE.md r5)
        self.compute_dtype = compute_dtype
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(40.0),  # (ref: speaker.py:85-86)
            optax.adam(self.cfg.LR),
        )
        self._jits = {}  # compiled composites keyed by static flags

    def init(self, key) -> Tuple[dict, dict]:
        k1, k2 = jax.random.split(key)
        params = {
            "encoder": speaker_encoder_init(k1, self.feature_size, self.cfg.RNN_DIM,
                                            self.cfg.BI_DIRECTION),
            "decoder": speaker_decoder_init(k2, self.vocab_size, self.cfg.WEMB,
                                            PAD_IDX, self.cfg.RNN_DIM),
        }
        return params, self.optimizer.init(params)

    # ------------------------------------------------------------------
    def _encode(self, params, feats: SpeakerFeatures, rng, train: bool,
                feat_mask: Optional[jnp.ndarray] = None):
        cdt = self.compute_dtype
        params = cast_compute_params(params, cdt)
        img = feats.img_feats.astype(cdt)
        can = feats.can_feats.astype(cdt)
        if feat_mask is not None:  # shared drop-noise path (ref: speaker.py:318-324)
            a = self.angle_feat_size
            feat_mask = feat_mask.astype(cdt)
            img = jnp.concatenate([img[..., :-a] * feat_mask, img[..., -a:]], -1)
            can = jnp.concatenate([can[..., :-a] * feat_mask, can[..., -a:]], -1)
        ctx = speaker_encoder_apply(
            params["encoder"], can, img, rng, train,
            drop_rate=self.cfg.DROPOUT, feat_drop_rate=self.cfg.FEAT_DROPOUT,
            angle_feat_size=self.angle_feat_size, already_dropfeat=feat_mask is not None,
        )
        T = ctx.shape[1]
        ctx_mask = jnp.arange(T)[None, :] >= feats.lengths[:, None]
        return ctx, ctx_mask

    def teacher_forcing_loss(self, params, feats: SpeakerFeatures, insts: jnp.ndarray,
                             rng, train: bool, for_listener: bool = False):
        """CE over the instruction sequence (ref: speaker.py:235-290)."""
        rng_e, rng_d = jax.random.split(rng)
        ctx, ctx_mask = self._encode(params, feats, rng_e, train)
        B = insts.shape[0]
        # recurrent state stays f32 even in bf16 compute (ops/rnn.py
        # accumulates gates in f32 — same contract as the agent decoders)
        h0 = jnp.zeros((B, self.cfg.RNN_DIM))
        c0 = jnp.zeros((B, self.cfg.RNN_DIM))
        logits, _, _ = speaker_decoder_apply(
            cast_compute_params(params["decoder"], self.compute_dtype),
            insts, ctx, ctx_mask, h0, c0, rng_d, train,
            drop_rate=self.cfg.DROPOUT,
        )
        # align: predict word t+1 from position t; ignore <PAD>
        # (softmax in f32 regardless of the compute dtype)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        targets = insts[:, 1:]
        picked = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        valid = targets != PAD_IDX
        per_word = jnp.where(valid, -picked, 0.0)            # [B, L-1]
        if for_listener:
            return per_word
        return jnp.sum(per_word) / jnp.maximum(jnp.sum(valid), 1)

    def infer(self, params, feats: SpeakerFeatures, rng, sampling: bool = False,
              train: bool = False, feat_mask: Optional[jnp.ndarray] = None):
        """Greedy/sampled decode -> token ids [B, MAX_DECODE]
        (ref: speaker.py:292-376)."""
        rng, rng_e = jax.random.split(rng)
        ctx, ctx_mask = self._encode(params, feats, rng_e, train, feat_mask=feat_mask)
        B = ctx.shape[0]
        H = self.cfg.RNN_DIM
        h = jnp.zeros((B, H))   # f32 recurrent state (ops/rnn f32 gates)
        c = jnp.zeros((B, H))
        word0 = jnp.full((B,), BOS_IDX, jnp.int32)
        ended0 = jnp.zeros((B,), bool)
        dec = cast_compute_params(params["decoder"], self.compute_dtype)

        def step(carry, rng_t):
            h, c, word, ended = carry
            rng_d, rng_s = jax.random.split(rng_t)
            logits, h, c = speaker_decoder_apply(
                dec, word[:, None], ctx, ctx_mask, h, c, rng_d, train,
                drop_rate=self.cfg.DROPOUT,
            )
            # sampling/argmax in f32 (bf16 logits quantize the categorical)
            logits = logits[:, 0, :].astype(jnp.float32).at[:, UNK_IDX].set(NEG_INF)
            if sampling:
                nxt = jax.random.categorical(rng_s, logits, axis=-1).astype(jnp.int32)
                logp = jax.nn.log_softmax(logits, -1)
                log_prob = jnp.take_along_axis(logp, nxt[:, None], -1)[:, 0]
            else:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                log_prob = jnp.zeros(B)
            out_word = jnp.where(ended, PAD_IDX, nxt)
            new_ended = ended | (out_word == EOS_IDX)
            return (h, c, nxt, new_ended), (out_word, log_prob)

        rngs = jax.random.split(rng, self.cfg.MAX_DECODE)
        _, (words, log_probs) = jax.lax.scan(step, (h, c, word0, ended0), rngs)
        return jnp.swapaxes(words, 0, 1), jnp.swapaxes(log_probs, 0, 1)

    # ------------------------------------------------------------------
    def train_steps(self, params, opt_state, world: WorldTables, henv, rng, iters: int):
        """Teacher-forcing training (ref: speaker.py:75-88)."""
        @jax.jit
        def one_step(world, params, opt_state, ep, rng):
            feats = collect_shortest_path_features(world, ep, self.episode_len,
                                                   self.compute_dtype)

            def loss_fn(p):
                return self.teacher_forcing_loss(p, feats, ep.instr_tokens, rng, train=True)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = self.optimizer.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, loss

        losses = []
        for _ in range(iters):
            ep = henv.next_batch()
            rng, r = jax.random.split(rng)
            params, opt_state, loss = one_step(world, params, opt_state, ep, r)
            losses.append(float(loss))
        return params, opt_state, losses

    def get_insts(self, params, world: WorldTables, henv, rng, tokenizer=None):
        """Generate one instruction per path over the whole dataset
        (ref: speaker.py:90-102).  Returns path_id -> token ids (shrunk of
        BOS/EOS when a tokenizer is provided)."""
        path2inst = {}
        for ep in henv.eval_batches():
            rng, r = jax.random.split(rng)
            words = np.asarray(self.infer_batch(params, world, ep, r))
            idx = np.asarray(ep.item_idx)
            valid = np.asarray(ep.valid)
            for b in range(len(idx)):
                if not valid[b]:
                    continue
                path_id = henv.data[int(idx[b])]["path_id"]
                if path_id not in path2inst:
                    inst = words[b].tolist()
                    path2inst[path_id] = tokenizer.shrink(inst) if tokenizer else inst
        return path2inst

    def valid(self, params, world: WorldTables, henv, rng, tokenizer=None, n_batches: int = 3):
        """Teacher-forcing evaluation metrics (ref: speaker.py:104-123,
        280-290): returns (path2inst, loss, word_accu, sent_accu)."""
        path2inst = self.get_insts(params, world, henv, jax.random.fold_in(rng, 0), tokenizer)

        losses, word_correct, word_total, sent_correct, sent_total = [], 0, 0, 0, 0
        it = henv.eval_batches()
        for _ in range(n_batches):
            try:
                ep = next(it)
            except StopIteration:
                break
            feats = collect_shortest_path_features(world, ep, self.episode_len,
                                                   self.compute_dtype)
            rng, r1, r2 = jax.random.split(rng, 3)
            losses.append(float(self.teacher_forcing_loss(
                params, feats, ep.instr_tokens, r1, train=False)))
            ctx, ctx_mask = self._encode(params, feats, r2, train=False)
            B = ep.instr_tokens.shape[0]
            h0 = jnp.zeros((B, self.cfg.RNN_DIM))
            logits, _, _ = speaker_decoder_apply(
                cast_compute_params(params["decoder"], self.compute_dtype),
                ep.instr_tokens, ctx, ctx_mask, h0, h0,
                jax.random.fold_in(rng, 3), train=False, drop_rate=self.cfg.DROPOUT)
            predict = np.asarray(jnp.argmax(logits, axis=-1))
            insts = np.asarray(ep.instr_tokens)
            gt_mask = insts != PAD_IDX
            correct = (predict[:, :-1] == insts[:, 1:]) & gt_mask[:, 1:]
            word_correct += int(correct.sum())
            word_total += int(gt_mask[:, 1:].sum())
            sent_correct += int((correct.sum(1) == gt_mask[:, 1:].sum(1)).sum())
            sent_total += B
        loss = float(np.mean(losses)) if losses else 0.0
        word_accu = word_correct / max(word_total, 1)
        sent_accu = sent_correct / max(sent_total, 1)
        return path2inst, loss, word_accu, sent_accu

    def infer_batch(self, params, world: WorldTables, ep: EpisodeBatch, rng,
                    sampling: bool = False, feat_mask: Optional[jnp.ndarray] = None):
        """Generate instructions for a batch's shortest paths — the
        back-translation entry point (ref: envdrop.py:105-121).  The
        feature-collection scan + decode scan compile into one program
        (per (sampling, masked) flag combination)."""
        masked = feat_mask is not None
        key = ("infer_batch", sampling, masked)
        if key not in self._jits:
            def fn(world, params, ep, rng, mask):
                feats = collect_shortest_path_features(world, ep, self.episode_len,
                                                       self.compute_dtype)
                words, _ = self.infer(params, feats, rng, sampling=sampling,
                                      feat_mask=mask if masked else None)
                return words

            self._jits[key] = jax.jit(fn)
        mask_arg = feat_mask if masked else jnp.zeros((1,))
        return self._jits[key](world, params, ep, rng, mask_arg)

    def make_drop_mask(self, rng, feat_dim: int) -> jnp.ndarray:
        """Shared environmental-drop noise for back-translation
        (ref: envdrop.py:106)."""
        return dropout_mask(rng, (feat_dim,), self.cfg.FEAT_DROPOUT)

    def back_translate(self, params, world: WorldTables, henv, ep: EpisodeBatch,
                       enc_len: int, rng, feat_dim: int):
        """Generate fake instructions for the current batch and return the
        modified episode batch plus the shared feature-noise mask
        (ref: envdrop.py:105-121).

        Deviation from the reference (documented): the reference leaves the
        *old* instruction length on the modified item (envdrop.py:113-119
        never updates ``instr_length``); here the true generated length
        (BOS..EOS inclusive) is used."""
        rng_noise, rng_gen = jax.random.split(rng)
        noise = self.make_drop_mask(rng_noise, feat_dim)
        words = np.asarray(self.infer_batch(params, world, ep, rng_gen, feat_mask=noise))
        tokens, lengths = generated_to_instr_tokens(words, enc_len)
        new_ep = henv.inject_batch(np.asarray(ep.item_idx), tokens, lengths)
        return new_ep, noise

    # -- persistence (incl. optimizer, ref: speaker.py:378-413) -----------
    def save(self, path: str, params, opt_state, epoch: int = 0):
        from ..engine.checkpoint import save_checkpoint

        save_checkpoint(path, params, opt_state=opt_state, epoch=epoch)

    def load(self, path: str, load_optim: bool = False):
        from ..engine.checkpoint import load_checkpoint

        bundle = load_checkpoint(path)
        opt_state = bundle["opt_state"] if load_optim else None
        return bundle["params"], opt_state, bundle.get("epoch", 0)
