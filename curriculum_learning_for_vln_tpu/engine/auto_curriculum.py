"""Exp3.S automated curriculum over CLR2R rounds.

The reference reserves config keys for this and never implements it
(`TRAIN.AUTO_CULM` — ALPHA/ETA/BETA/EPS/RRSIZE, ref:
tasks/R2R-judy/src/utils/config.py:43-48; no consumer anywhere in the
tree).  This module makes the stub real: an adversarial-bandit curriculum
(Exp3.S, Auer et al. 2002; used for curricula in Graves et al. 2017,
"Automated Curriculum Learning") that treats the 5 difficulty rounds as
arms, samples one arm per training iteration, and rewards arms whose
losses are improving.

Reward signal: per-arm loss decrease (the difference between consecutive
losses observed on the same arm), rescaled to [-1, 1] by clipping at the
BETA / (1-BETA) quantiles of the last RRSIZE rewards (Graves et al. §3.2
rescaling).  Rewards are applied with a one-epoch delay so the training
loop keeps its deferred-sync pipelining (CLAUDE.md: no per-iteration
device fetches).
"""
from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional

import numpy as np

from .trainer import ClassicTrainer


class Exp3S:
    """Exp3.S adversarial bandit (fixed-share exponential weights)."""

    def __init__(self, n_arms: int, eta: float = 0.1, eps: float = 0.05,
                 alpha: float = 0.001, beta: float = 0.2, rrsize: int = 100,
                 seed: int = 0):
        self.n = n_arms
        self.eta = eta
        self.eps = eps
        self.alpha = alpha
        self.beta = beta
        self.log_w = np.zeros(n_arms)
        self.history: deque = deque(maxlen=max(2, rrsize))
        self._rng = np.random.default_rng(seed)

    @property
    def pi(self) -> np.ndarray:
        w = np.exp(self.log_w - self.log_w.max())
        p = w / w.sum()
        return (1.0 - self.eps) * p + self.eps / self.n

    def sample(self) -> int:
        return int(self._rng.choice(self.n, p=self.pi))

    def _rescale(self, r: float) -> float:
        """Clip-rescale a raw reward to [-1, 1] against the recent-reward
        quantile window (Graves et al. 2017 §3.2)."""
        self.history.append(float(r))
        arr = np.asarray(self.history)
        lo = float(np.quantile(arr, self.beta))
        hi = float(np.quantile(arr, 1.0 - self.beta))
        if hi <= lo:
            return 0.0
        return float(np.clip(2.0 * (r - lo) / (hi - lo) - 1.0, -1.0, 1.0))

    def update(self, arm: int, raw_reward: float) -> None:
        pi = self.pi
        r = self._rescale(raw_reward)
        r_hat = np.zeros(self.n)
        r_hat[arm] = r / max(pi[arm], 1e-8)
        v = self.log_w + self.eta * r_hat
        m = v.max()
        ew = np.exp(v - m)
        s = ew.sum()
        # fixed share: w_i <- log[(1-alpha) e^{v_i} + alpha/(n-1) sum_{j!=i} e^{v_j}]
        mixed = (1.0 - self.alpha) * ew + self.alpha / max(self.n - 1, 1) * (s - ew)
        self.log_w = m + np.log(np.maximum(mixed, 1e-300))


class AutoCurriculum(ClassicTrainer):
    """Exp3.S round selection per training iteration.

    Drives the ClassicTrainer loop through the per-iteration ``iter_env``
    hook: each iteration samples a round, and at every epoch boundary the
    observed per-iteration losses (fetched once, pipelining preserved)
    feed the bandit as per-arm loss-decrease rewards."""

    def supports_packed_rl(self) -> bool:
        return False  # bandit rewards attribute one loss per drawn batch

    def __init__(self, eta: float = 0.1, eps: float = 0.05, alpha: float = 0.001,
                 beta: float = 0.2, rrsize: int = 100, seed: int = 0):
        self._cfg = dict(eta=eta, eps=eps, alpha=alpha, beta=beta, rrsize=rrsize,
                         seed=seed)
        self.bandit: Optional[Exp3S] = None
        self._arms: List[int] = []
        self._round_keys: List[str] = []
        self._last_loss: Dict[int, float] = {}

    @classmethod
    def from_config(cls, cfg, seed: int = 0) -> "AutoCurriculum":
        ac = cfg.TRAIN.AUTO_CULM
        return cls(eta=ac.ETA or 0.1, eps=ac.EPS or 0.05, alpha=ac.ALPHA or 0.001,
                   beta=ac.BETA or 0.2, rrsize=ac.RRSIZE or 100, seed=seed)

    def iter_env(self, epoch_env, train_env):
        arm = self.bandit.sample()
        self._arms.append(arm)
        return train_env[self._round_keys[arm]]

    def on_epoch_losses(self, losses: List[float]) -> None:
        """Feed the epoch's per-iteration losses back as rewards (delayed
        by design — no per-iteration device syncs)."""
        for arm, loss in zip(self._arms, losses):
            prev = self._last_loss.get(arm)
            if prev is not None:
                self.bandit.update(arm, prev - loss)  # loss decrease = progress
            self._last_loss[arm] = loss
        self._arms = self._arms[len(losses):]

    # -- checkpoint integration (ClassicTrainer hooks) ----------------------
    def curriculum_state(self):
        if self.bandit is None:
            return None
        return {
            "kind": "exp3s",
            "log_w": np.asarray(self.bandit.log_w),
            "history": np.asarray(self.bandit.history),
            "last_loss": dict(self._last_loss),
        }

    def load_curriculum_state(self, state) -> None:
        if state is None or str(state.get("kind")) != "exp3s":
            return
        self._restore = state
        if self.bandit is not None:  # select_env may have built it already
            self._apply_restore()

    def _apply_restore(self) -> None:
        restore = getattr(self, "_restore", None)
        if restore is None:
            return
        self.bandit.log_w = np.asarray(restore["log_w"]).copy()
        self.bandit.history.clear()
        for r in np.asarray(restore["history"]).tolist():
            self.bandit.history.append(float(r))
        self._last_loss = {int(k): float(v)
                           for k, v in dict(restore["last_loss"]).items()}
        self._restore = None

    def select_env(self, train_env, ep: int):
        # epoch-level env is just the dict; iter_env picks per iteration
        assert isinstance(train_env, dict), "AutoCurriculum needs per-round envs"
        if self.bandit is None:
            self._round_keys = sorted(train_env.keys())
            self.bandit = Exp3S(len(self._round_keys), **self._cfg)
            self._apply_restore()
        return train_env
