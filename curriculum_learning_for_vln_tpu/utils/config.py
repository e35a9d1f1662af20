"""Hierarchical configuration system.

Reproduces the user-facing contract of the reference's yacs-based config
(`tasks/R2R-judy/src/utils/config.py`, `main.py:136-151`): a typed default
tree, overlaid by a YAML file (``merge_from_file``) and then by dotted-path
key/value pairs from the CLI (``merge_from_list``).  The key tree below is
the exact schema of the reference (DATA / TRAIN / OUTPUT / AGENT / MODEL /
AIDE) so that reference YAML configs and command lines work unchanged.

Self-contained (no yacs dependency): ``CfgNode`` is a dict subclass with
attribute access, type-checked merging, and literal-eval coercion for
string-encoded Python literals such as ``(1024, )`` — matching yacs
behavior for the reference's ``MLP_HIDDEN: (1024, )`` config lines.
"""
from __future__ import annotations

import ast
import copy
from typing import Any, List

import yaml


class CfgNode(dict):
    """A dict with attribute access and yacs-style merge semantics."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        super().__init__()
        self.__dict__[CfgNode.IMMUTABLE] = False
        if init_dict:
            for k, v in init_dict.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config key not found: {name}")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get(CfgNode.IMMUTABLE, False):
            raise AttributeError(f"CfgNode is frozen; cannot set {name}")
        self[name] = value

    # -- lifecycle --------------------------------------------------------
    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def freeze(self) -> None:
        self.__dict__[CfgNode.IMMUTABLE] = True
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self) -> None:
        self.__dict__[CfgNode.IMMUTABLE] = False
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    # -- merging ----------------------------------------------------------
    def merge_from_file(self, path: str) -> None:
        with open(path) as f:
            loaded = yaml.safe_load(f)
        if loaded:
            self._merge_dict(loaded, [])

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        self._merge_dict(other, [])

    def merge_from_list(self, opts: List[Any]) -> None:
        assert len(opts) % 2 == 0, f"Override list must be key/value pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"Unknown config key: {key}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Unknown config key: {key}")
            node[leaf] = _coerce(value, node[leaf], key)

    def _merge_dict(self, d: dict, trail: List[str]) -> None:
        for k, v in d.items():
            full = ".".join(trail + [str(k)])
            if k not in self:
                raise KeyError(f"Unknown config key: {full}")
            if isinstance(v, dict):
                if not isinstance(self[k], CfgNode):
                    raise TypeError(f"Cannot merge dict into leaf key {full}")
                self[k]._merge_dict(v, trail + [str(k)])
            else:
                self[k] = _coerce(v, self[k], full)

    def dump(self) -> str:
        def plain(node):
            return {k: plain(v) if isinstance(v, CfgNode) else v for k, v in node.items()}

        return yaml.safe_dump(plain(self), sort_keys=False)

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"CfgNode({dict.__repr__(self)})"


def _coerce(value: Any, old: Any, key: str) -> Any:
    """Coerce ``value`` toward the type of the existing default ``old``.

    Mirrors yacs: strings that parse as Python literals are literal-eval'd
    (so YAML ``(1024, )`` tuples survive), int→float widening is allowed,
    and list↔tuple conversions are accepted.
    """
    if isinstance(value, str) and not isinstance(old, str):
        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
    if old is None or value is None:
        return value
    if isinstance(old, bool) and isinstance(value, int):
        return bool(value)
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    if isinstance(old, tuple) and isinstance(value, list):
        return tuple(value)
    if isinstance(old, list) and isinstance(value, tuple):
        return list(value)
    if not isinstance(value, type(old)) and not isinstance(old, type(value)):
        raise TypeError(
            f"Type mismatch for {key}: default {type(old).__name__}, got {type(value).__name__}"
        )
    return value


# ---------------------------------------------------------------------------
# Default schema — the exact key tree of the reference config
# (ref: tasks/R2R-judy/src/utils/config.py:3-119), with a small TPU section
# appended for mesh/precision options the reference has no equivalent of.
# ---------------------------------------------------------------------------

_C = CfgNode()

_C.DATA = CfgNode()
_C.DATA.NAME = "R2R"                       # dataset name, R2R / CLR2R / RxR / R4R / Mixed
_C.DATA.R4R_JOINS = 1                      # R4R: continuations joined per anchor path
_C.DATA.DATA_DIR = "assets"                # where to load the dataset
_C.DATA.TRAIN_VOCAB = ""                   # path to train vocab
_C.DATA.TRAINVAL_VOCAB = ""                # path to train+val vocab
_C.DATA.MAX_ENC_LEN = 20                   # max encoded instruction length
_C.DATA.MAX_SUBINSTR_NUM = 0               # max #sub-instructions (latent path)
_C.DATA.IMG_FEAT_DIR = ""                  # path to pre-cached image features
_C.DATA.CONNECTIVITY_DIR = "connectivity"  # nav-graph JSONs (TPU world compiler input)
_C.DATA.WORLD_CACHE = ""                   # packed world-table cache dir ("" = no cache)

_C.TRAIN = CfgNode()
_C.TRAIN.DEVICE = 0
_C.TRAIN.OPTIM = ""                        # rmsprop ("rms") / adam / sgd
_C.TRAIN.LR = 0.0001
_C.TRAIN.BATCH_SIZE = 128
_C.TRAIN.START_EPOCH = 1
_C.TRAIN.MAX_EPOCH = 0
_C.TRAIN.ITER_PER_EPOCH = 200
_C.TRAIN.EVAL_INTERVAL = 1
_C.TRAIN.SCHEDULER = ""
_C.TRAIN.PATIENCE = 3
_C.TRAIN.LR_MIN = 1e-6
_C.TRAIN.DATA_ARGUMENT = False
_C.TRAIN.PROGMONITOR_WEIGHT = 0.5
_C.TRAIN.EVAL_TRAIN = False
_C.TRAIN.CLMODE = ""                       # "" | "NAIVE" | "SELF-PACE"

_C.TRAIN.SELF_PACE = CfgNode()
_C.TRAIN.SELF_PACE.CRATE = 1.0
_C.TRAIN.SELF_PACE.WCTRL = 0.0
_C.TRAIN.SELF_PACE.LAMB = 0.0
_C.TRAIN.SELF_PACE.MIU = 0.0
_C.TRAIN.SELF_PACE.FUNC = ""
_C.TRAIN.SELF_PACE.BURN_IN = 0
_C.TRAIN.SELF_PACE.INTERVAL = 0
_C.TRAIN.SELF_PACE.STRATEGY = ""

_C.TRAIN.AUTO_CULM = CfgNode()             # Exp3.S placeholders (ref: config.py:43-48)
_C.TRAIN.AUTO_CULM.ALPHA = 0.0
_C.TRAIN.AUTO_CULM.ETA = 0.0
_C.TRAIN.AUTO_CULM.BETA = 0.0
_C.TRAIN.AUTO_CULM.EPS = 0.0
_C.TRAIN.AUTO_CULM.RRSIZE = 0

_C.OUTPUT = CfgNode()
_C.OUTPUT.RESUME = ""                      # "" | latest | best
_C.OUTPUT.CKPT_DIR = ""
_C.OUTPUT.LOG_DIR = ""
_C.OUTPUT.RESULT_DIR = ""
_C.OUTPUT.TSBOARD = 1
_C.OUTPUT.TSBOARD_DIR = ""

_C.AGENT = CfgNode()
_C.AGENT.TEACHER_FORCE = False
_C.AGENT.MAX_EPISODE_LEN = 20
_C.AGENT.FEEDBACK = "sample"               # sample | argmax | teacher
_C.AGENT.TEACHER = "goal"                  # goal (reference shortest-path) | path (gt-route fidelity, R4R)

_C.MODEL = CfgNode()
_C.MODEL.NAME = ""

_C.MODEL.FOLLOWER = CfgNode()
_C.MODEL.FOLLOWER.GLOVE_PATH = ""
_C.MODEL.FOLLOWER.WORD_EMB_SIZE = 0
_C.MODEL.FOLLOWER.HIDDEN_SIZE = 0
_C.MODEL.FOLLOWER.DROP_RATE = 0.5
_C.MODEL.FOLLOWER.ENC_BIDIRECTION = True
_C.MODEL.FOLLOWER.ENC_LAYERS = 1

_C.MODEL.MONITOR = CfgNode()
_C.MODEL.MONITOR.WORD_EMB_SIZE = 0
_C.MODEL.MONITOR.HIDDEN_SIZE = 0
_C.MODEL.MONITOR.DROP_RATE = 0.5
_C.MODEL.MONITOR.ENC_BIDIRECTION = True
_C.MODEL.MONITOR.ENC_LAYERS = 1
_C.MODEL.MONITOR.MLP_HIDDEN = (128,)

_C.MODEL.ENVDROP = CfgNode()
_C.MODEL.ENVDROP.WORD_EMB_SIZE = 0
_C.MODEL.ENVDROP.ACT_EMB_SIZE = 0
_C.MODEL.ENVDROP.HIDDEN_SIZE = 0
_C.MODEL.ENVDROP.DROP_RATE = 0.5
_C.MODEL.ENVDROP.FEAT_DROP_RATE = 0.3
_C.MODEL.ENVDROP.ENC_BIDIRECTION = True
_C.MODEL.ENVDROP.ENC_LAYERS = 1
_C.MODEL.ENVDROP.ML_WEIGHT = 0.0
_C.MODEL.ENVDROP.GAMMA = 0.0
_C.MODEL.ENVDROP.RL_NORMALIZE = "none"     # total | batch | none

_C.MODEL.SUB_INSTR = CfgNode()
_C.MODEL.SUB_INSTR.WORD_EMB_SIZE = 0
_C.MODEL.SUB_INSTR.HIDDEN_SIZE = 0
_C.MODEL.SUB_INSTR.DROP_RATE = 0.5
_C.MODEL.SUB_INSTR.ENC_BIDIRECTION = True
_C.MODEL.SUB_INSTR.ENC_LAYERS = 1
_C.MODEL.SUB_INSTR.MLP_HIDDEN = (128,)
_C.MODEL.SUB_INSTR.SHIFT_HIDDEN = 0

_C.AIDE = CfgNode()
_C.AIDE.SPEAKER = CfgNode()
_C.AIDE.SPEAKER.RNN_DIM = 512
_C.AIDE.SPEAKER.DROPOUT = 0.6
_C.AIDE.SPEAKER.FEAT_DROPOUT = 0.3
_C.AIDE.SPEAKER.BI_DIRECTION = True
_C.AIDE.SPEAKER.WEMB = 256
_C.AIDE.SPEAKER.LR = 1e-4
_C.AIDE.SPEAKER.FAST_TRAIN = False
_C.AIDE.SPEAKER.IGNORE_ID = -1
_C.AIDE.SPEAKER.MAX_DECODE = 120
_C.AIDE.SPEAKER.LOAD_OPTIM = False
_C.AIDE.SPEAKER.RESUME = ""                # speaker checkpoint path (beam rescoring / self-train)

# --- TPU-native extensions (no reference equivalent) -----------------------
_C.TPU = CfgNode()
_C.TPU.MESH_DATA = 0                       # data-parallel mesh size, 0 = all devices
_C.TPU.MESH_MODEL = 1                      # model-parallel mesh size
_C.TPU.PRECISION = "bf16"                  # feature-table precision: bf16 | f32
_C.TPU.USE_PALLAS = True                   # enable Pallas kernels on TPU backends
_C.TPU.OBS_MASKS = "prng"                  # fused-obs env-dropout masks: prng (per-sample
#                                            in-kernel RNG) | prng_shared (one draw per
#                                            kernel group, 8x less RNG work) | ext (XLA masks)
_C.TPU.SYNTHETIC_WORLD = False             # use a synthetic world (no connectivity data)
_C.TPU.SYNTHETIC_SCANS = 8
_C.TPU.SYNTHETIC_NODES = 64
_C.TPU.SYNTHETIC_GROUNDED = True           # learnable grounded task (room-type features)
_C.TPU.SYNTHETIC_TRAIN_PATHS = 240         # synthetic split sizes
_C.TPU.SYNTHETIC_VAL_PATHS = 40
_C.TPU.SYNTHETIC_HETEROGENEITY = 0.0       # train-instruction quality spread
                                           # (0 = uniform; >0 enables latent
                                           # per-path difficulty, synthetic.py)
_C.TPU.MAX_CANDIDATES = 16                 # static candidate-slot count (R2R max ~14)
_C.TPU.SCAN_ITERS = 1                      # training iterations fused per dispatch.
#                                            Default 1 by measurement (BASELINE.md r4):
#                                            K=8 buys ~1% on v5e — the pipelined
#                                            dispatch loop already hides launch cost
_C.TPU.SCAN_UNROLL = 1                     # rollout-scan unroll factor (op-count lever;
#                                            measured numbers in BASELINE.md round 3)
_C.TPU.SCAN_EARLY_EXIT = False             # skip all-ended rollout steps via lax.cond
#                                            (reference breaks its loop there,
#                                            follower.py:168; parity: tests/test_knobs.py).
#                                            Default OFF by measurement (BASELINE.md r4):
#                                            the per-step cond costs 8.4x the whole
#                                            iteration under grad on v5e — use
#                                            PACKED_RL for dead-slot recovery instead
_C.TPU.PACKED_RL = 0                       # packed-RL pool factor (0/1 = off): refill
#                                            ended slots from a factor*B episode pool
#                                            inside the rollout scan (agents/packed.py;
#                                            ENVDROP + sample feedback, classic/naive).
#                                            Schema default 0 = reference objective
#                                            semantics (what the parity matrices and
#                                            statistical tests assert against); the
#                                            production envdrop configs set 3 —
#                                            measured +31% episodes/s on v5e and
#                                            +0.033 mean SR over 3 seeds (BASELINE.md)
_C.TPU.COMPILATION_CACHE = ""              # persistent XLA compile cache dir ("" = off).
#                                            Default OFF: through the axon relay
#                                            compiles are server-side (a client cache
#                                            cannot shorten cold starts), and on CPU a
#                                            cache dir shared across heterogeneous
#                                            builder hosts serves AOT results compiled
#                                            for other machine types (XLA warns SIGILL;
#                                            the round-3 judged segfault was this read
#                                            path).  Set a per-machine dir on real
#                                            pods, where it cuts warm starts.
_C.TPU.PARALLEL_WARMUP = True              # overlap server-side first-execution compiles
#                                            of all program variants at trainer startup
#                                            (~5.6x cold-start cut through the relay)
_C.TPU.IL_BUCKETS = (8, 16)                # teacher-forced episode-length buckets (() = off)
_C.TPU.PROFILE_DIR = ""                    # capture a jax.profiler trace of epoch 1 ("" = off)
# Hand-written rollout backward (ops/bptt.py).  Off by default: measured
# ~5% SLOWER than XLA's scan transpose on v5e (18.7 vs 18.2 ms/iter) —
# XLA's autodiff of this graph is already near its HBM bound; the win
# came from the fused observation kernel instead (TPU.USE_PALLAS).
_C.TPU.FUSED_BPTT = False
_C.TPU.CKPT_BACKEND = "pickle"             # "pickle" | "orbax" (TensorStore dirs, multi-host writes)
_C.TPU.CKPT_ASYNC = False                  # overlap checkpoint writes with the next epoch
_C.TPU.BEAM_SPEAKER_WEIGHT = 0.7           # --beam path ranking: w*speaker + (1-w)*listener log-prob.
                                           # 0.7 is the measured sweep winner (BASELINE.md r5 beam
                                           # study: SR ties greedy, SPL +2.4pt); at w=0 the sum rule
                                           # degenerates to the dijkstra-first path at any width.
_C.TPU.BEAM_LEN_NORM = False               # mean (not sum) listener log-prob in --beam ranking:
                                           # restores w=0 beam diversity but measured a strictly
                                           # weaker ranker at every w (BASELINE.md r5) — off.


def get_cfg_defaults() -> CfgNode:
    """Return a fresh clone of the default config tree."""
    return _C.clone()
