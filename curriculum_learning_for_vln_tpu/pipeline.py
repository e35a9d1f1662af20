"""End-to-end data pipeline assembly: config -> world, tokenizer, envs.

This is the counterpart of the reference's main.py setup section
(`tasks/R2R-judy/main.py:15-87`): vocab bootstrap, tokenizer, feature
loading, environment construction (classic / NAIVE cumulative rounds /
SELF-PACE), and — new here — the world compilation step that turns
connectivity graphs + features into packed device tables.

Two world sources:
* real: connectivity JSONs (cfg.DATA.CONNECTIVITY_DIR) + ResNet feature
  TSV (cfg.DATA.IMG_FEAT_DIR), with an on-disk compiled-world cache;
* synthetic (cfg.TPU.SYNTHETIC_WORLD): generated scans, episodes and
  features so the full stack runs with zero external assets.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Tuple

import numpy as np

from .data import datasets as DS
from .data import features as FT
from .env.host_env import CLR2RBatchEnv, R2RBatchEnv
from .utils.tokenizer import Tokenizer, build_vocab, read_vocab, write_vocab
from .world import compiler as WC
from .world import synthetic as SYN
from .world.graph import load_nav_graphs

logger = logging.getLogger("main.pipeline")


def setup_vocab(cfg, seed: int = 2020) -> None:
    """Bootstrap vocab files if missing (ref: main.py:15-30)."""
    if cfg.DATA.TRAIN_VOCAB and not os.path.exists(cfg.DATA.TRAIN_VOCAB):
        data = DS.load_datasets(["train"], dataset="R2R", data_dir=cfg.DATA.DATA_DIR)
        write_vocab(build_vocab(data), cfg.DATA.TRAIN_VOCAB)
    if cfg.DATA.TRAINVAL_VOCAB and not os.path.exists(cfg.DATA.TRAINVAL_VOCAB):
        data = DS.load_datasets(["train", "val_seen", "val_unseen"], dataset="R2R",
                                data_dir=cfg.DATA.DATA_DIR)
        write_vocab(build_vocab(data), cfg.DATA.TRAINVAL_VOCAB)


def build_tokenizer(cfg) -> Tokenizer:
    vocab = read_vocab(cfg.DATA.TRAIN_VOCAB)
    return Tokenizer(vocab, cfg.DATA.MAX_ENC_LEN)


def build_synthetic_universe(cfg, seed: int = 0):
    """Synthetic world + R2R-style splits (train/val_seen/val_unseen) and
    5 CLR2R rounds over it.

    With TPU.SYNTHETIC_GROUNDED (default) the world is the *learnable*
    grounded variant: nodes carry global room types, view features encode
    the room type reachable through that view, and instructions describe
    the path's room sequence — so training-quality comparisons (e.g. the
    statistical parity harness) are meaningful without Matterport assets.
    """
    graphs = SYN.make_world_graphs(cfg.TPU.SYNTHETIC_SCANS, cfg.TPU.SYNTHETIC_NODES, seed=seed)
    scans = sorted(graphs)
    n_train_scans = max(1, int(0.75 * len(scans)))
    train_scans, unseen_scans = scans[:n_train_scans], scans[n_train_scans:] or scans[:1]

    feat_dim = 128 if cfg.TPU.SYNTHETIC_NODES <= 128 else 2048
    world = WC.compile_world(graphs, max_candidates=cfg.TPU.MAX_CANDIDATES)
    grounded = getattr(cfg.TPU, "SYNTHETIC_GROUNDED", True)
    if grounded:
        rooms = SYN.assign_rooms(world, seed=seed)
        SYN.attach_grounded_features(world, rooms, feature_dim=feat_dim, seed=seed)
        make = lambda **kw: SYN.make_grounded_dataset(graphs, world, rooms, **kw)
    else:
        WC.attach_synthetic_features(world, feature_dim=feat_dim)
        make = lambda **kw: SYN.make_r2r_dataset(graphs, **kw)

    n_train = getattr(cfg.TPU, "SYNTHETIC_TRAIN_PATHS", 240)
    n_val = getattr(cfg.TPU, "SYNTHETIC_VAL_PATHS", 40)
    # instruction-quality heterogeneity on the TRAIN split only (val stays
    # fully specified so arms compare on a clean metric) — gives the CLR2R
    # scorer a real difficulty signal to recover (world/synthetic.py
    # grounded_instruction; scripts/clr2r_e2e.py)
    het = float(getattr(cfg.TPU, "SYNTHETIC_HETEROGENEITY", 0.0)) if grounded else 0.0
    mk_train = (lambda **kw: make(heterogeneity=het, **kw)) if het > 0 else make
    splits = {
        "train": mk_train(num_paths=n_train, seed=seed + 1, path_id_base=0, scans=train_scans),
        "val_seen": make(num_paths=n_val, seed=seed + 2, path_id_base=10_000, scans=train_scans),
        "val_unseen": make(num_paths=n_val, seed=seed + 3, path_id_base=20_000, scans=unseen_scans),
    }
    # curriculum rounds: partition train by path length (difficulty proxy)
    train_sorted = sorted(splits["train"], key=lambda it: it["distance"])
    rounds_raw: Dict[str, List[dict]] = {}
    per = max(1, len(train_sorted) // 5)
    for k in range(1, 6):
        lo = (k - 1) * per
        hi = k * per if k < 5 else len(train_sorted)
        rounds_raw[f"round_{k}"] = train_sorted[lo:hi]

    return world, splits, rounds_raw, feat_dim


def build_real_world(cfg, scans) -> Tuple[WC.CompiledWorld, int]:
    cache = cfg.DATA.WORLD_CACHE
    feats = FT.read_feature_tsv(cfg.DATA.IMG_FEAT_DIR)
    feat_dim = next(iter(feats.values())).shape[-1]
    allowed = FT.featurized_scans(feats)
    scans = [s for s in scans if s in allowed]
    if cache and os.path.exists(os.path.join(cache, "world.npz")):
        world = WC.CompiledWorld.load(os.path.join(cache, "world.npz"))
    else:
        graphs = load_nav_graphs(scans, cfg.DATA.CONNECTIVITY_DIR)
        world = WC.compile_world(graphs, max_candidates=cfg.TPU.MAX_CANDIDATES)
        if cache:
            world.save(os.path.join(cache, "world.npz"))
    WC.attach_features(world, FT.feature_fn_from_dict(feats), feature_dim=feat_dim)
    return world, feat_dim


def build_environments(cfg, tok: Tokenizer, seed: int = 2020):
    """World + train/valid envs per cfg (ref: main.py:55-87).

    Returns (world, train_env, valid_env, feat_dim) where train_env is an
    R2RBatchEnv, a dict of round envs (NAIVE), or a CLR2RBatchEnv
    (SELF-PACE)."""
    bs = cfg.TRAIN.BATCH_SIZE
    tm = cfg.AGENT.TEACHER  # "goal" (reference) | "path" (R4R fidelity teacher)

    if cfg.TPU.SYNTHETIC_WORLD:
        world, splits, rounds_raw, feat_dim = build_synthetic_universe(cfg, seed=seed)
        allowed = None
        expand = lambda items: DS.expand_r2r_items(items, tok, allowed)
        if cfg.DATA.NAME == "R4R":
            # joined twisted routes over the same synthetic world (teacher
            # stays goal-directed via next-hop — see make_r4r_items docs)
            splits = {k: DS.make_r4r_items(v, cfg.DATA.R4R_JOINS, seed)
                      for k, v in splits.items()}
        valid_env = {
            "val_seen": R2RBatchEnv(world, expand(splits["val_seen"]), bs, tok, seed + 11, "val_seen", teacher_mode=tm),
            "val_unseen": R2RBatchEnv(world, expand(splits["val_unseen"]), bs, tok, seed + 12, "val_unseen", teacher_mode=tm),
        }
        if cfg.DATA.NAME == "CLR2R" and cfg.TRAIN.CLMODE in ("NAIVE", "AUTO"):
            # NAIVE rounds are cumulative (ref main.py:66-69); AUTO's bandit
            # arms are the individual rounds
            train_env = {}
            acc: List[dict] = []
            for k in range(1, 6):
                acc = (acc + rounds_raw[f"round_{k}"]) if cfg.TRAIN.CLMODE == "NAIVE" \
                    else rounds_raw[f"round_{k}"]
                train_env[f"round_{k}"] = R2RBatchEnv(world, expand(acc), bs, tok, seed + k, "train", teacher_mode=tm)
        elif cfg.DATA.NAME == "CLR2R" and cfg.TRAIN.CLMODE == "SELF-PACE":
            rounds = {k: expand(v) for k, v in rounds_raw.items()}
            train_env = CLR2RBatchEnv(world, rounds, bs, cfg.TRAIN.SELF_PACE.CRATE, tok, seed, teacher_mode=tm)
        else:
            train_env = R2RBatchEnv(world, expand(splits["train"]), bs, tok, seed, "train", teacher_mode=tm)
        return world, train_env, valid_env, feat_dim

    # ---- real data path ----
    if cfg.DATA.NAME == "Mixed":
        # joint R2R + RxR training with per-dataset validation envs
        # (ref: trainer.py:234-240 Mixed evaluator option)
        rxr_dir = os.path.join(cfg.DATA.DATA_DIR, "RxR-en") \
            if not cfg.DATA.DATA_DIR.endswith("RxR-en") else cfg.DATA.DATA_DIR
        r2r_train = DS.load_datasets(["train"], "R2R", "assets")
        rxr_train = DS.load_datasets(["train"], "RxR", rxr_dir)
        scans = sorted({it["scan"] for it in r2r_train + rxr_train})
        world, feat_dim = build_real_world(cfg, scans)
        allowed = set(world.scan_ids)
        exp_r2r = lambda items: DS.expand_r2r_items(items, tok, allowed)
        exp_rxr = lambda items: DS.expand_rxr_items(items, tok, allowed)
        train_env = R2RBatchEnv(world, exp_r2r(r2r_train) + exp_rxr(rxr_train),
                                bs, tok, seed, "train")
        valid_env = {
            "r2r_val_seen": R2RBatchEnv(world, exp_r2r(DS.load_datasets(["val_seen"], "R2R", "assets")), bs, tok, seed + 11, "val_seen"),
            "r2r_val_unseen": R2RBatchEnv(world, exp_r2r(DS.load_datasets(["val_unseen"], "R2R", "assets")), bs, tok, seed + 12, "val_unseen"),
            "rxr_val_seen": R2RBatchEnv(world, exp_rxr(DS.load_datasets(["val_seen"], "RxR", rxr_dir)), bs, tok, seed + 13, "val_seen"),
            "rxr_val_unseen": R2RBatchEnv(world, exp_rxr(DS.load_datasets(["val_unseen"], "RxR", rxr_dir)), bs, tok, seed + 14, "val_unseen"),
        }
        return world, train_env, valid_env, feat_dim

    if cfg.DATA.NAME == "RxR":
        train_items = DS.load_datasets(["train"], "RxR", cfg.DATA.DATA_DIR)
        val_seen_items = DS.load_datasets(["val_seen"], "RxR", cfg.DATA.DATA_DIR)
        val_unseen_items = DS.load_datasets(["val_unseen"], "RxR", cfg.DATA.DATA_DIR)
    elif cfg.DATA.NAME == "R4R":
        # R4R = joined R2R path pairs, built on the fly from the R2R JSONs
        # (data/datasets.py::make_r4r_items; the reference only
        # name-checks R4R in its evaluator)
        train_items = DS.make_r4r_items(
            DS.load_datasets(["train"], "R2R", cfg.DATA.DATA_DIR),
            cfg.DATA.R4R_JOINS, seed)
        val_seen_items = DS.make_r4r_items(
            DS.load_datasets(["val_seen"], "R2R", cfg.DATA.DATA_DIR),
            cfg.DATA.R4R_JOINS, seed + 1)
        val_unseen_items = DS.make_r4r_items(
            DS.load_datasets(["val_unseen"], "R2R", cfg.DATA.DATA_DIR),
            cfg.DATA.R4R_JOINS, seed + 2)
    else:
        if cfg.DATA.NAME in ("R2R", "CLR2R"):
            train_items = DS.load_datasets(
                ["train"], "R2R",
                cfg.DATA.DATA_DIR if cfg.DATA.NAME == "R2R"
                else os.path.dirname(cfg.DATA.DATA_DIR.rstrip("/")) or "assets")
        else:
            train_items = DS.load_datasets(["train"], cfg.DATA.NAME, cfg.DATA.DATA_DIR)
        base_dir = "assets" if cfg.DATA.NAME == "CLR2R" else cfg.DATA.DATA_DIR
        val_seen_items = DS.load_datasets(["val_seen"], "R2R", base_dir)
        val_unseen_items = DS.load_datasets(["val_unseen"], "R2R", base_dir)

    all_scans = sorted({it["scan"] for it in train_items + val_seen_items + val_unseen_items})
    world, feat_dim = build_real_world(cfg, all_scans)
    allowed = set(world.scan_ids)
    if cfg.DATA.NAME == "RxR":
        expand = lambda items: DS.expand_rxr_items(items, tok, allowed)
    else:
        expand = lambda items: DS.expand_r2r_items(items, tok, allowed)

    valid_env = {
        "val_seen": R2RBatchEnv(world, expand(val_seen_items), bs, tok, seed + 11, "val_seen", teacher_mode=tm),
        "val_unseen": R2RBatchEnv(world, expand(val_unseen_items), bs, tok, seed + 12, "val_unseen", teacher_mode=tm),
    }
    if cfg.DATA.NAME == "CLR2R" and cfg.TRAIN.CLMODE in ("NAIVE", "AUTO"):
        train_env = {}
        for k in range(1, 6):
            items = []
            lo = 1 if cfg.TRAIN.CLMODE == "NAIVE" else k  # NAIVE: cumulative
            for i in range(lo, k + 1):
                items += DS.load_datasets([DS.clr2r_split_name(i)], "CLR2R", cfg.DATA.DATA_DIR)
            train_env[f"round_{k}"] = R2RBatchEnv(world, expand(items), bs, tok, seed + k, "train", teacher_mode=tm)
    elif cfg.DATA.NAME == "CLR2R" and cfg.TRAIN.CLMODE == "SELF-PACE":
        rounds = {k: expand(v) for k, v in
                  DS.load_clr2r_rounds(tok, cfg.DATA.DATA_DIR, None).items()}
        train_env = CLR2RBatchEnv(world, rounds, bs, cfg.TRAIN.SELF_PACE.CRATE, tok, seed, teacher_mode=tm)
    else:
        train_env = R2RBatchEnv(world, expand(train_items), bs, tok, seed, "train", teacher_mode=tm)
    return world, train_env, valid_env, feat_dim
