"""CLR2R construction pipeline: pretrain the ViLBERT scorer, score every
training item's path-instruction compatibility, and write round files.

The reference consumes CLR2R round files (data/CLR2R/*_v3.json,
ref: curriculum_env.py:44-62) but ships no way to produce them; this is
the missing difficulty-scoring pipeline (paper §3.1), runnable end to end
on a synthetic grounded world (default) or real expanded R2R data.

Usage:
    python scripts/build_clr2r.py --out /tmp/clr2r [--steps 200]
Writes <out>/round_{1..5}_v3.json in the reference's round-file format.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=120, help="pretraining batches")
    ap.add_argument("--scans", type=int, default=4)
    ap.add_argument("--nodes", type=int, default=32)
    ap.add_argument("--paths", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import numpy as np

    from curriculum_learning_for_vln_tpu.agents.vln_bert import VLNBertScorer
    from curriculum_learning_for_vln_tpu.data.datasets import expand_r2r_items
    from curriculum_learning_for_vln_tpu.engine.pretrain import (
        VLNBertPretrainer, make_clr2r_rounds, pretrain_batches, score_difficulty)
    from curriculum_learning_for_vln_tpu.models.vilbert import VilBertConfig
    from curriculum_learning_for_vln_tpu.utils.tokenizer import Tokenizer, build_vocab
    from curriculum_learning_for_vln_tpu.world import compiler, synthetic

    feat = 128
    max_path = 8
    graphs = synthetic.make_world_graphs(args.scans, args.nodes, seed=args.seed)
    world = compiler.compile_world(graphs, max_candidates=16)
    rooms = synthetic.assign_rooms(world, seed=args.seed)
    synthetic.attach_grounded_features(world, rooms, feature_dim=feat, seed=args.seed)
    items = synthetic.make_grounded_dataset(graphs, world, rooms,
                                            num_paths=args.paths, seed=args.seed + 1)
    tok = Tokenizer(build_vocab(items, min_count=1), encoding_length=24)
    data = expand_r2r_items(items, tok)

    cfg = VilBertConfig(
        vocab_size=tok.vocab_size(), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, max_position_embeddings=32,
        v_feature_size=feat, v_target_size=len(synthetic.ROOM_TYPES),
        v_hidden_size=64, v_num_hidden_layers=2, v_num_attention_heads=4,
        v_intermediate_size=128, bi_hidden_size=64, bi_num_attention_heads=4,
        v_biattention_id=(0, 1), t_biattention_id=(0, 1))
    trainer = VLNBertPretrainer(cfg, mask_idx=1, lr=3e-4)
    params, opt_state = trainer.init(jax.random.PRNGKey(args.seed))

    def batches():
        n = 0
        while n < args.steps:
            for b in pretrain_batches(world, data, tok, batch_size=16,
                                      max_path_len=max_path, feat_dim=feat,
                                      region_classes=rooms,
                                      n_region_classes=len(synthetic.ROOM_TYPES),
                                      epochs=1, seed=args.seed + n):
                yield b
                n += 1
                if n >= args.steps:
                    return

    params, opt_state, logs = trainer.train(params, opt_state, batches(),
                                            jax.random.PRNGKey(args.seed + 9))
    print(f"pretrained {args.steps} steps, final loss "
          f"{float(logs['loss']):.4f} (lm {float(logs['lm_loss']):.3f} "
          f"region {float(logs['region_loss']):.3f} align {float(logs['align_loss']):.3f})",
          file=sys.stderr)

    scorer = VLNBertScorer(cfg)
    scores = score_difficulty(scorer, params, world, data, tok,
                              max_path_len=max_path, feat_dim=feat)
    # aggregate per path (3 instructions each): mean score, ref rounds are
    # path-level partitions of the train split
    by_path = {}
    for it, s in zip(data, scores):
        by_path.setdefault(it["path_id"], []).append(float(s))
    path_scores = np.array([np.mean(by_path[it["path_id"]]) for it in items])
    rounds = make_clr2r_rounds(items, path_scores, n_rounds=5)

    os.makedirs(args.out, exist_ok=True)
    for name, round_items in rounds.items():
        path = os.path.join(args.out, f"R2R_{name}_v3.json")
        with open(path, "w") as f:
            json.dump(round_items, f)
        print(f"wrote {path}: {len(round_items)} paths", file=sys.stderr)
    print(json.dumps({"rounds": {k: len(v) for k, v in rounds.items()},
                      "final_loss": float(logs["loss"])}))


if __name__ == "__main__":
    main()
