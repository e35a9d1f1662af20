"""Precompile a Matterport world into packed tables.

Usage:
    python scripts/build_world.py --connectivity connectivity/ \
        --features img_features/ResNet-152-imagenet.tsv \
        --data assets --out world_cache/

Reads every scan referenced by the R2R splits, compiles candidate /
distance / next-hop tables (C++ Dijkstra when the native lib builds),
and caches them as world.npz so training starts without the Dijkstra
pass.  Features stay in the TSV (loaded at train time) — the cache holds
only the graph-derived tables.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curriculum_learning_for_vln_tpu.data import datasets as DS
from curriculum_learning_for_vln_tpu.world import compiler as WC
from curriculum_learning_for_vln_tpu.world.graph import load_nav_graphs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--connectivity", required=True)
    ap.add_argument("--data", default="assets")
    ap.add_argument("--out", required=True)
    ap.add_argument("--splits", nargs="+",
                    default=["train", "val_seen", "val_unseen", "test"])
    ap.add_argument("--max-candidates", type=int, default=16)
    args = ap.parse_args()

    items = []
    for split in args.splits:
        items += DS.load_datasets([split], "R2R", args.data)
    scans = sorted({it["scan"] for it in items})
    print(f"{len(scans)} scans referenced by splits {args.splits}")

    t0 = time.time()
    graphs = load_nav_graphs(scans, args.connectivity)
    print(f"parsed connectivity in {time.time()-t0:.1f}s "
          f"({sum(g.num_nodes for g in graphs.values())} nodes)")

    t0 = time.time()
    world = WC.compile_world(graphs, max_candidates=args.max_candidates)
    print(f"compiled tables in {time.time()-t0:.1f}s")

    out = os.path.join(args.out, "world.npz")
    world.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
