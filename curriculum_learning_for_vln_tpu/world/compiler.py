"""World compiler: navigation graphs -> packed device-resident tables.

This is the heart of the TPU-native inversion.  The reference walks a C++
simulator per batch slot per step (`tasks/R2R-judy/src/environ/
common_env.py:58-110`, `src/utils/misc.py:346-390`) and re-derives
candidate lists with a scratch simulator sweep over 36 views
(`common_env.py:225-297`).  Here the entire world is compiled *once* into
flat arrays so that reset/step/observe become pure gathers inside a jitted
`lax.scan`:

* candidate table   — per node: neighbor ids, absolute headings/elevations,
                      closest view indices (the exact static content the
                      reference caches in ``buffered_state_dict``)
* distance table    — per node: geodesic distance to every node of its scan
                      (replaces ``self.distances``, common_env.py:179-181)
* next-hop table    — per node: first step of the shortest path to every
                      goal (replaces path lists, common_env.py:216-223)
* feature table     — [N, 36, D] panoramic features (bf16 on TPU)

All scans are packed into one global node index space; per-scan tables are
ragged-packed with a shared max-nodes-per-scan width.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Dict, List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..utils.angles import ANGLE_INC, all_loc_embeddings
from .graph import ScanGraph, shortest_paths
from .synthetic import synthetic_features

MAX_CANDIDATES_DEFAULT = 16


class WorldTables(NamedTuple):
    """Device-side packed world (a pytree of jnp arrays).

    Shapes: N = total padded nodes, L = max nodes per scan, MC = candidate
    slots, D = visual feature dim.
    """

    pos: jnp.ndarray          # [N, 3] f32
    node_scan: jnp.ndarray    # [N] i32
    node_local: jnp.ndarray   # [N] i32
    cand_next: jnp.ndarray    # [N, MC] i32   global node ids (self where invalid)
    cand_valid: jnp.ndarray   # [N, MC] bool
    cand_heading: jnp.ndarray # [N, MC] f32   absolute heading to candidate
    cand_elev: jnp.ndarray    # [N, MC] f32   absolute elevation to candidate
    cand_view: jnp.ndarray    # [N, MC] i32   closest view index (0..35)
    n_cands: jnp.ndarray      # [N] i32
    dist: jnp.ndarray         # [N, L] f32    geodesic distance to scan-local nodes
    next_hop: jnp.ndarray     # [N, L] i32    global id of next node toward local goal
    features: jnp.ndarray     # [N, V, D]     panoramic visual features
    loc_embed: jnp.ndarray    # [36, V, 128] f32 relative view embedding per viewIndex

    @property
    def num_nodes(self) -> int:
        return self.pos.shape[0]

    @property
    def max_candidates(self) -> int:
        return self.cand_next.shape[1]

    @property
    def feat_dim(self) -> int:
        return self.features.shape[-1]

    @property
    def num_views(self) -> int:
        return self.features.shape[1]


@dataclass
class CompiledWorld:
    """Host-side compiled world: numpy tables plus string-id bookkeeping."""

    scan_ids: List[str]
    node_ids: List[str]                     # global id -> "viewpointId"
    scan_offset: np.ndarray                 # [S+1]
    node_scan: np.ndarray                   # [N]
    node_local: np.ndarray                  # [N]
    pos: np.ndarray
    cand_next: np.ndarray
    cand_valid: np.ndarray
    cand_heading: np.ndarray
    cand_elev: np.ndarray
    cand_view: np.ndarray
    n_cands: np.ndarray
    dist: np.ndarray
    next_hop: np.ndarray
    features: Optional[np.ndarray] = None
    _id_map: Optional[Dict[str, Dict[str, int]]] = None

    # -- lookups ----------------------------------------------------------
    def global_id(self, scan: str, viewpoint: str) -> int:
        if self._id_map is None:
            self._id_map = {}
            for g, (s, vid) in enumerate(zip(self.node_scan, self.node_ids)):
                self._id_map.setdefault(self.scan_ids[s], {})[vid] = g
        return self._id_map[scan][viewpoint]

    def viewpoint_of(self, global_id: int) -> str:
        return self.node_ids[global_id]

    def scan_of(self, global_id: int) -> str:
        return self.scan_ids[int(self.node_scan[global_id])]

    def scan_dist(self, scan: str) -> np.ndarray:
        """[V, V] distance matrix of one scan (for the evaluator)."""
        s = self.scan_ids.index(scan)
        o, e = int(self.scan_offset[s]), int(self.scan_offset[s + 1])
        return self.dist[o:e, : e - o]

    def scan_num_nodes(self, scan: str) -> int:
        s = self.scan_ids.index(scan)
        return int(self.scan_offset[s + 1] - self.scan_offset[s])

    @property
    def num_nodes(self) -> int:
        return self.pos.shape[0]

    # -- device export ----------------------------------------------------
    def device_tables(self, precision: str = "f32") -> WorldTables:
        feats = self.features
        assert feats is not None, "CompiledWorld has no features attached"
        if precision == "bf16":
            feats = feats.astype(jnp.bfloat16)
        # pad the view axis 36 -> 40 (next multiple of 8): the fused Pallas
        # observation kernel DMAs per-node [V, D] slices out of HBM, and
        # Mosaic requires the sliced sublane extent to be tile-aligned.
        # XLA consumers slice back to :36 (fused into the gather, no cost);
        # pad rows are zeros and masked out of the in-kernel softmax.
        V = feats.shape[1]
        Vp = ((V + 7) // 8) * 8
        if Vp != V:
            feats = np.pad(feats, ((0, 0), (0, Vp - V), (0, 0)))
        return WorldTables(
            pos=jnp.asarray(self.pos),
            node_scan=jnp.asarray(self.node_scan),
            node_local=jnp.asarray(self.node_local),
            cand_next=jnp.asarray(self.cand_next),
            cand_valid=jnp.asarray(self.cand_valid),
            cand_heading=jnp.asarray(self.cand_heading),
            cand_elev=jnp.asarray(self.cand_elev),
            cand_view=jnp.asarray(self.cand_view),
            n_cands=jnp.asarray(self.n_cands),
            dist=jnp.asarray(self.dist),
            next_hop=jnp.asarray(self.next_hop),
            features=jnp.asarray(feats),
            loc_embed=jnp.asarray(all_loc_embeddings()),
        )

    # -- caching ----------------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(
            path,
            scan_ids=np.array(self.scan_ids),
            node_ids=np.array(self.node_ids),
            scan_offset=self.scan_offset,
            node_scan=self.node_scan,
            node_local=self.node_local,
            pos=self.pos,
            cand_next=self.cand_next,
            cand_valid=self.cand_valid,
            cand_heading=self.cand_heading,
            cand_elev=self.cand_elev,
            cand_view=self.cand_view,
            n_cands=self.n_cands,
            dist=self.dist,
            next_hop=self.next_hop,
        )

    @staticmethod
    def load(path: str) -> "CompiledWorld":
        z = np.load(path, allow_pickle=False)
        return CompiledWorld(
            scan_ids=[str(s) for s in z["scan_ids"]],
            node_ids=[str(s) for s in z["node_ids"]],
            scan_offset=z["scan_offset"],
            node_scan=z["node_scan"],
            node_local=z["node_local"],
            pos=z["pos"],
            cand_next=z["cand_next"],
            cand_valid=z["cand_valid"],
            cand_heading=z["cand_heading"],
            cand_elev=z["cand_elev"],
            cand_view=z["cand_view"],
            n_cands=z["n_cands"],
            dist=z["dist"],
            next_hop=z["next_hop"],
        )


def candidate_geometry(src_pos: np.ndarray, dst_pos: np.ndarray):
    """Absolute heading/elevation/closest-view from one node to neighbors.

    Matterport convention: heading measured clockwise from the +y axis
    (atan2(dx, dy)), elevation from the horizontal plane.  The closest view
    is the discretized camera pose minimizing angular distance — the same
    view the reference's 36-view sweep dedup converges to
    (common_env.py:252-273).
    """
    d = dst_pos - src_pos[None, :]
    heading = np.arctan2(d[:, 0], d[:, 1])
    heading = np.mod(heading, 2 * np.pi)
    horiz = np.linalg.norm(d[:, :2], axis=-1)
    elevation = np.arctan2(d[:, 2], np.maximum(horiz, 1e-8))
    h_idx = np.mod(np.round(heading / ANGLE_INC).astype(np.int64), 12)
    e_row = np.clip(np.round(elevation / ANGLE_INC).astype(np.int64), -1, 1) + 1
    view = (e_row * 12 + h_idx).astype(np.int32)
    return heading.astype(np.float32), elevation.astype(np.float32), view


def compile_world(
    graphs: Dict[str, ScanGraph],
    max_candidates: int = MAX_CANDIDATES_DEFAULT,
    feature_fn: Optional[Callable[[str, str], np.ndarray]] = None,
    feature_dim: int = 2048,
    num_views: int = 36,
    use_native: bool = True,
) -> CompiledWorld:
    """Compile scan graphs into packed tables.

    ``feature_fn(scan, viewpoint_id) -> [num_views, feature_dim]`` supplies
    panoramic features (precomputed ResNet TSV rows or synthetic).  When
    None, features are left unattached (attach later via
    ``attach_features``).  ``use_native`` routes all-pairs shortest paths
    through the C++ graph kernel when the library is built.
    """
    scan_ids = sorted(graphs)
    counts = [graphs[s].num_nodes for s in scan_ids]
    N = int(np.sum(counts))
    L = int(np.max(counts)) if counts else 0
    MC = max_candidates

    scan_offset = np.zeros(len(scan_ids) + 1, dtype=np.int32)
    np.cumsum(counts, out=scan_offset[1:])

    node_ids: List[str] = []
    node_scan = np.zeros(N, dtype=np.int32)
    node_local = np.zeros(N, dtype=np.int32)
    pos = np.zeros((N, 3), dtype=np.float32)
    cand_next = np.tile(np.arange(N, dtype=np.int32)[:, None], (1, MC))
    cand_valid = np.zeros((N, MC), dtype=bool)
    cand_heading = np.zeros((N, MC), dtype=np.float32)
    cand_elev = np.zeros((N, MC), dtype=np.float32)
    cand_view = np.zeros((N, MC), dtype=np.int32)
    n_cands = np.zeros(N, dtype=np.int32)
    dist = np.full((N, L), 1e9, dtype=np.float32)
    next_hop = np.zeros((N, L), dtype=np.int32)

    sp_solver = None
    if use_native:
        from .native import native_shortest_paths  # lazy: optional .so

        sp_solver = native_shortest_paths

    for s, scan in enumerate(scan_ids):
        g = graphs[scan]
        off = int(scan_offset[s])
        V = g.num_nodes
        node_ids.extend(g.node_ids)
        node_scan[off : off + V] = s
        node_local[off : off + V] = np.arange(V)
        pos[off : off + V] = g.pos

        sd = snh = None
        if sp_solver is not None:
            out = sp_solver(g)
            if out is not None:
                sd, snh = out
        if sd is None:
            sd, snh = shortest_paths(g)
        dist[off : off + V, :V] = sd
        next_hop[off : off + V, :V] = snh + off

        for li, nbrs in enumerate(g.neighbors()):
            gi = off + li
            if len(nbrs) > MC:
                raise ValueError(
                    f"Node {scan}/{g.node_ids[li]} has {len(nbrs)} neighbors > MAX_CANDIDATES={MC}"
                )
            if len(nbrs) == 0:
                continue
            h, e, v = candidate_geometry(g.pos[li], g.pos[nbrs])
            order = np.lexsort((h, v))  # sweep-like ordering: by view, then heading
            nbrs, h, e, v = nbrs[order], h[order], e[order], v[order]
            k = len(nbrs)
            cand_next[gi, :k] = nbrs + off
            cand_valid[gi, :k] = True
            cand_heading[gi, :k] = h
            cand_elev[gi, :k] = e
            cand_view[gi, :k] = v
            n_cands[gi] = k

    world = CompiledWorld(
        scan_ids=scan_ids,
        node_ids=node_ids,
        scan_offset=scan_offset,
        node_scan=node_scan,
        node_local=node_local,
        pos=pos,
        cand_next=cand_next,
        cand_valid=cand_valid,
        cand_heading=cand_heading,
        cand_elev=cand_elev,
        cand_view=cand_view,
        n_cands=n_cands,
        dist=dist,
        next_hop=next_hop,
    )
    if feature_fn is not None:
        attach_features(world, feature_fn, feature_dim=feature_dim, num_views=num_views)
    return world


def attach_features(
    world: CompiledWorld,
    feature_fn: Callable[[str, str], np.ndarray],
    feature_dim: int = 2048,
    num_views: int = 36,
) -> None:
    feats = np.zeros((world.num_nodes, num_views, feature_dim), dtype=np.float32)
    for g in range(world.num_nodes):
        feats[g] = feature_fn(world.scan_of(g), world.node_ids[g])
    world.features = feats


def attach_synthetic_features(world: CompiledWorld, feature_dim: int = 2048, num_views: int = 36) -> None:
    attach_features(
        world,
        lambda scan, vid: synthetic_features(f"{scan}_{vid}", num_views, feature_dim),
        feature_dim=feature_dim,
        num_views=num_views,
    )
