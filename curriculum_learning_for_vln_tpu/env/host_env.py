"""Host-side episode batching: the R2RBatch / CLR2RBatch facades.

Replaces the reference dataset-environment classes
(`tasks/R2R-judy/src/environ/common_env.py:117-365`,
`curriculum_env.py:26-102`).  The host side only *selects episodes*: all
per-item fields are pre-packed into numpy arrays once, and a minibatch is
a row gather producing a device ``EpisodeBatch``.  No simulator objects,
no per-step host work — stepping happens in ``env.env`` on device.

Semantics kept from the reference:
* infinite shuffled iterator with wraparound reshuffle
  (common_env.py:183-207), optional sort-by-instruction-length within the
  minibatch, and ``restart`` (re-use current batch, common_env.py:332-343);
* exact-coverage evaluation batching: instead of the reference's
  "loop until an instr_id repeats" over-rolling (base.py:63-82), tail
  batches are padded with ``valid=False`` slots so each instr_id is
  produced exactly once (Evaluation.score asserts this,
  evaluator.py:124-126);
* CLR2R curriculum bookkeeping: difficulty vector ``a`` (round number per
  item), capacity ``c = sum(a) * c_rate``, and the batch -> global index
  map used by the SPCL weight solver (curriculum_env.py:81-102).
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

import jax

from ..utils.tokenizer import Tokenizer, split_sentence
from ..world.compiler import CompiledWorld
from .env import EpisodeBatch


@jax.jit
def _gather_batch(dev: dict, idx: jnp.ndarray, valid: jnp.ndarray) -> EpisodeBatch:
    """One compiled gather for all episode fields (a single dispatch —
    eager per-field gathers each cost a host->device round trip)."""
    return EpisodeBatch(
        instr_tokens=dev["instr_tokens"][idx],
        instr_len=dev["instr_len"][idx],
        start_node=dev["start_node"][idx],
        start_heading=dev["start_heading"][idx],
        goal=dev["goal"][idx],
        goal_local=dev["goal_local"][idx],
        item_idx=idx,
        valid=valid,
        path_local=dev["path_local"][idx],
        path_len=dev["path_len"][idx],
    )


class R2RBatchEnv:
    """Episode sampler over an expanded instruction dataset."""

    def __init__(
        self,
        world: CompiledWorld,
        data: Sequence[dict],
        batch_size: int,
        tokenizer: Optional[Tokenizer] = None,
        seed: int = 0,
        name: str = "train",
        sort_by_length: bool = True,
        teacher_mode: str = "goal",
    ):
        self.world = world
        self.data: List[dict] = list(data)
        self.batch_size = batch_size
        self.tok = tokenizer
        self.name = name
        self.sort_by_length = sort_by_length
        self.teacher_mode = teacher_mode
        self._rng = np.random.default_rng(seed)

        n = len(self.data)
        if n == 0:
            raise ValueError("Empty dataset")
        L = len(self.data[0]["instr_encoding"])
        self.instr_tokens = np.zeros((n, L), dtype=np.int32)
        self.instr_len = np.zeros(n, dtype=np.int32)
        self.start_node = np.zeros(n, dtype=np.int32)
        self.start_heading = np.zeros(n, dtype=np.float32)
        self.goal = np.zeros(n, dtype=np.int32)
        self.goal_local = np.zeros(n, dtype=np.int32)
        self.hops = np.zeros(n, dtype=np.int32)  # teacher-path edge count
        for i, item in enumerate(self.data):
            self.hops[i] = len(item["path"]) - 1
            self.instr_tokens[i] = item["instr_encoding"]
            self.instr_len[i] = item["instr_length"]
            start = world.global_id(item["scan"], item["path"][0])
            goal = world.global_id(item["scan"], item["path"][-1])
            self.start_node[i] = start
            self.goal[i] = goal
            self.goal_local[i] = world.node_local[goal]
            self.start_heading[i] = item["heading"]

        # teacher waypoint table (env/env.py::_teacher_target): P=1 packs
        # the goal alone (reference goal-directed teacher); "path" packs
        # the full gt route for fidelity supervision (R4R)
        if teacher_mode == "path":
            P = max(len(item["path"]) for item in self.data)
        elif teacher_mode == "goal":
            P = 1
        else:
            raise ValueError(f"teacher_mode: {teacher_mode!r}")
        self.path_local = np.tile(self.goal_local[:, None], (1, P)).astype(np.int32)
        self.path_len = np.ones(n, dtype=np.int32)
        if teacher_mode == "path":
            for i, item in enumerate(self.data):
                ids = [world.node_local[world.global_id(item["scan"], vp)]
                       for vp in item["path"]]
                self.path_local[i, : len(ids)] = ids
                self.path_len[i] = len(ids)

        self._order = self._rng.permutation(n)
        self.ix = 0
        self._cur_indices: Optional[np.ndarray] = None
        self._cur_valid: Optional[np.ndarray] = None
        self._dev = None  # lazy device-resident copy of the item arrays
        self._sharding = None  # optional NamedSharding applied to batches
        self._multihost = False

    def set_sharding(self, sharding) -> None:
        """Place every emitted EpisodeBatch with this sharding (the DP
        trainers set a batch-axis NamedSharding over the 'data' mesh axis;
        SURVEY §2.3).  Under multi-host (jax.process_count() > 1) batches
        become global arrays: every process computes the same episode
        selection (seeded identically from the CLI seed), and each
        contributes only the shards its devices own."""
        self._sharding = sharding
        self._multihost = jax.process_count() > 1

    def _place(self, batch: EpisodeBatch) -> EpisodeBatch:
        if self._sharding is None:
            return batch
        if self._multihost:
            sh = self._sharding

            def to_global(x):
                x = np.asarray(x)
                return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

            return jax.tree_util.tree_map(to_global, batch)
        return jax.device_put(batch, self._sharding)

    def _device_arrays(self):
        """Full item arrays on device: batch construction becomes a [B]
        index upload + device gathers (the host loop was ~100x slower than
        the 1 ms compiled train step when packing batches in numpy)."""
        if self._dev is None:
            self._dev = {
                "instr_tokens": jnp.asarray(self.instr_tokens),
                "instr_len": jnp.asarray(self.instr_len),
                "start_node": jnp.asarray(self.start_node),
                "start_heading": jnp.asarray(self.start_heading),
                "goal": jnp.asarray(self.goal),
                "goal_local": jnp.asarray(self.goal_local),
                "path_local": jnp.asarray(self.path_local),
                "path_len": jnp.asarray(self.path_len),
            }
        return self._dev

    # -- core iteration ---------------------------------------------------
    def size(self) -> int:
        return len(self.data)

    def reset_epoch(self, shuffle: bool = False) -> None:
        if shuffle:
            self._order = self._rng.permutation(len(self.data))
        self.ix = 0

    def _next_indices(self, tile_one: bool = False) -> np.ndarray:
        n = len(self.data)
        if tile_one:
            idx = np.full(self.batch_size, self._order[self.ix], dtype=np.int64)
            self.ix += 1
            if self.ix >= n:
                self._order = self._rng.permutation(n)
                self.ix -= n
            return idx
        idx = self._order[self.ix : self.ix + self.batch_size]
        if len(idx) < self.batch_size:
            self._order = self._rng.permutation(n)
            self.ix = self.batch_size - len(idx)
            idx = np.concatenate([idx, self._order[: self.ix]])
        else:
            self.ix += self.batch_size
        return idx.astype(np.int64)

    def _gather_np(self, idx: np.ndarray, valid: np.ndarray) -> EpisodeBatch:
        """Host-side row gather (multi-host path: each process builds the
        same global batch in numpy, then contributes its own shards)."""
        return EpisodeBatch(
            instr_tokens=self.instr_tokens[idx],
            instr_len=self.instr_len[idx],
            start_node=self.start_node[idx],
            start_heading=self.start_heading[idx],
            goal=self.goal[idx],
            goal_local=self.goal_local[idx],
            item_idx=idx.astype(np.int32),
            valid=valid,
            path_local=self.path_local[idx],
            path_len=self.path_len[idx],
        )

    def _make_batch(self, idx: np.ndarray, valid: Optional[np.ndarray] = None) -> EpisodeBatch:
        if valid is None:
            valid = np.ones(len(idx), dtype=bool)
        if self.sort_by_length:
            order = np.argsort(-self.instr_len[idx], kind="stable")
            idx, valid = idx[order], valid[order]
        self._cur_indices, self._cur_valid = idx, valid
        if self._multihost:
            return self._place(self._gather_np(idx, valid))
        return self._place(_gather_batch(self._device_arrays(), jnp.asarray(idx.astype(np.int32)),
                                         jnp.asarray(valid)))

    def next_batch(self, restart: bool = False, tile_one: bool = False) -> EpisodeBatch:
        """Next training minibatch; ``restart=True`` re-emits the current one
        (the EnvDrop IL->RL dual-rollout contract, trainer.py:411-421)."""
        if restart:
            assert self._cur_indices is not None, "restart before any batch"
            return self._make_batch_norestore()
        return self._make_batch(self._next_indices(tile_one=tile_one))

    def _make_batch_norestore(self) -> EpisodeBatch:
        idx, valid = self._cur_indices, self._cur_valid
        if self._multihost:
            return self._place(self._gather_np(idx, valid))
        return self._place(_gather_batch(self._device_arrays(), jnp.asarray(idx.astype(np.int32)),
                                         jnp.asarray(valid)))

    def inject_batch(self, idx: np.ndarray, instr_tokens: np.ndarray, instr_len: np.ndarray) -> EpisodeBatch:
        """Current episodes with replaced instructions (back-translation path,
        ref: envdrop.py:105-121)."""
        valid = np.ones(len(idx), dtype=bool)
        self._cur_indices, self._cur_valid = idx, valid
        return self._place(EpisodeBatch(
            instr_tokens=jnp.asarray(instr_tokens.astype(np.int32)),
            instr_len=jnp.asarray(instr_len.astype(np.int32)),
            start_node=jnp.asarray(self.start_node[idx]),
            start_heading=jnp.asarray(self.start_heading[idx]),
            goal=jnp.asarray(self.goal[idx]),
            goal_local=jnp.asarray(self.goal_local[idx]),
            item_idx=jnp.asarray(idx.astype(np.int32)),
            valid=jnp.asarray(valid),
            path_local=jnp.asarray(self.path_local[idx]),
            path_len=jnp.asarray(self.path_len[idx]),
        ))

    @property
    def cur_batch_index(self) -> np.ndarray:
        """Dataset indices of the current batch rows (SPCL weighting;
        ref: curriculum_env.py:100-102)."""
        assert self._cur_indices is not None
        return self._cur_indices

    @property
    def cur_batch_max_hops(self) -> int:
        """Longest teacher path (edges) in the current batch — the IL
        episode-length bucketing key (a teacher-forced episode needs
        exactly hops+1 steps incl. STOP)."""
        assert self._cur_indices is not None
        return int(self.hops[self._cur_indices].max())

    def eval_batches(self) -> Iterator[EpisodeBatch]:
        """Cover every item exactly once; tail padded with valid=False."""
        n = len(self.data)
        order = np.arange(n, dtype=np.int64)
        for s in range(0, n, self.batch_size):
            idx = order[s : s + self.batch_size]
            valid = np.ones(len(idx), dtype=bool)
            if len(idx) < self.batch_size:
                pad = self.batch_size - len(idx)
                idx = np.concatenate([idx, np.zeros(pad, dtype=np.int64)])
                valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
            yield self._make_batch(idx, valid)

    # -- stats ------------------------------------------------------------
    def get_statistics(self) -> Dict[str, float]:
        """Average instruction length and path length (common_env.py:355-365)."""
        length = 0.0
        path = 0.0
        for i, item in enumerate(self.data):
            length += len(split_sentence(item["instructions"]))
            path += float(self.world.dist[self.start_node[i], self.goal_local[i]])
        return {"length": length / len(self.data), "path": path / len(self.data)}


class CLR2RBatchEnv(R2RBatchEnv):
    """Curriculum dataset: all 5 CLR2R rounds with SPCL bookkeeping."""

    def __init__(
        self,
        world: CompiledWorld,
        rounds: Dict[str, List[dict]],
        batch_size: int,
        c_rate: float = 0.8,
        tokenizer: Optional[Tokenizer] = None,
        seed: int = 0,
        teacher_mode: str = "goal",
    ):
        data: List[dict] = []
        difficulties: List[int] = []
        self.curriculum_data = dict(rounds)
        for k in range(1, len(rounds) + 1):
            round_items = rounds[f"round_{k}"]
            data.extend(round_items)
            difficulties.extend([k] * len(round_items))
        super().__init__(world, data, batch_size, tokenizer=tokenizer, seed=seed, name="train",
                         teacher_mode=teacher_mode)
        # a[i] = difficulty (round number); capacity c = sum(a) * c_rate
        # (ref: curriculum_env.py:81-92). Item order *is* the global index.
        self.a = np.array(difficulties, dtype=np.float32)
        self.c_rate = c_rate
        self.c = float(self.a.sum() * c_rate)
        self.item2idx = {item["instr_id"]: i for i, item in enumerate(self.data)}

    def __len__(self) -> int:
        return len(self.data)

    def index(self, item: dict) -> int:
        return self.item2idx[item["instr_id"]]
