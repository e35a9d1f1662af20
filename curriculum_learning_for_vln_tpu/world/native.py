"""ctypes binding for the native graphworld library.

Builds ``native/libgraphworld.so`` on demand (g++ via make) and exposes:

* ``native_shortest_paths(graph)`` — C++ all-pairs Dijkstra (the world
  compiler's fast path; Python/scipy fallback lives in ``graph.py``).
* ``GraphSim`` — the MatterSim-contract automaton
  (newEpisode / makeAction / getState / navigableLocations), used for
  environment parity tests and the host-loop baseline benchmark.  This is
  the TPU-stack replacement for the reference's external MatterSim build
  (ref: tasks/R2R-judy/src/utils/misc.py:346-390, README.md:45-56).

All entry points degrade gracefully (return None / raise ImportError) when
no C++ toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from .graph import ScanGraph

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgraphworld.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.gw_world_create.restype = ctypes.c_void_p
        lib.gw_world_create.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.gw_world_destroy.argtypes = [ctypes.c_void_p]
        lib.gw_allpairs.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)
        ]
        lib.gw_sim_create.restype = ctypes.c_void_p
        lib.gw_sim_create.argtypes = [ctypes.c_void_p]
        lib.gw_sim_destroy.argtypes = [ctypes.c_void_p]
        lib.gw_sim_new_episode.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_float]
        lib.gw_sim_make_action.restype = ctypes.c_int
        lib.gw_sim_make_action.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_float]
        lib.gw_sim_get_state.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.gw_sim_navigable.restype = ctypes.c_int
        lib.gw_sim_navigable.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_library() is not None


class NativeWorld:
    """A per-scan graph uploaded into the native library."""

    def __init__(self, graph: ScanGraph):
        lib = _load_library()
        if lib is None:
            raise ImportError("libgraphworld.so unavailable (no C++ toolchain?)")
        self._lib = lib
        self.graph = graph
        pos = np.ascontiguousarray(graph.pos, dtype=np.float32)
        ea = np.ascontiguousarray(graph.edges[:, 0], dtype=np.int32)
        eb = np.ascontiguousarray(graph.edges[:, 1], dtype=np.int32)
        self._handle = lib.gw_world_create(
            graph.num_nodes, len(graph.edges),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ea.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            eb.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )

    def allpairs(self) -> Tuple[np.ndarray, np.ndarray]:
        V = self.graph.num_nodes
        dist = np.empty((V, V), dtype=np.float32)
        nh = np.empty((V, V), dtype=np.int32)
        self._lib.gw_allpairs(
            self._handle,
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nh.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return dist, nh

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.gw_world_destroy(self._handle)
                self._handle = None
        except Exception:
            pass


def native_shortest_paths(graph: ScanGraph) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ all-pairs Dijkstra; None when the native library is unavailable."""
    if not native_available():
        return None
    return NativeWorld(graph).allpairs()


class GraphSim:
    """MatterSim-contract navigation automaton (native).

    State: (node, viewIndex, heading, elevation) with discretized 30-degree
    viewing angles; ``navigable()`` returns (nodes, rel_heading,
    rel_elevation) for the current view, slot 0 being the current pose.
    """

    MAX_LOCS = 64

    def __init__(self, world: NativeWorld):
        self._lib = world._lib
        self._world = world  # keep alive
        self._handle = self._lib.gw_sim_create(world._handle)
        self._nodes = np.empty(self.MAX_LOCS, dtype=np.int32)
        self._rh = np.empty(self.MAX_LOCS, dtype=np.float32)
        self._re = np.empty(self.MAX_LOCS, dtype=np.float32)

    def new_episode(self, node: int, heading: float, elevation: float = 0.0) -> None:
        self._lib.gw_sim_new_episode(self._handle, int(node), float(heading), float(elevation))

    def make_action(self, index: int, heading_chg: float, elevation_chg: float) -> None:
        rc = self._lib.gw_sim_make_action(self._handle, int(index), float(heading_chg), float(elevation_chg))
        if rc != 0:
            raise IndexError(f"invalid navigable index {index}")

    def get_state(self):
        node = ctypes.c_int()
        view = ctypes.c_int()
        heading = ctypes.c_float()
        elevation = ctypes.c_float()
        self._lib.gw_sim_get_state(
            self._handle, ctypes.byref(node), ctypes.byref(view),
            ctypes.byref(heading), ctypes.byref(elevation),
        )
        return {
            "node": node.value,
            "viewIndex": view.value,
            "heading": heading.value,
            "elevation": elevation.value,
        }

    def navigable(self):
        n = self._lib.gw_sim_navigable(
            self._handle, self.MAX_LOCS,
            self._nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            self._rh.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._re.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return self._nodes[:n].copy(), self._rh[:n].copy(), self._re[:n].copy()

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.gw_sim_destroy(self._handle)
                self._handle = None
        except Exception:
            pass
