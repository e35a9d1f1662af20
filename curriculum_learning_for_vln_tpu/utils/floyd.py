"""Incremental Floyd-Warshall graph for beam-search path stitching.

Behavior-parity rebuild of the reference FloydGraph
(`tasks/R2R-judy/src/utils/misc.py:493-542`): edges are added as the
search discovers viewpoints, ``update(k)`` relaxes all pairs through a
newly visited node, and ``path(x, y)`` reconstructs the stitched
navigation route.  Host-side only — used to shorten the physical
navigation path the beam search leaves behind, never in the hot loop.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Hashable, List

_INF = 95959595  # the reference's sentinel (misc.py:495)


class FloydGraph:
    def __init__(self):
        self._dis = defaultdict(lambda: defaultdict(lambda: _INF))
        self._point = defaultdict(lambda: defaultdict(lambda: ""))
        self._visited = set()

    def distance(self, x: Hashable, y: Hashable) -> float:
        return 0 if x == y else self._dis[x][y]

    def add_edge(self, x: Hashable, y: Hashable, dis: float) -> None:
        if dis < self._dis[x][y]:
            self._dis[x][y] = dis
            self._dis[y][x] = dis
            self._point[x][y] = ""
            self._point[y][x] = ""

    def update(self, k: Hashable) -> None:
        for x in list(self._dis):
            for y in list(self._dis):
                if x != y and self._dis[x][k] + self._dis[k][y] < self._dis[x][y]:
                    self._dis[x][y] = self._dis[x][k] + self._dis[k][y]
                    self._dis[y][x] = self._dis[x][y]
                    self._point[x][y] = k
                    self._point[y][x] = k
        self._visited.add(k)

    def visited(self, k: Hashable) -> bool:
        return k in self._visited

    def path(self, x: Hashable, y: Hashable) -> List[Hashable]:
        """Route from x to y as [v1, ..., y] (x excluded)."""
        if x == y:
            return []
        if self._point[x][y] == "":
            return [y]
        k = self._point[x][y]
        return self.path(x, k) + self.path(k, y)
