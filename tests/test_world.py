"""World compiler: shortest paths, candidate tables, caching, native parity."""
import numpy as np
import pytest

from curriculum_learning_for_vln_tpu.world import compiler, graph, native, synthetic


def brute_dijkstra(g: graph.ScanGraph):
    """Reference shortest paths via heapq (independent of scipy path)."""
    import heapq

    V = g.num_nodes
    w = g.edge_weights()
    adj = [[] for _ in range(V)]
    for (a, b), ww in zip(g.edges, w):
        adj[a].append((int(b), float(ww)))
        adj[b].append((int(a), float(ww)))
    dist = np.full((V, V), np.inf)
    for s in range(V):
        dist[s, s] = 0.0
        pq = [(0.0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist[s, u]:
                continue
            for v, ww in adj[u]:
                nd = d + ww
                if nd < dist[s, v]:
                    dist[s, v] = nd
                    heapq.heappush(pq, (nd, v))
    return dist


def test_shortest_paths_and_next_hop(synth_graphs):
    g = next(iter(synth_graphs.values()))
    dist, nh = graph.shortest_paths(g)
    ref = brute_dijkstra(g)
    assert np.allclose(dist, ref, atol=1e-4)
    # next-hop consistency: following next_hop reduces distance by edge weight
    V = g.num_nodes
    for s in range(V):
        for t in range(V):
            if s == t:
                assert nh[s, t] == s
                continue
            h = nh[s, t]
            assert h != s
            edge_w = np.linalg.norm(g.pos[s] - g.pos[h])
            assert np.isclose(dist[s, t], edge_w + dist[h, t], atol=1e-3)


def test_connectivity_roundtrip(tmp_path, synth_graphs):
    g = next(iter(synth_graphs.values()))
    graph.write_connectivity(g, str(tmp_path))
    g2 = graph.load_connectivity(g.scan_id, str(tmp_path))
    assert g2.node_ids == g.node_ids
    assert np.allclose(g2.pos, g.pos, atol=1e-5)
    assert np.array_equal(np.sort(g2.edges, axis=0), np.sort(g.edges, axis=0))


def test_compiled_world_tables(synth_world, synth_graphs):
    w = synth_world
    assert w.num_nodes == sum(g.num_nodes for g in synth_graphs.values())
    # candidate targets are same-scan neighbors; headings/views consistent
    for gi in range(0, w.num_nodes, 7):
        n = int(w.n_cands[gi])
        for j in range(n):
            tgt = int(w.cand_next[gi, j])
            assert w.node_scan[tgt] == w.node_scan[gi]
            v = int(w.cand_view[gi, j])
            assert 0 <= v < 36
            # view column is the rounded heading column
            h = float(w.cand_heading[gi, j])
            assert int(np.round(h / (np.pi / 6))) % 12 == v % 12
        assert not w.cand_valid[gi, n:].any()
    # distance table: dist to own local index is 0
    for gi in range(w.num_nodes):
        assert w.dist[gi, int(w.node_local[gi])] == 0.0


def test_world_cache_roundtrip(tmp_path, synth_world):
    path = str(tmp_path / "world.npz")
    synth_world.save(path)
    w2 = compiler.CompiledWorld.load(path)
    assert w2.scan_ids == synth_world.scan_ids
    assert np.array_equal(w2.cand_next, synth_world.cand_next)
    assert np.allclose(w2.dist, synth_world.dist)
    s = synth_world.scan_ids[0]
    assert np.allclose(w2.scan_dist(s), synth_world.scan_dist(s))


@pytest.mark.skipif(not native.native_available(), reason="C++ toolchain unavailable")
def test_native_allpairs_matches_python(synth_graphs):
    g = next(iter(synth_graphs.values()))
    dist_py, nh_py = graph.shortest_paths(g)
    out = native.native_shortest_paths(g)
    assert out is not None
    dist_c, nh_c = out
    assert np.allclose(dist_c, dist_py, atol=1e-3)
    # next-hop may differ on equal-cost ties; verify optimality instead
    V = g.num_nodes
    for s in range(V):
        for t in range(V):
            if s == t:
                continue
            h = nh_c[s, t]
            edge_w = np.linalg.norm(g.pos[s] - g.pos[h])
            assert np.isclose(dist_c[s, t], edge_w + dist_py[h, t], atol=1e-3)


@pytest.mark.skipif(not native.native_available(), reason="C++ toolchain unavailable")
def test_native_sim_contract(synth_graphs):
    g = next(iter(synth_graphs.values()))
    nw = native.NativeWorld(g)
    sim = native.GraphSim(nw)
    sim.new_episode(0, heading=0.0)
    st = sim.get_state()
    assert st["node"] == 0 and st["viewIndex"] == 12

    # sweep all 36 views like make_candidate (ref: common_env.py:234-243)
    seen = {}
    sim.new_episode(0, heading=0.0, elevation=-np.pi / 6)
    for ix in range(36):
        if ix == 0:
            pass
        elif ix % 12 == 0:
            sim.make_action(0, 1.0 * np.pi / 6, 1.0 * np.pi / 6)
        else:
            sim.make_action(0, 1.0 * np.pi / 6, 0)
        st = sim.get_state()
        assert st["viewIndex"] == ix
        nodes, rh, re = sim.navigable()
        for node, r_h, r_e in zip(nodes[1:], rh[1:], re[1:]):
            d = np.sqrt(r_h**2 + r_e**2)
            if node not in seen or d < seen[node][0]:
                seen[node] = (d, ix)
    # every neighbor appears, at its angularly closest view
    nbrs = set(int(x) for x in g.neighbors()[0])
    assert set(seen) == nbrs

    # compare to compiler geometry
    for node, (_, view) in seen.items():
        h, e, v = compiler.candidate_geometry(g.pos[0], g.pos[np.array([node])])
        assert v[0] % 12 == view % 12
