"""X4 fallback — pure-Python stand-ins for the igraph / pandana
export targets (reference: graphs.py:240-326 for igraph,
graphs.py:329-411 + graph_export.pyx:196-236 for pandana).

The reference hard-requires the C runtimes and raises ImportError when
they are absent. This container has neither, so the exporters in
``operators/export.py`` keep that message contract by default but can
return these objects instead (``fallback=True``): driver-side,
dependency-free implementations of the API *subset* the reference's
own documentation exercises on the exported objects — attribute
access, degrees, components, and weighted shortest-path routing.

These are terminal driver-side conveniences over already-collected
frames (same role as ``to_networkx``); nothing here is on a scale
path. The distributed pipeline (directed edges, SCC retention,
simplification, endpoint closure) has already run by the time these
constructors see data, and the frame contracts they consume are the
ones ``igraph_frames`` / ``pandana_frames`` build and test.
"""

from __future__ import annotations

import heapq
from collections import deque


# --------------------------------------------------------------------
# igraph-compatible subset
# --------------------------------------------------------------------

class _AttrSeq:
    """Sequence view over vertex/edge attributes, igraph-style:
    ``g.vs["id"]`` -> column list, ``g.vs[3]`` -> one element with
    dict access, ``len(g.vs)`` -> count."""

    def __init__(self, n: int, attrs: dict):
        self._n = n
        self._attrs = {k: list(v) for k, v in (attrs or {}).items()}
        for k, v in self._attrs.items():
            if len(v) != n:
                raise ValueError(
                    f"attribute {k!r} has {len(v)} values for {n} items")

    def __len__(self):
        return self._n

    def attributes(self):
        return list(self._attrs)

    def __getitem__(self, key):
        if isinstance(key, str):
            return list(self._attrs[key])
        if isinstance(key, slice):
            return [self[i] for i in range(*key.indices(self._n))]
        i = int(key)
        if i < 0:
            i += self._n
        if not 0 <= i < self._n:
            raise IndexError(key)
        return _AttrElem(i, self._attrs)


class _AttrElem:
    """One vertex/edge: ``v.index``, ``v["name"]``, ``v.attributes()``."""

    def __init__(self, index: int, attrs: dict):
        self.index = index
        self._attrs = attrs

    def __getitem__(self, key):
        return self._attrs[key][self.index]

    def attributes(self):
        return {k: v[self.index] for k, v in self._attrs.items()}


class LiteClustering:
    """Subset of igraph.VertexClustering: ``membership``, ``len()``,
    ``sizes()``, ``giant()`` (as a vertex-index list)."""

    def __init__(self, membership):
        self.membership = list(membership)
        self._n_clusters = (max(self.membership) + 1
                            if self.membership else 0)

    def __len__(self):
        return self._n_clusters

    def sizes(self):
        out = [0] * self._n_clusters
        for m in self.membership:
            out[m] += 1
        return out

    def giant(self):
        if not self._n_clusters:
            return []
        sizes = self.sizes()
        best = sizes.index(max(sizes))
        return [i for i, m in enumerate(self.membership) if m == best]


class LiteGraph:
    """Pure-Python igraph.Graph stand-in.

    Constructor signature matches the call the real exporter makes
    (``igraph.Graph(n=..., directed=True, edges=..., vertex_attrs=...,
    edge_attrs=...)``, reference graphs.py:316-326). Implemented
    subset: ``vcount/ecount/is_directed``, ``vs``/``es`` attribute
    sequences, ``degree``, ``neighbors``, ``connected_components``,
    ``get_shortest_paths`` and ``distances`` (Dijkstra, optional
    per-edge weights by attribute name or explicit list).
    """

    def __init__(self, n=0, directed=False, edges=None,
                 vertex_attrs=None, edge_attrs=None):
        self._n = int(n)
        self._directed = bool(directed)
        self._edges = [(int(u), int(v)) for u, v in (edges or [])]
        for u, v in self._edges:
            if not (0 <= u < self._n and 0 <= v < self._n):
                raise ValueError(f"edge ({u}, {v}) out of range 0..{n - 1}")
        self.vs = _AttrSeq(self._n, vertex_attrs or {})
        self.es = _AttrSeq(len(self._edges), edge_attrs or {})
        # adjacency: vertex -> [(neighbor, edge_index)]
        self._out = [[] for _ in range(self._n)]
        self._in = [[] for _ in range(self._n)]
        for ei, (u, v) in enumerate(self._edges):
            self._out[u].append((v, ei))
            self._in[v].append((u, ei))
            if not self._directed and u != v:
                self._out[v].append((u, ei))
                self._in[u].append((v, ei))

    # -- structure ----------------------------------------------------
    def vcount(self):
        return self._n

    def ecount(self):
        return len(self._edges)

    def is_directed(self):
        return self._directed

    def get_edgelist(self):
        return list(self._edges)

    def _adj(self, mode):
        if not self._directed or mode == "out":
            return self._out
        if mode == "in":
            return self._in
        # mode == "all": union of both directions
        both = [list(o) for o in self._out]
        for v, lst in enumerate(self._in):
            both[v].extend(lst)
        return both

    def neighbors(self, vertex, mode="out"):
        v = vertex.index if isinstance(vertex, _AttrElem) else int(vertex)
        return [nbr for nbr, _ in self._adj(mode)[v]]

    def degree(self, vertices=None, mode="all"):
        adj = self._adj(mode if self._directed else "out")
        if self._directed and mode == "all":
            degs = [len(self._out[v]) + len(self._in[v])
                    for v in range(self._n)]
        else:
            degs = [len(adj[v]) for v in range(self._n)]
            if not self._directed:
                # igraph counts undirected self-loops twice
                for u, v in self._edges:
                    if u == v:
                        degs[u] += 1
        if vertices is None:
            return degs
        if isinstance(vertices, int):
            return degs[vertices]
        return [degs[int(v)] for v in vertices]

    # -- components ---------------------------------------------------
    def connected_components(self, mode="weak"):
        if mode not in ("weak", "strong"):
            raise ValueError(mode)
        if mode == "strong" and self._directed:
            return LiteClustering(self._strong_membership())
        membership = [-1] * self._n
        comp = 0
        und = [set() for _ in range(self._n)]
        for u, v in self._edges:
            und[u].add(v)
            und[v].add(u)
        for start in range(self._n):
            if membership[start] >= 0:
                continue
            queue = deque([start])
            membership[start] = comp
            while queue:
                cur = queue.popleft()
                for nbr in und[cur]:
                    if membership[nbr] < 0:
                        membership[nbr] = comp
                        queue.append(nbr)
            comp += 1
        return LiteClustering(membership)

    def _strong_membership(self):
        """Iterative Tarjan (same algorithm as the driver-side arm of
        operators/graph.py, re-derived here over vertex indices)."""
        n = self._n
        index = [-1] * n
        low = [0] * n
        on_stack = [False] * n
        stack, membership = [], [-1] * n
        counter = 0
        comp = 0
        for root in range(n):
            if index[root] >= 0:
                continue
            work = [(root, 0)]
            while work:
                v, pi = work.pop()
                if pi == 0:
                    index[v] = low[v] = counter
                    counter += 1
                    stack.append(v)
                    on_stack[v] = True
                recurse = False
                out = self._out[v]
                for i in range(pi, len(out)):
                    w = out[i][0]
                    if index[w] < 0:
                        work.append((v, i + 1))
                        work.append((w, 0))
                        recurse = True
                        break
                    if on_stack[w]:
                        low[v] = min(low[v], index[w])
                if recurse:
                    continue
                if low[v] == index[v]:
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        membership[w] = comp
                        if w == v:
                            break
                    comp += 1
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[v])
        return membership

    # -- routing ------------------------------------------------------
    def _edge_weights(self, weights):
        if weights is None:
            return None
        if isinstance(weights, str):
            return [float(w) for w in self.es[weights]]
        w = [float(x) for x in weights]
        if len(w) != len(self._edges):
            raise ValueError("weights length != ecount")
        return w

    def _dijkstra(self, source, weights, mode="out"):
        adj = self._adj(mode)
        dist = [float("inf")] * self._n
        prev = [-1] * self._n
        dist[source] = 0.0
        heap = [(0.0, source)]
        while heap:
            d, v = heapq.heappop(heap)
            if d > dist[v]:
                continue
            for nbr, ei in adj[v]:
                nd = d + (1.0 if weights is None else weights[ei])
                if nd < dist[nbr]:
                    dist[nbr] = nd
                    prev[nbr] = v
                    heapq.heappush(heap, (nd, nbr))
        return dist, prev

    def distances(self, source=None, target=None, weights=None,
                  mode="out"):
        w = self._edge_weights(weights)
        sources = (range(self._n) if source is None else
                   [source] if isinstance(source, int) else list(source))
        targets = (range(self._n) if target is None else
                   [target] if isinstance(target, int) else list(target))
        out = []
        for s in sources:
            dist, _ = self._dijkstra(int(s), w, mode)
            out.append([dist[int(t)] for t in targets])
        return out

    def get_shortest_paths(self, v, to=None, weights=None, mode="out",
                           output="vpath"):
        if output != "vpath":
            raise NotImplementedError("only output='vpath'")
        src = v.index if isinstance(v, _AttrElem) else int(v)
        targets = (range(self._n) if to is None else
                   [to] if isinstance(to, int) else list(to))
        w = self._edge_weights(weights)
        dist, prev = self._dijkstra(src, w, mode)
        paths = []
        for t in targets:
            t = int(t)
            if dist[t] == float("inf"):
                paths.append([])
                continue
            path = [t]
            while path[-1] != src:
                path.append(prev[path[-1]])
            paths.append(path[::-1])
        return paths


# --------------------------------------------------------------------
# pandana-compatible subset
# --------------------------------------------------------------------

class LiteNetwork:
    """Pure-Python pandana.Network stand-in.

    Constructor matches the call the real exporter makes
    (``Network(node_x, node_y, edge_from, edge_to, edge_weights,
    twoway=False)``, reference graphs.py:356-366): pandas Series for
    coordinates (indexed by node id), Series for edge endpoints, a
    DataFrame of weight columns. Implemented subset:
    ``shortest_path``, ``shortest_path_length``,
    ``shortest_path_lengths``, ``get_node_ids`` (brute-force nearest
    node — fine for a driver-side object over collected frames).
    """

    def __init__(self, node_x, node_y, edge_from, edge_to,
                 edge_weights, twoway=False):
        self.node_ids = [x for x in node_x.index]
        self._pos = {nid: (float(x), float(y)) for nid, x, y in
                     zip(self.node_ids, node_x.tolist(), node_y.tolist())}
        self.impedance_names = list(edge_weights.columns)
        if not self.impedance_names:
            raise ValueError("edge_weights needs >= 1 column")
        self._adj = {}  # imp_name -> {node: [(nbr, w)]}
        frm = edge_from.tolist()
        to = edge_to.tolist()
        for imp in self.impedance_names:
            adj = {nid: [] for nid in self.node_ids}
            for u, v, w in zip(frm, to, edge_weights[imp].tolist()):
                adj[u].append((v, float(w)))
                if twoway:
                    adj[v].append((u, float(w)))
            self._adj[imp] = adj

    def _dijkstra(self, source, imp_name):
        imp = imp_name or self.impedance_names[0]
        adj = self._adj[imp]
        dist = {source: 0.0}
        prev = {}
        heap = [(0.0, source)]
        seen = set()
        while heap:
            d, v = heapq.heappop(heap)
            if v in seen:
                continue
            seen.add(v)
            for nbr, w in adj.get(v, ()):
                nd = d + w
                if nd < dist.get(nbr, float("inf")):
                    dist[nbr] = nd
                    prev[nbr] = v
                    heapq.heappush(heap, (nd, nbr))
        return dist, prev

    def shortest_path(self, node_a, node_b, imp_name=None):
        dist, prev = self._dijkstra(node_a, imp_name)
        if node_b not in dist:
            return []
        path = [node_b]
        while path[-1] != node_a:
            path.append(prev[path[-1]])
        return path[::-1]

    def shortest_path_length(self, node_a, node_b, imp_name=None):
        dist, _ = self._dijkstra(node_a, imp_name)
        return dist.get(node_b, float("inf"))

    def shortest_path_lengths(self, nodes_a, nodes_b, imp_name=None):
        out = []
        cache = {}
        for a, b in zip(nodes_a, nodes_b):
            if a not in cache:
                cache[a] = self._dijkstra(a, imp_name)[0]
            out.append(cache[a].get(b, float("inf")))
        return out

    def get_node_ids(self, x_col, y_col, mapping_distance=None):
        """Nearest network node per query point (euclidean in lon/lat,
        like pandana's kd-tree mapping); brute force over the collected
        node frame."""
        import numpy as np
        import pandas as pd

        nx = np.array([self._pos[n][0] for n in self.node_ids])
        ny = np.array([self._pos[n][1] for n in self.node_ids])
        qx = np.asarray(list(x_col), dtype=float)
        qy = np.asarray(list(y_col), dtype=float)
        out = []
        for i in range(len(qx)):
            d2 = (nx - qx[i]) ** 2 + (ny - qy[i]) ** 2
            j = int(np.argmin(d2))
            if (mapping_distance is not None
                    and d2[j] ** 0.5 > mapping_distance):
                out.append(-1)
            else:
                out.append(self.node_ids[j])
        index = x_col.index if isinstance(x_col, pd.Series) else None
        return pd.Series(out, index=index)
