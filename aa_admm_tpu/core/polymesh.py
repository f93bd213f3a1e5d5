"""Host-side polygon-mesh connectivity (NumPy / pure Python).

The minimal subset of OpenMesh used by the geometry apps
(Geometry/MeshTypes.h, PlanarityOpt.cpp, WireMeshOpt.cpp): ordered vertex
one-rings, boundary detection, face circulators, average edge length, and
the quad subdivision + smoothing preprocess."""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Sequence, Set, Tuple

import numpy as np


@dataclasses.dataclass
class PolyMesh:
    verts: np.ndarray          # (V, 3)
    faces: List[List[int]]     # polygon faces, CCW

    def __post_init__(self):
        self._build()

    def _build(self):
        V = len(self.verts)
        self.edge_faces: Dict[Tuple[int, int], List[int]] = defaultdict(list)
        self.vert_faces: List[List[int]] = [[] for _ in range(V)]
        for fi, f in enumerate(self.faces):
            k = len(f)
            for i in range(k):
                a, b = f[i], f[(i + 1) % k]
                self.edge_faces[(min(a, b), max(a, b))].append(fi)
                self.vert_faces[f[i]].append(fi)
        self.boundary_edges: Set[Tuple[int, int]] = {
            e for e, fs in self.edge_faces.items() if len(fs) == 1}
        self._boundary_vert = np.zeros(V, bool)
        for (a, b) in self.boundary_edges:
            self._boundary_vert[a] = True
            self._boundary_vert[b] = True

    def n_verts(self) -> int:
        return len(self.verts)

    def n_faces(self) -> int:
        return len(self.faces)

    def is_boundary_vertex(self, v: int) -> bool:
        return bool(self._boundary_vert[v])

    def is_boundary_edge(self, a: int, b: int) -> bool:
        return (min(a, b), max(a, b)) in self.boundary_edges

    def vertex_ring(self, v: int) -> List[int]:
        """Neighbors of v in consistent cyclic order (a path for boundary
        vertices, a cycle for interior ones) — the equivalent of OpenMesh's
        vertex-vertex circulator."""
        # Ring graph: neighbors adjacent through a shared face corner at v.
        nbr_links: Dict[int, List[int]] = defaultdict(list)
        nbrs: Set[int] = set()
        for fi in self.vert_faces[v]:
            f = self.faces[fi]
            i = f.index(v)
            p, n = f[i - 1], f[(i + 1) % len(f)]
            nbrs.update((p, n))
            nbr_links[p].append(n)
            nbr_links[n].append(p)
        if not nbrs:
            return []
        # Start from a boundary neighbor (degree 1 in the ring graph) if any.
        start = None
        for u in nbrs:
            if len(nbr_links[u]) == 1:
                start = u
                break
        if start is None:
            start = min(nbrs)
        ring = [start]
        prev = None
        cur = start
        while True:
            nxt = None
            for u in nbr_links[cur]:
                if u != prev:
                    nxt = u
                    break
            if nxt is None or nxt == start or len(ring) >= len(nbrs):
                break
            ring.append(nxt)
            prev, cur = cur, nxt
        return ring

    def boundary_neighbors(self, v: int) -> Tuple[List[int], List[int]]:
        """For a boundary vertex: (neighbor vertices along boundary edges,
        the face adjacent to each such edge) — PlanarityOpt.cpp:208-230."""
        nbrs, fids = [], []
        for u in self.vertex_ring(v):
            key = (min(u, v), max(u, v))
            if key in self.boundary_edges:
                nbrs.append(u)
                fids.append(self.edge_faces[key][0])
        return nbrs, fids

    def average_edge_length(self) -> float:
        total, cnt = 0.0, 0
        for (a, b) in self.edge_faces:
            total += float(np.linalg.norm(self.verts[a] - self.verts[b]))
            cnt += 1
        return total / max(cnt, 1)

    def face_valences(self) -> np.ndarray:
        return np.asarray([len(f) for f in self.faces])


def quad_subdivide(mesh: PolyMesh) -> Tuple[PolyMesh, np.ndarray]:
    """Catmull-Clark-style topological split of a quad mesh: one new vertex
    per edge and per face; each quad becomes four
    (MeshTypes.h quad_subdivision, :158-212). Returns (mesh, is_new mask)."""
    verts = [v.copy() for v in mesh.verts]
    V = len(verts)
    edge_mid: Dict[Tuple[int, int], int] = {}
    for (a, b) in sorted(mesh.edge_faces):
        edge_mid[(a, b)] = len(verts)
        verts.append(0.5 * (mesh.verts[a] + mesh.verts[b]))
    face_center: List[int] = []
    for f in mesh.faces:
        face_center.append(len(verts))
        verts.append(np.mean(mesh.verts[f], axis=0))
    faces: List[List[int]] = []
    for fi, f in enumerate(mesh.faces):
        k = len(f)
        c = face_center[fi]
        for i in range(k):
            a = f[i]
            e_prev = edge_mid[(min(f[i - 1], a), max(f[i - 1], a))]
            e_next = edge_mid[(min(a, f[(i + 1) % k]), max(a, f[(i + 1) % k]))]
            faces.append([a, e_next, c, e_prev])
    is_new = np.zeros(len(verts), bool)
    is_new[V:] = True
    return PolyMesh(verts=np.asarray(verts), faces=faces), is_new


def smooth_new_vertices(mesh: PolyMesh, is_new: np.ndarray,
                        n_iters: int = 20) -> PolyMesh:
    """Laplacian-smooth only the newly inserted vertices, keeping originals
    fixed — the behavioral equivalent of the reduced LDLT solve in
    subdivide_and_smooth_mesh (MeshTypes.h:214-342), done iteratively."""
    verts = mesh.verts.copy()
    rings = [mesh.vertex_ring(v) if is_new[v] else None
             for v in range(len(verts))]
    for _ in range(n_iters):
        new_verts = verts.copy()
        for v in range(len(verts)):
            if rings[v]:
                new_verts[v] = verts[rings[v]].mean(axis=0)
        verts = new_verts
    return PolyMesh(verts=verts, faces=mesh.faces)
