"""Python-facing BVH API backed by the native C++ core (ctypes).

Plays the role of the reference's BLAS/TLAS layer (ref: Source/Bvh/BLAS.cs,
TLAS.cs). The shared library is compiled on first import and cached next to
the source; a pure-numpy fallback builder (binned median/SAH) keeps the
framework functional without a toolchain.

Node layout (32 B, SoA-extracted for the device):
    min[3] f32 | left_or_first u32 | max[3] f32 | count u32
interior: left child index, right = left + 1, count == 0
leaf:     [first, first+count) range into tri_indices (original triangle ids)
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_CPP_DIR = os.path.join(_DIR, "cpp")
_SO_PATH = os.path.join(_CPP_DIR, "libidk_bvh.so")

NODE_DTYPE = np.dtype(
    {
        "names": ["min", "left_or_first", "max", "count"],
        "formats": [("<f4", (3,)), "<u4", ("<f4", (3,)), "<u4"],
        "offsets": [0, 12, 16, 28],
        "itemsize": 32,
    }
)

_lib = None


class _BlasView(ctypes.Structure):
    _fields_ = [
        ("nodes", ctypes.c_void_p),
        ("node_count", ctypes.c_uint32),
        ("tri_indices", ctypes.c_void_p),
        ("tri_index_count", ctypes.c_uint32),
        ("parents", ctypes.c_void_p),
        ("max_depth", ctypes.c_uint32),
        ("sah_cost", ctypes.c_float),
        ("build_ms", ctypes.c_double),
    ]


def _compile_native() -> bool:
    src = os.path.join(_CPP_DIR, "bvh.cpp")
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["make", "-C", _CPP_DIR, "libidk_bvh.so"],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _compile_native():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.blas_build.restype = ctypes.c_void_p
    lib.blas_build.argtypes = [
        f32p, ctypes.c_uint32, u32p, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_float, ctypes.c_float,
    ]
    lib.blas_view.argtypes = [ctypes.c_void_p, ctypes.POINTER(_BlasView)]
    lib.blas_destroy.argtypes = [ctypes.c_void_p]
    lib.blas_refit.argtypes = [ctypes.c_void_p, f32p, u32p]
    lib.blas_intersect_ray.restype = ctypes.c_int
    lib.blas_intersect_ray.argtypes = [
        ctypes.c_void_p, f32p, u32p, f32p, f32p, ctypes.c_float,
        f32p, f32p, f32p, u32p,
    ]
    lib.blas_intersect_box.restype = ctypes.c_uint32
    lib.blas_intersect_box.argtypes = [ctypes.c_void_p, f32p, f32p, u32p, ctypes.c_uint32]
    lib.tlas_build.restype = ctypes.c_void_p
    lib.tlas_build.argtypes = [f32p, ctypes.c_uint32, ctypes.c_uint32]
    lib.blas_epo.restype = ctypes.c_float
    lib.blas_epo.argtypes = [
        ctypes.c_void_p, f32p, u32p, ctypes.c_uint32, ctypes.c_uint32,
    ]
    lib.sphere_vs_triangles.restype = ctypes.c_int
    lib.sphere_vs_triangles.argtypes = [
        f32p, u32p, u32p, ctypes.c_uint32, f32p, ctypes.c_float, f32p, f32p,
    ]
    # tree flatten/collapse helpers (native versions of the per-node Python
    # loops in bvh/flatten.py + ops/packet_trace.py — setup-time hot path)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.bvh_thread_links.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, i64p, i64p]
    lib.bvh_collapse_leaves.restype = ctypes.c_int64
    lib.bvh_collapse_leaves.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_void_p, i64p]
    lib.bvh_segment_roots.restype = ctypes.c_int64
    lib.bvh_segment_roots.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_double, ctypes.c_int64,
        i64p]
    lib.bvh_subtree_extract.restype = ctypes.c_int64
    lib.bvh_subtree_extract.argtypes = [
        ctypes.c_void_p, i64p, ctypes.c_uint32, ctypes.c_void_p, i64p]
    lib.bvh_collapse_wide.restype = ctypes.c_int64
    lib.bvh_collapse_wide.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, i64p, i64p, i64p, i64p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


# -- native tree helpers (None when the .so is unavailable; callers keep a
#    bit-identical numpy fallback) ------------------------------------------

def tree_thread_links(nodes: np.ndarray):
    """(order, subtree_end) of the DFS preorder — see flatten.thread_bvh."""
    lib = _load()
    if lib is None:
        return None
    nodes = np.ascontiguousarray(nodes)
    n = nodes.shape[0]
    order = np.empty(n, np.int64)
    send = np.empty(n, np.int64)
    lib.bvh_thread_links(nodes.ctypes.data, np.uint32(n),
                         _i64p(order), _i64p(send))
    return order, send


def tree_collapse_leaves(nodes: np.ndarray, max_leaf: int):
    lib = _load()
    if lib is None:
        return None
    nodes = np.ascontiguousarray(nodes)
    n = nodes.shape[0]
    out = np.zeros(n, nodes.dtype)
    orig = np.zeros(n, np.int64)
    n_out = lib.bvh_collapse_leaves(nodes.ctypes.data, np.uint32(n),
                                    np.uint32(max_leaf), out.ctypes.data,
                                    _i64p(orig))
    return out[:n_out].copy(), orig[:n_out].copy()


def tree_segment_roots(nodes: np.ndarray, budget: float,
                       leaves_per_row: int):
    lib = _load()
    if lib is None:
        return None
    nodes = np.ascontiguousarray(nodes)
    n = nodes.shape[0]
    roots = np.empty(n, np.int64)
    cnt = lib.bvh_segment_roots(nodes.ctypes.data, np.uint32(n),
                                float(budget), leaves_per_row, _i64p(roots))
    return [int(r) for r in roots[:cnt]]


def tree_subtree_extract(nodes: np.ndarray, orig: np.ndarray, root: int):
    lib = _load()
    if lib is None:
        return None
    nodes = np.ascontiguousarray(nodes)
    orig = np.ascontiguousarray(orig, np.int64)
    n = nodes.shape[0]
    out = np.zeros(n, nodes.dtype)
    o_map = np.zeros(n, np.int64)
    n_out = lib.bvh_subtree_extract(nodes.ctypes.data, _i64p(orig),
                                    np.uint32(root), out.ctypes.data,
                                    _i64p(o_map))
    return out[:n_out].copy(), o_map[:n_out].copy()


def tree_collapse_wide(nodes: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    nodes = np.ascontiguousarray(nodes)
    n = nodes.shape[0]
    cap = n // 2 + 2
    kids = np.empty((cap, 8), np.int64)
    axis = np.empty(cap, np.int64)
    order = np.empty(cap, np.int64)
    meta0_of = np.full(n, -1, np.int64)
    W = lib.bvh_collapse_wide(nodes.ctypes.data, np.uint32(n), _i64p(kids),
                              _i64p(axis), _i64p(order), _i64p(meta0_of))
    return (kids[:W].copy(), axis[:W].copy(), order[:W].copy(), meta0_of)


@dataclass
class BuildSettings:
    """ref: BLAS.cs BuildSettings:31-48."""

    max_leaf_triangle_count: int = 4
    traversal_cost: float = 1.2
    presplit_factor: float = 0.0  # 0.3 is the reference's tuned default


class BLAS:
    """Bottom-level acceleration structure over one mesh's triangles."""

    def __init__(
        self,
        vertices: np.ndarray,
        indices: np.ndarray,
        settings: BuildSettings | None = None,
    ):
        self.settings = settings or BuildSettings()
        self.vertices = np.ascontiguousarray(vertices, dtype=np.float32).reshape(-1, 3)
        self.indices = np.ascontiguousarray(indices, dtype=np.uint32).reshape(-1, 3)
        self._handle = None
        self._build()

    # -- build ------------------------------------------------------------
    def _build(self):
        lib = _load()
        if lib is not None:
            self._handle = ctypes.c_void_p(
                lib.blas_build(
                    _f32p(self.vertices),
                    np.uint32(self.vertices.shape[0]),
                    _u32p(self.indices),
                    np.uint32(self.indices.shape[0]),
                    np.uint32(self.settings.max_leaf_triangle_count),
                    np.float32(self.settings.traversal_cost),
                    np.float32(self.settings.presplit_factor),
                )
            )
            self._sync_from_native()
        else:
            self._build_fallback()

    def _sync_from_native(self):
        lib = _load()
        view = _BlasView()
        lib.blas_view(self._handle, ctypes.byref(view))
        def _copy(ptr, nbytes, dtype):
            if nbytes == 0 or not ptr:
                return np.empty(0, dtype=dtype)
            raw = ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8 * nbytes))
            return np.frombuffer(bytearray(raw.contents), dtype=dtype).copy()

        n = view.node_count
        self.nodes = _copy(view.nodes, 32 * n, NODE_DTYPE)
        self.tri_indices = _copy(view.tri_indices, 4 * view.tri_index_count, np.uint32)
        self.parents = _copy(view.parents, 4 * n, np.uint32)
        self.max_depth = int(view.max_depth)
        self.sah_cost = float(view.sah_cost)
        self.build_ms = float(view.build_ms)

    def _build_fallback(self):
        """Numpy median-split builder — correctness fallback only."""
        tris = self.indices
        if tris.shape[0] == 0:
            arr = np.zeros(1, dtype=NODE_DTYPE)
            arr[0]["min"] = 1e30
            arr[0]["max"] = -1e30
            self.nodes = arr
            self.tri_indices = np.empty(0, dtype=np.uint32)
            self.parents = np.array([0xFFFFFFFF], dtype=np.uint32)
            self.max_depth = 1
            self.sah_cost = 0.0
            self.build_ms = 0.0
            self._handle = None
            return
        v = self.vertices
        p = v[tris]  # (T,3,3)
        bmin, bmax = p.min(axis=1), p.max(axis=1)
        cent = 0.5 * (bmin + bmax)
        max_leaf = self.settings.max_leaf_triangle_count
        # Contiguous-pair allocation requires an explicit stack.
        nodes: list = []
        tri_order: list = []
        work = [(0, np.arange(tris.shape[0], dtype=np.int64))]
        nodes.append(None)
        while work:
            ni, ids = work.pop()
            lo = bmin[ids].min(axis=0)
            hi = bmax[ids].max(axis=0)
            if len(ids) <= max_leaf:
                first = len(tri_order)
                tri_order.extend(ids.tolist())
                nodes[ni] = (lo, first, hi, len(ids))
                continue
            axis = int(np.argmax(hi - lo))
            order = np.argsort(cent[ids, axis], kind="stable")
            ids = ids[order]
            mid = len(ids) // 2
            left = len(nodes)
            nodes.append(None)
            nodes.append(None)
            nodes[ni] = (lo, left, hi, 0)
            work.append((left + 1, ids[mid:]))
            work.append((left, ids[:mid]))
        arr = np.zeros(len(nodes), dtype=NODE_DTYPE)
        for i, (lo, lof, hi, cnt) in enumerate(nodes):
            arr[i]["min"] = lo
            arr[i]["max"] = hi
            arr[i]["left_or_first"] = lof
            arr[i]["count"] = cnt
        self.nodes = arr
        self.tri_indices = np.asarray(tri_order, dtype=np.uint32)
        self.parents = _parents_from_nodes(arr)
        self.max_depth = _depth_from_nodes(arr)
        self.sah_cost = compute_global_sah(arr, self.settings.traversal_cost)
        self.build_ms = 0.0
        self._handle = None

    def epo(self, max_nodes: int = 8192) -> float:
        """Global EPO quality metric (ref: BLAS.cs ComputeGlobalEPO:536-627,
        Aila et al. 2013): area of geometry overlapping node boxes outside
        their own subtrees, normalized by total triangle area. Exact for
        trees up to max_nodes nodes, strided estimate above. SAH misses
        overlap pathologies — the reference logs both after every build."""
        lib = _load()
        if lib is None or self._handle is None:
            return float("nan")
        return float(lib.blas_epo(
            self._handle, _f32p(self.vertices), _u32p(self.indices),
            np.uint32(self.indices.shape[0]), np.uint32(max_nodes)))

    # -- refit ------------------------------------------------------------
    def refit(self, vertices: np.ndarray):
        """Bottom-up AABB refit after vertex animation (ref: BLAS.cs:276-293)."""
        self.vertices = np.ascontiguousarray(vertices, dtype=np.float32).reshape(-1, 3)
        lib = _load()
        if lib is not None and self._handle is not None:
            lib.blas_refit(self._handle, _f32p(self.vertices), _u32p(self.indices))
            self._sync_from_native()
        else:
            refit_nodes_numpy(self.nodes, self.tri_indices, self.vertices, self.indices)

    # -- queries ----------------------------------------------------------
    def intersect_ray(self, origin, direction, t_max=3.4e38):
        """Closest hit: returns (t, u, v, tri_id) or None (ref: BLAS.cs:313-386)."""
        origin = np.ascontiguousarray(origin, dtype=np.float32)
        direction = np.ascontiguousarray(direction, dtype=np.float32)
        lib = _load()
        if lib is not None and self._handle is not None:
            t = ctypes.c_float()
            u = ctypes.c_float()
            v = ctypes.c_float()
            tri = ctypes.c_uint32()
            hit = lib.blas_intersect_ray(
                self._handle, _f32p(self.vertices), _u32p(self.indices),
                _f32p(origin), _f32p(direction), np.float32(t_max),
                ctypes.byref(t), ctypes.byref(u), ctypes.byref(v), ctypes.byref(tri),
            )
            if not hit:
                return None
            return (t.value, u.value, v.value, int(tri.value))
        return intersect_ray_numpy(
            self.nodes, self.tri_indices, self.vertices, self.indices, origin, direction, t_max
        )

    def intersect_box(self, box_min, box_max, cap: int = 65536) -> np.ndarray:
        """Triangle ids in leaves overlapping the AABB (ref: BLAS.cs:388-439)."""
        box_min = np.ascontiguousarray(box_min, dtype=np.float32)
        box_max = np.ascontiguousarray(box_max, dtype=np.float32)
        lib = _load()
        if lib is not None and self._handle is not None:
            out = np.empty(cap, dtype=np.uint32)
            n = lib.blas_intersect_box(self._handle, _f32p(box_min), _f32p(box_max), _u32p(out), np.uint32(cap))
            return out[:n]
        return intersect_box_numpy(self.nodes, self.tri_indices, box_min, box_max)

    def sphere_closest_triangle(self, candidate_tris, center, radius):
        """Closest triangle point within radius among candidates.

        Returns (closest_point, distance, local_index) or None
        (collision path, ref: Intersections.cs:38-94)."""
        candidate_tris = np.ascontiguousarray(candidate_tris, dtype=np.uint32)
        center = np.ascontiguousarray(center, dtype=np.float32)
        lib = _load()
        if lib is not None and candidate_tris.size:
            closest = np.empty(3, dtype=np.float32)
            dist = ctypes.c_float()
            i = lib.sphere_vs_triangles(
                _f32p(self.vertices), _u32p(self.indices), _u32p(candidate_tris),
                np.uint32(candidate_tris.size), _f32p(center), np.float32(radius),
                _f32p(closest), ctypes.byref(dist),
            )
            if i < 0:
                return None
            return closest, dist.value, int(i)
        return sphere_closest_triangle_numpy(
            self.vertices, self.indices, candidate_tris, center, radius
        )

    def __del__(self):
        lib = _lib
        if lib is not None and getattr(self, "_handle", None):
            lib.blas_destroy(self._handle)
            self._handle = None


class TLAS:
    """Top-level BVH over instance world AABBs via PLOC (ref: Source/Bvh/TLAS.cs)."""

    def __init__(self, instance_aabbs: np.ndarray, search_radius: int = 15):
        """instance_aabbs: (N, 6) [min xyz, max xyz]."""
        aabbs = np.ascontiguousarray(instance_aabbs, dtype=np.float32).reshape(-1, 6)
        self.n_instances = aabbs.shape[0]
        lib = _load()
        if lib is not None:
            handle = ctypes.c_void_p(
                lib.tlas_build(_f32p(aabbs), np.uint32(aabbs.shape[0]), np.uint32(search_radius))
            )
            view = _BlasView()
            lib.blas_view(handle, ctypes.byref(view))
            raw = ctypes.cast(view.nodes, ctypes.POINTER(ctypes.c_uint8 * (32 * view.node_count)))
            self.nodes = np.frombuffer(bytearray(raw.contents), dtype=NODE_DTYPE).copy()
            lib.blas_destroy(handle)
        else:
            self.nodes = _tlas_fallback(aabbs)


def _tlas_fallback(aabbs: np.ndarray) -> np.ndarray:
    """Median-split TLAS fallback with the same node layout."""
    n = aabbs.shape[0]
    if n == 0:
        return np.zeros(1, dtype=NODE_DTYPE)
    cent = 0.5 * (aabbs[:, :3] + aabbs[:, 3:])
    nodes: list = [None]
    work = [(0, np.arange(n, dtype=np.int64))]
    while work:
        ni, ids = work.pop()
        lo = aabbs[ids, :3].min(axis=0)
        hi = aabbs[ids, 3:].max(axis=0)
        if len(ids) == 1:
            nodes[ni] = (lo, int(ids[0]), hi, 1)
            continue
        axis = int(np.argmax(hi - lo))
        order = np.argsort(cent[ids, axis], kind="stable")
        ids = ids[order]
        mid = len(ids) // 2
        left = len(nodes)
        nodes.append(None)
        nodes.append(None)
        nodes[ni] = (lo, left, hi, 0)
        work.append((left + 1, ids[mid:]))
        work.append((left, ids[:mid]))
    arr = np.zeros(len(nodes), dtype=NODE_DTYPE)
    for i, (lo, lof, hi, cnt) in enumerate(nodes):
        arr[i]["min"], arr[i]["max"] = lo, hi
        arr[i]["left_or_first"], arr[i]["count"] = lof, cnt
    return arr


# ---------------------------------------------------------------------------
# Numpy reference implementations (fallback + test oracles)
# ---------------------------------------------------------------------------

def _parents_from_nodes(nodes: np.ndarray) -> np.ndarray:
    parents = np.full(nodes.shape[0], 0xFFFFFFFF, dtype=np.uint32)
    interior = nodes["count"] == 0
    left = nodes["left_or_first"][interior]
    src = np.nonzero(interior)[0]
    parents[left] = src
    parents[left + 1] = src
    return parents


def _depth_from_nodes(nodes: np.ndarray) -> int:
    depth = 0
    stack = [(0, 1)]
    while stack:
        ni, d = stack.pop()
        depth = max(depth, d)
        if nodes["count"][ni] == 0:
            l = int(nodes["left_or_first"][ni])
            stack.append((l, d + 1))
            stack.append((l + 1, d + 1))
    return depth


def compute_global_sah(nodes: np.ndarray, traversal_cost: float = 1.2) -> float:
    """Tree quality metric (ref: BLAS.cs ComputeGlobalSAH:629-657)."""
    ext = np.maximum(nodes["max"] - nodes["min"], 0.0)
    ha = ext[:, 0] * (ext[:, 1] + ext[:, 2]) + ext[:, 1] * ext[:, 2]
    root = max(float(ha[0]), 1e-30)
    interior = nodes["count"] == 0
    return float(
        (traversal_cost * ha[interior].sum() + (ha * nodes["count"])[~interior].sum()) / root
    )


def refit_nodes_numpy(nodes, tri_indices, vertices, indices):
    p = vertices[indices]  # (T,3,3)
    tmin, tmax = p.min(axis=1), p.max(axis=1)
    for i in range(nodes.shape[0] - 1, -1, -1):
        c = int(nodes["count"][i])
        lof = int(nodes["left_or_first"][i])
        if c > 0:
            tids = tri_indices[lof : lof + c]
            nodes["min"][i] = tmin[tids].min(axis=0)
            nodes["max"][i] = tmax[tids].max(axis=0)
        else:
            nodes["min"][i] = np.minimum(nodes["min"][lof], nodes["min"][lof + 1])
            nodes["max"][i] = np.maximum(nodes["max"][lof], nodes["max"][lof + 1])


def intersect_ray_numpy(nodes, tri_indices, vertices, indices, origin, direction, t_max=3.4e38):
    if nodes.shape[0] == 1 and nodes["count"][0] == 0:
        return None  # empty tree sentinel
    o = np.asarray(origin, np.float64)
    d = np.asarray(direction, np.float64)
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    best = (float(t_max), 0.0, 0.0, -1)

    def box_hit(ni, tcur):
        t0 = (nodes["min"][ni] - o) * inv
        t1 = (nodes["max"][ni] - o) * inv
        tn = np.minimum(t0, t1).max()
        tf = np.maximum(t0, t1).min()
        tn = max(tn, 0.0)
        return (tf >= tn and tn <= tcur), tn

    hit, _ = box_hit(0, best[0])
    if not hit:
        return None
    stack = [0]
    while stack:
        ni = stack.pop()
        c = int(nodes["count"][ni])
        lof = int(nodes["left_or_first"][ni])
        if c > 0:
            for s in range(lof, lof + c):
                tri = int(tri_indices[s])
                p0, p1, p2 = vertices[indices[tri]].astype(np.float64)
                e1, e2 = p1 - p0, p2 - p0
                pv = np.cross(d, e2)
                det = e1 @ pv
                if abs(det) < 1e-12:
                    continue
                invdet = 1.0 / det
                sv = o - p0
                u = (sv @ pv) * invdet
                if u < 0 or u > 1:
                    continue
                qv = np.cross(sv, e1)
                v = (d @ qv) * invdet
                if v < 0 or u + v > 1:
                    continue
                t = (e2 @ qv) * invdet
                if 0 < t < best[0]:
                    best = (t, u, v, tri)
        else:
            hl, tl = box_hit(lof, best[0])
            hr, tr = box_hit(lof + 1, best[0])
            if hl and hr:
                near, far = (lof, lof + 1) if tl <= tr else (lof + 1, lof)
                stack.append(far)
                stack.append(near)
            elif hl:
                stack.append(lof)
            elif hr:
                stack.append(lof + 1)
    if best[3] < 0:
        return None
    return best


def intersect_box_numpy(nodes, tri_indices, box_min, box_max):
    if nodes.shape[0] == 1 and nodes["count"][0] == 0:
        return np.empty(0, dtype=np.uint32)  # empty tree sentinel
    out = []
    stack = [0]

    def overlaps(ni):
        return bool(
            np.all(nodes["min"][ni] <= box_max) and np.all(nodes["max"][ni] >= box_min)
        )

    if not overlaps(0):
        return np.empty(0, dtype=np.uint32)
    while stack:
        ni = stack.pop()
        c = int(nodes["count"][ni])
        lof = int(nodes["left_or_first"][ni])
        if c > 0:
            out.extend(tri_indices[lof : lof + c].tolist())
        else:
            if overlaps(lof):
                stack.append(lof)
            if overlaps(lof + 1):
                stack.append(lof + 1)
    return np.asarray(out, dtype=np.uint32)


def closest_point_on_triangle(p, a, b, c):
    """Ericson real-time collision detection closest point (ref: Intersections.cs:38-94)."""
    ab, ac, ap = b - a, c - a, p - a
    d1, d2 = ab @ ap, ac @ ap
    if d1 <= 0 and d2 <= 0:
        return a
    bp = p - b
    d3, d4 = ab @ bp, ac @ bp
    if d3 >= 0 and d4 <= d3:
        return b
    vc = d1 * d4 - d3 * d2
    if vc <= 0 and d1 >= 0 and d3 <= 0:
        return a + ab * (d1 / (d1 - d3))
    cp = p - c
    d5, d6 = ab @ cp, ac @ cp
    if d6 >= 0 and d5 <= d6:
        return c
    vb = d5 * d2 - d1 * d6
    if vb <= 0 and d2 >= 0 and d6 <= 0:
        return a + ac * (d2 / (d2 - d6))
    va = d3 * d6 - d5 * d4
    if va <= 0 and (d4 - d3) >= 0 and (d5 - d6) >= 0:
        return b + (c - b) * ((d4 - d3) / ((d4 - d3) + (d5 - d6)))
    denom = 1.0 / (va + vb + vc)
    return a + ab * (vb * denom) + ac * (vc * denom)


def sphere_closest_triangle_numpy(vertices, indices, candidate_tris, center, radius):
    center = np.asarray(center, np.float64)
    best = (None, float(radius), -1)
    for i, t in enumerate(np.asarray(candidate_tris, np.int64)):
        a, b, c = vertices[indices[t]].astype(np.float64)
        q = closest_point_on_triangle(center, a, b, c)
        d = float(np.linalg.norm(q - center))
        if d < best[1]:
            best = (q.astype(np.float32), d, i)
    if best[2] < 0:
        return None
    return best
