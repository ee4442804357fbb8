"""Isosurface extraction from a dense SDF grid.

Replaces the reference's PyMCubes dependency (inference.py:20,119). The
TPU produces the SDF grid (the actual hot loop — see pipelines/infer);
surface assembly is a fully-vectorized host pass over only the active
cells (~R^2 of R^3). Algorithm: marching tetrahedra on a 6-tet cube
split — table-free, watertight, deterministic — with triangle winding
oriented by the local SDF gradient. Vertices are deduplicated by their
(edge endpoint, endpoint) identity so shared edges weld exactly.

Output convention matches the reference pipeline: vertex coordinates in
grid-index units, rescaled by the caller to [-1, 1]
(inference.py:122-124).
"""

from __future__ import annotations

import numpy as np

# 6 tetrahedra sharing the main diagonal (corner 0 -> corner 7); corners
# are numbered by bits (i, j, k) -> i*4 + j*2 + k over the unit cube.
_TETS = np.array(
    [
        [0, 5, 1, 7],
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
    ],
    dtype=np.int64,
)

_CORNER_OFFSETS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int64
)  # corner c -> (di, dj, dk)


def _edge_vertex(ids_a, ids_b, vals_a, vals_b, iso):
    """Lerp position along grid edge a->b where the SDF crosses iso.

    ids_*: [M] flat grid indices; vals_*: [M] SDF values.
    Returns (keys [M,2] sorted id pairs, t [M] lerp factor from a to b).
    """
    denom = vals_b - vals_a
    t = np.where(np.abs(denom) > 1e-12, (iso - vals_a) / denom, 0.5)
    t = np.clip(t, 0.0, 1.0)
    swap = ids_a > ids_b
    key_lo = np.where(swap, ids_b, ids_a)
    key_hi = np.where(swap, ids_a, ids_b)
    t = np.where(swap, 1.0 - t, t)
    return np.stack([key_lo, key_hi], axis=-1), t


def marching_tetrahedra(grid: np.ndarray, iso: float = 0.0):
    """Extract the iso-surface of ``grid`` [R0, R1, R2].

    Returns (vertices [V, 3] float32 in index coords, faces [F, 3] int64),
    with triangle normals pointing toward increasing SDF (outside).
    """
    grid = np.asarray(grid, dtype=np.float32)
    R0, R1, R2 = grid.shape
    inside = grid < iso
    if not inside.any() or inside.all():
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # active cells: any corner sign differs
    core = inside[:-1, :-1, :-1]
    diff = np.zeros_like(core)
    for di, dj, dk in _CORNER_OFFSETS[1:]:
        diff |= core != inside[di:R0 - 1 + di, dj:R1 - 1 + dj, dk:R2 - 1 + dk]
    ci, cj, ck = np.nonzero(diff)
    if ci.size == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # flat ids + values of the 8 corners of each active cell: [A, 8]
    corner_i = ci[:, None] + _CORNER_OFFSETS[None, :, 0]
    corner_j = cj[:, None] + _CORNER_OFFSETS[None, :, 1]
    corner_k = ck[:, None] + _CORNER_OFFSETS[None, :, 2]
    flat_ids = (corner_i * R1 + corner_j) * R2 + corner_k
    vals = grid.reshape(-1)[flat_ids]

    tri_keys = []  # list of [M, 3, 2] edge-key triples
    tri_ts = []    # list of [M, 3]

    for tet in _TETS:
        tid = flat_ids[:, tet]      # [A, 4]
        tva = vals[:, tet]          # [A, 4]
        tin = tva < iso             # [A, 4]
        count = tin.sum(axis=1)

        # --- case: exactly one corner on one side -> 1 triangle ----------
        for one_inside in (True, False):
            m = count == (1 if one_inside else 3)
            if not m.any():
                continue
            sel_in = tin[m] if one_inside else ~tin[m]
            a_idx = np.argmax(sel_in, axis=1)  # the lone corner
            rows = np.arange(a_idx.size)
            # gather the three other corner slots explicitly
            all_slots = np.tile(np.arange(4), (a_idx.size, 1))
            other_mask = all_slots != a_idx[:, None]
            other_slots = all_slots[other_mask].reshape(-1, 3)
            ida = tid[m][rows, a_idx]
            va = tva[m][rows, a_idx]
            keys = []
            ts = []
            for e in range(3):
                slot = other_slots[:, e]
                idb = tid[m][rows, slot]
                vb = tva[m][rows, slot]
                k, t = _edge_vertex(ida, idb, va, vb, iso)
                keys.append(k)
                ts.append(t)
            tri_keys.append(np.stack(keys, axis=1))
            tri_ts.append(np.stack(ts, axis=1))

        # --- case: 2 vs 2 -> quad -> 2 triangles --------------------------
        m = count == 2
        if m.any():
            tin_m = tin[m]
            tid_m = tid[m]
            tva_m = tva[m]
            rows = np.arange(tin_m.shape[0])
            slots = np.tile(np.arange(4), (tin_m.shape[0], 1))
            in_slots = slots[tin_m].reshape(-1, 2)    # a, b inside
            out_slots = slots[~tin_m].reshape(-1, 2)  # c, d outside
            a, b = in_slots[:, 0], in_slots[:, 1]
            c, d = out_slots[:, 0], out_slots[:, 1]

            def ev(s1, s2):
                return _edge_vertex(
                    tid_m[rows, s1], tid_m[rows, s2],
                    tva_m[rows, s1], tva_m[rows, s2], iso,
                )

            kac, tac = ev(a, c)
            kad, tad = ev(a, d)
            kbc, tbc = ev(b, c)
            kbd, tbd = ev(b, d)
            # quad ac-ad-bd-bc split into (ac, ad, bd) and (ac, bd, bc)
            tri_keys.append(np.stack([kac, kad, kbd], axis=1))
            tri_ts.append(np.stack([tac, tad, tbd], axis=1))
            tri_keys.append(np.stack([kac, kbd, kbc], axis=1))
            tri_ts.append(np.stack([tac, tbd, tbc], axis=1))

    if not tri_keys:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    keys = np.concatenate(tri_keys, axis=0)  # [T, 3, 2]
    ts = np.concatenate(tri_ts, axis=0)      # [T, 3]

    # dedup vertices by (lo, hi) edge identity
    flat_keys = keys.reshape(-1, 2)
    flat_ts = ts.reshape(-1)
    packed = flat_keys[:, 0] * np.int64(R0 * R1 * R2) + flat_keys[:, 1]
    uniq, first_idx, inv = np.unique(packed, return_index=True, return_inverse=True)
    faces = inv.reshape(-1, 3)

    lo = flat_keys[first_idx, 0]
    hi = flat_keys[first_idx, 1]
    t = flat_ts[first_idx]

    def unflatten(f):
        k = f % R2
        j = (f // R2) % R1
        i = f // (R1 * R2)
        return np.stack([i, j, k], axis=-1).astype(np.float32)

    verts = unflatten(lo) + t[:, None] * (unflatten(hi) - unflatten(lo))

    # drop degenerate triangles (repeated vertex ids)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]

    # orient: normal should point toward increasing SDF. Central
    # differences gathered at triangle centroids only (np.gradient over
    # the full grid costs seconds at 256^3).
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    centroid = (v0 + v1 + v2) / 3.0
    ci = np.clip(np.round(centroid[:, 0]).astype(np.int64), 1, R0 - 2)
    cj = np.clip(np.round(centroid[:, 1]).astype(np.int64), 1, R1 - 2)
    ck = np.clip(np.round(centroid[:, 2]).astype(np.int64), 1, R2 - 2)
    flat = grid.reshape(-1)

    def at(i, j, k):
        return flat[(i * R1 + j) * R2 + k]

    gc = np.empty((len(faces), 3), np.float32)
    gc[:, 0] = at(ci + 1, cj, ck) - at(ci - 1, cj, ck)
    gc[:, 1] = at(ci, cj + 1, ck) - at(ci, cj - 1, ck)
    gc[:, 2] = at(ci, cj, ck + 1) - at(ci, cj, ck - 1)
    flip = (n * gc).sum(axis=1) < 0
    faces[flip] = faces[flip][:, ::-1]

    return verts.astype(np.float32), faces.astype(np.int64)


def extract_isosurface(grid: np.ndarray, iso: float = 0.0,
                       rescale_to_unit: bool = True,
                       backend: str = "auto"):
    """Extract + rescale vertices from index coords to [-1, 1]
    (reference inference.py:119-124).

    backends:
      'mc'     — native table-based marching cubes (topiaxl/native/mc.cpp):
                 reference-compatible geometry (same edge-crossing
                 vertices as PyMCubes, inference.py:119) and ~45% fewer
                 faces than MT, which speeds up every downstream stage.
      'mt'     — native marching tetrahedra (topiaxl/native/mt.cpp).
      'numpy'  — vectorized MT executable spec (this module).
      'auto'   — mc, falling back to mt, falling back to numpy.
    """
    grid = np.asarray(grid)
    verts = faces = None
    if backend in ("auto", "mc"):
        try:
            from ..native import marching_cubes as mc_native

            verts, faces = mc_native(grid, iso)
        except Exception:
            if backend == "mc":
                raise
    if verts is None and backend in ("auto", "mt", "native"):
        try:
            from ..native import marching_tetrahedra as mt_native

            verts, faces = mt_native(grid, iso)
        except Exception:
            if backend in ("mt", "native"):
                raise
    if verts is None:
        verts, faces = marching_tetrahedra(grid, iso)
    if rescale_to_unit and verts.size:
        r = np.array(grid.shape, np.float32) - 1.0
        verts = verts / r * 2.0 - 1.0
    return verts, faces
