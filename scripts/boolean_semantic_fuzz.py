"""Semantic fuzz of the boolean engine against a point-membership oracle.

The existing stress pass (scripts/boolean_stress.py) is DIFFERENTIAL —
C++ sweep vs Python sweep — so a defect shared by both engines (they
implement the same algorithm on the same lattice by design) escapes it.
This harness checks each engine against ground truth that does not come
from either sweep:

1. point-membership: for random sample points farther than eps from every
   operand/result edge, ``result.contains_point(p)`` must equal the
   boolean combination of the operands' own point tests (ray casting in
   geo/polygon.py — an independent code path),
2. area identities. boolean_op snaps both operands to a shared 2^25
   lattice over the JOINT bounds, so identities among results of the same
   operand pair hold near-exactly (same lattice, same subdivided edges):
   |U| = |I| + |A\\B| + |B\\A| and |X| = |A\\B| + |B\\A|; identities vs the
   UNSNAPPED originals (|A| = |I| + |A\\B|) hold only to the snap error,
   bounded by quantum x operand perimeter.

eps = 1e-6 * span keeps samples ~30 lattice units clear of the 2^25 snap
band, so snap-rounding can never flip a checked point's membership.

    python scripts/boolean_semantic_fuzz.py [N] [--native] [--seed S]
    # default 5000 pairs, Python engine, seed 20260820
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

from aquaculture_tpu.geo import native_boolean as NB
from aquaculture_tpu.geo import polygon as P
from aquaculture_tpu.geo.boolean import boolean_op


# ---------------------------------------------------------------- operands

def _star(rng):
    n = int(rng.integers(3, 16))
    cx, cy = rng.uniform(-5, 5, 2)
    th = np.sort(rng.uniform(0, 2 * np.pi, 2 * n))
    if np.min(np.diff(th)) < 1e-3:
        th = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False) + rng.uniform(0, 1)
    r = rng.uniform(0.2, 4.0, 2 * n)
    return P.Polygon(np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], 1))


def _hull_int(rng):
    """Star-shaped polygon over integer lattice points. Points that share
    the angle from the centroid make the angular sort ambiguous and the
    ring self-intersecting (not a valid operand) — keep only one point per
    angle (the farthest)."""
    pts = rng.integers(-6, 7, (14, 2)).astype(float)
    pts = np.unique(pts, axis=0)
    if len(pts) < 3:
        return None
    c = pts.mean(0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    rad = np.hypot(pts[:, 0] - c[0], pts[:, 1] - c[1])
    order = np.lexsort((-rad, ang))
    pts, ang = pts[order], ang[order]
    keep = np.ones(len(pts), bool)
    keep[1:] = np.abs(np.diff(ang)) > 1e-12
    pts = pts[keep]
    if len(pts) < 3:
        return None
    return P.Polygon(pts)


def _ring(rng):
    x0, y0 = rng.integers(-6, 0, 2).astype(float)
    w, h = rng.integers(6, 12, 2).astype(float)
    m = float(rng.integers(1, int(min(w, h)) // 2 + 1))
    outer = P.box(x0, y0, x0 + w, y0 + h)
    return P.Polygon(outer.exterior, [P.box(x0 + m, y0 + m, x0 + w - m, y0 + h - m).exterior])


def _staircase_multi(rng):
    """Edge-abutting lattice boxes (the round-4 MultiPolygon bug class):
    k boxes sharing edges/corners. Members must be interior-disjoint —
    MultiPolygon.area sums members, and the area identities assume valid
    operands — so overlapping candidates are dropped."""
    k = int(rng.integers(2, 5))
    boxes = []
    rects = []
    x, y = rng.integers(-6, 2, 2).astype(float)
    for _ in range(k):
        w, h = rng.integers(1, 5, 2).astype(float)
        cand = (x, y, x + w, y + h)
        if all(min(cand[2], r[2]) - max(cand[0], r[0]) <= 0
               or min(cand[3], r[3]) - max(cand[1], r[1]) <= 0
               for r in rects):
            rects.append(cand)
            boxes.append(P.box(*cand))
        # next box abuts the previous on a full or partial edge
        if rng.random() < 0.5:
            x += w
            y += float(rng.integers(-2, 3))
        else:
            y += h
            x += float(rng.integers(-2, 3))
    if not boxes:
        return None
    return P.MultiPolygon(boxes) if len(boxes) > 1 else boxes[0]


def _disjoint_multi(rng):
    k = int(rng.integers(2, 4))
    boxes = []
    for i in range(k):
        # x0 range + max width must stay under the 20-unit spacing, or
        # members overlap and the sum-of-members area oracle is wrong
        x0 = float(rng.integers(-6, 7)) + 20.0 * i
        y0 = float(rng.integers(-8, 8))
        w, h = rng.uniform(1, 6, 2)
        boxes.append(P.box(x0, y0, x0 + w, y0 + h))
    return P.MultiPolygon(boxes)


def _rot_square(rng):
    cx, cy = rng.uniform(-5, 5, 2)
    s = rng.uniform(1, 6)
    th = rng.uniform(0, np.pi / 2)
    c, sn = np.cos(th), np.sin(th)
    base = np.array([(-s, -s), (s, -s), (s, s), (-s, s)], float)
    rot = base @ np.array([[c, sn], [-sn, c]])
    return P.Polygon(rot + np.array([cx, cy]))


def _multi_hole(rng):
    """Big box with a 2x2..3x3 grid of disjoint rectangular holes — the
    membership oracle must agree hole-by-hole, and face tracing must keep
    every hole on the correct face when the other operand cuts through."""
    x0, y0 = rng.integers(-8, -4, 2).astype(float)
    w, h = rng.integers(10, 16, 2).astype(float)
    gx, gy = int(rng.integers(2, 4)), int(rng.integers(2, 4))
    cw, ch = w / gx, h / gy
    holes = []
    for i in range(gx):
        for j in range(gy):
            if rng.random() < 0.3:
                continue  # skip some cells: irregular hole pattern
            m = rng.uniform(0.15, 0.35)
            hx0 = x0 + i * cw + m * cw
            hy0 = y0 + j * ch + m * ch
            hx1 = x0 + (i + 1) * cw - m * cw
            hy1 = y0 + (j + 1) * ch - m * ch
            holes.append(P.box(hx0, hy0, hx1, hy1).exterior)
    return P.Polygon(P.box(x0, y0, x0 + w, y0 + h).exterior, holes)


def _pinwheel(rng):
    """Thin integer-coordinate triangles sharing ONE apex vertex — 3+
    edges concurrent at a single lattice point. Stresses the tangential-
    touch requeue when >=3 status edges pass exactly through one event
    point (the round-4 advisor degeneracy: a one-shot requeue guard
    chains stale fields when the REPLAYED insert splits a second
    concurrent edge at the same point). Sectors keep interiors disjoint."""
    cx, cy = rng.integers(-4, 5, 2).astype(float)
    R = int(rng.integers(4, 9))
    # per-sector base edges: (E, N, W, S); each triangle = apex + 2 bases
    sectors = [
        ((R, -1), (R, 1)), ((1, R), (-1, R)),
        ((-R, 1), (-R, -1)), ((-1, -R), (1, -R)),
    ]
    k = int(rng.integers(2, 5))
    order = rng.permutation(4)[:k]
    tris = []
    for si in order:
        (dx1, dy1), (dx2, dy2) = sectors[si]
        tris.append(P.Polygon(np.array(
            [(cx, cy), (cx + dx1, cy + dy1), (cx + dx2, cy + dy2)], float)))
    return P.MultiPolygon(tris) if len(tris) > 1 else tris[0]


def _pinched_donut(rng):
    """Box with diamond holes that PINCH the boundary at single lattice
    points: one hole's apex lies exactly on the shell, and with p=0.5 a
    second hole shares a vertex with the first (hole-touches-hole).
    OGC-valid (holes touch rings at finitely many points) but exercises
    the sweep's vertex-coincidence handling between SAME-operand rings —
    a class the other generators never produce."""
    x0, y0 = rng.integers(-6, 0, 2).astype(float)
    w = float(rng.integers(8, 14))
    h = float(rng.integers(8, 14))
    outer = P.box(x0, y0, x0 + w, y0 + h)
    # first hole: diamond with its bottom apex ON the bottom edge
    cx = x0 + float(rng.integers(3, int(w) - 2))
    r1 = float(rng.integers(2, 4))
    hole1 = np.array([
        (cx, y0), (cx + r1, y0 + r1), (cx, y0 + 2 * r1), (cx - r1, y0 + r1)
    ], float)
    holes = [hole1]
    if rng.random() < 0.5 and y0 + 4 * r1 < y0 + h - 1:
        # second diamond sharing hole1's TOP apex (hole-touches-hole)
        r2 = float(rng.integers(1, 3))
        top = (cx, y0 + 2 * r1)
        hole2 = np.array([
            top, (cx + r2, top[1] + r2), (cx, top[1] + 2 * r2),
            (cx - r2, top[1] + r2)
        ], float)
        if top[1] + 2 * r2 < y0 + h:
            holes.append(hole2)
    return P.Polygon(outer.exterior, holes)


GENS = (_star, _hull_int, _ring, _staircase_multi, _disjoint_multi,
        _rot_square, _multi_hole, _pinwheel, _pinched_donut)


def _ring_is_simple(pts: np.ndarray) -> bool:
    """O(n^2) proper-crossing check. Radial generators are USUALLY simple,
    but an angular gap > pi lets a chord pass the far side of the center
    and cross another chord — the oracle (shoelace + even-odd ray casts)
    is meaningless on such operands, so they must be rejected, not fed."""
    n = len(pts)
    for i in range(n):
        a1, a2 = pts[i], pts[(i + 1) % n]
        r = (a2[0] - a1[0], a2[1] - a1[1])
        for j in range(i + 1, n):
            if (i + 1) % n == j or (j + 1) % n == i:
                continue
            b1, b2 = pts[j], pts[(j + 1) % n]
            s = (b2[0] - b1[0], b2[1] - b1[1])
            den = r[0] * s[1] - r[1] * s[0]
            if den == 0.0:
                continue
            e = (b1[0] - a1[0], b1[1] - a1[1])
            t = (e[0] * s[1] - e[1] * s[0]) / den
            u = (e[0] * r[1] - e[1] * r[0]) / den
            if 1e-12 < t < 1 - 1e-12 and 1e-12 < u < 1 - 1e-12:
                return False
    return True


def _is_valid_operand(g) -> bool:
    polys = g.geoms if isinstance(g, P.MultiPolygon) else [g]
    return all(
        _ring_is_simple(np.asarray(p.exterior, float))
        and all(_ring_is_simple(np.asarray(h, float)) for h in p.holes)
        for p in polys
    )


def gen_pair(rng):
    """One valid operand pair (simple members), possibly offset to
    projected-CRS magnitudes. Returns (a, b) or None to retry."""
    a = GENS[int(rng.integers(len(GENS)))](rng)
    b = GENS[int(rng.integers(len(GENS)))](rng)
    if a is None or b is None or a.is_empty or b.is_empty:
        return None
    if not _is_valid_operand(a) or not _is_valid_operand(b):
        return None
    if rng.random() < 0.15:
        # scale disparity: shrink B by 10-3000x and drop it inside or near
        # A's bounds — stresses the JOINT-lattice snap (B spans few lattice
        # cells; its rings must still round consistently). Ratio capped so
        # the point oracle stays sound: eps = 1e-6 * joint span must stay
        # well under B's feature size relative to the 2^25 quantum.
        s = float(rng.uniform(10.0, 3000.0))
        ax0, ay0, ax1, ay1 = a.bounds
        c = np.asarray(b.bounds, float)
        bc = (c[:2] + c[2:]) / 2.0
        target = np.array([rng.uniform(ax0 - 1, ax1 + 1),
                           rng.uniform(ay0 - 1, ay1 + 1)])

        def _scale(g):
            polys = g.geoms if isinstance(g, P.MultiPolygon) else [g]
            moved = [P.Polygon((np.asarray(p.exterior) - bc) / s + target,
                               [(np.asarray(hh) - bc) / s + target
                                for hh in p.holes])
                     for p in polys]
            return moved[0] if len(moved) == 1 else P.MultiPolygon(moved)

        b = _scale(b)
        # Re-validate AFTER the float transform: a near-self-touching ring
        # can become self-intersecting under divide-and-translate, and a
        # non-simple operand makes the oracle report a phantom engine bug
        # (round-4 advisor finding).
        if not _is_valid_operand(b):
            return None
    if rng.random() < 0.1:
        # vertex coincidence: translate B so one of its vertices lands
        # EXACTLY on a vertex of A — with _pinwheel/_staircase operands
        # this concentrates many edges through one point, the requeue-
        # counter degeneracy class.
        pa = np.asarray((a.geoms[0] if isinstance(a, P.MultiPolygon) else a)
                        .exterior, float)[0]
        pb = np.asarray((b.geoms[0] if isinstance(b, P.MultiPolygon) else b)
                        .exterior, float)[0]
        off0 = pa - pb

        def _al(g):
            polys = g.geoms if isinstance(g, P.MultiPolygon) else [g]
            moved = [P.Polygon(np.asarray(p.exterior) + off0,
                               [np.asarray(h) + off0 for h in p.holes])
                     for p in polys]
            return moved[0] if len(moved) == 1 else P.MultiPolygon(moved)

        b = _al(b)
    if rng.random() < 0.4:
        off = rng.uniform(3e5, 1e6, 2) * np.where(rng.random(2) < 0.5, 1, 5)

        def _sh(g):
            polys = g.geoms if isinstance(g, P.MultiPolygon) else [g]
            moved = [P.Polygon(np.asarray(p.exterior) + off,
                               [np.asarray(h) + off for h in p.holes])
                     for p in polys]
            return moved[0] if len(moved) == 1 else P.MultiPolygon(moved)

        a, b = _sh(a), _sh(b)
    return a, b


# ---------------------------------------------------------------- oracle

def _rings(g):
    polys = g.geoms if isinstance(g, P.MultiPolygon) else ([] if g.is_empty else [g])
    out = []
    for p in polys:
        out.append(np.asarray(p.exterior, float))
        out.extend(np.asarray(h, float) for h in p.holes)
    return out


def _edge_dist(pts, rings):
    """Min distance from each point to any ring segment (vectorized)."""
    d = np.full(len(pts), np.inf)
    for ring in rings:
        a = ring
        b = np.roll(ring, -1, axis=0)
        ab = b - a                                        # (m,2)
        ap = pts[:, None, :] - a[None, :, :]              # (n,m,2)
        denom = np.maximum((ab * ab).sum(1), 1e-300)      # (m,)
        t = np.clip((ap * ab[None]).sum(2) / denom, 0.0, 1.0)
        proj = a[None] + t[..., None] * ab[None]
        dd = np.sqrt(((pts[:, None, :] - proj) ** 2).sum(2)).min(1)
        d = np.minimum(d, dd)
    return d


def _contains(g, x, y):
    if g.is_empty:
        return False
    return bool(g.contains_point(x, y))


_TRUTH = {
    "intersection": lambda a, b: a and b,
    "union": lambda a, b: a or b,
    "difference": lambda a, b: a and not b,
    "xor": lambda a, b: a != b,
}
# checked via point oracle too, but not generated by the main loop's res dict
_TRUTH_EXTRA = {"difference_ba": lambda a, b: b and not a}


def _area(g):
    return 0.0 if g.is_empty else float(g.area)


def check_pair(a, b, rng, use_native, n_pts=48):
    """Returns list of finding strings for one operand pair."""
    findings = []
    lib_saved = None
    if not use_native:
        lib_saved, NB._lib = NB._lib, None
    try:
        res = {op: boolean_op(a, b, op) for op in _TRUTH}
        res["difference_ba"] = boolean_op(b, a, "difference")
    finally:
        if not use_native:
            NB._lib = lib_saved

    # --- area identities
    aa, ab = _area(a), _area(b)
    ai, au = _area(res["intersection"]), _area(res["union"])
    ad, ax = _area(res["difference"]), _area(res["xor"])
    ae = _area(res["difference_ba"])
    # same-lattice identities (all five results share the joint 2^25 snap)
    tol = 1e-9 * max(aa, ab, 1.0)
    if abs(au - (ai + ad + ae)) > tol:
        findings.append(f"AREA union {au!r} != |I|+|A\\B|+|B\\A| {ai + ad + ae!r}")
    if abs(ax - (ad + ae)) > tol:
        findings.append(f"AREA xor {ax!r} != |A\\B|+|B\\A| {ad + ae!r}")
    # vs the unsnapped originals: bounded by snap quantum x perimeter
    bnds = np.array([a.bounds, b.bounds], float)
    span_ab = float(max(bnds[:, 2:].max(0)[0] - bnds[:, :2].min(0)[0],
                        bnds[:, 2:].max(0)[1] - bnds[:, :2].min(0)[1], 1e-9))
    quantum = span_ab / float(1 << 25)
    perim = sum(float(np.linalg.norm(np.diff(np.vstack([r, r[:1]]), axis=0),
                                     axis=1).sum())
                for r in _rings(a) + _rings(b))
    tol_snap = max(8.0 * quantum * perim, tol)
    if abs(aa - (ai + ad)) > tol_snap:
        findings.append(f"AREA |A| {aa!r} != |I|+|A\\B| {ai + ad!r} (tol {tol_snap:.3g})")
    if abs(ab - (ai + ae)) > tol_snap:
        findings.append(f"AREA |B| {ab!r} != |I|+|B\\A| {ai + ae!r} (tol {tol_snap:.3g})")

    # --- point-membership oracle
    bounds = np.array([a.bounds, b.bounds], float)
    lo = bounds[:, :2].min(0) - 1.0
    hi = bounds[:, 2:].max(0) + 1.0
    span = float(max(hi[0] - lo[0], hi[1] - lo[1], 1e-9))
    eps = 1e-6 * span
    pts = rng.uniform(lo, hi, (n_pts, 2))
    all_rings = _rings(a) + _rings(b)
    for g in res.values():
        all_rings += _rings(g)
    ok = _edge_dist(pts, all_rings) > eps
    for x, y in pts[ok]:
        in_a, in_b = _contains(a, x, y), _contains(b, x, y)
        for op, g in res.items():
            want = {**_TRUTH, **_TRUTH_EXTRA}[op](in_a, in_b)
            got = _contains(g, x, y)
            if got != want:
                findings.append(
                    f"POINT op={op} p=({x!r},{y!r}) inA={in_a} inB={in_b} "
                    f"want={want} got={got}")
    return findings


def _dump(g):
    polys = g.geoms if isinstance(g, P.MultiPolygon) else [g]
    return [(np.asarray(p.exterior).tolist(),
             [np.asarray(h).tolist() for h in p.holes]) for p in polys]


def main() -> None:
    n_cases = 5000
    use_native = False
    seed = 20260820
    args = list(sys.argv[1:])
    while args:
        arg = args.pop(0)
        if arg == "--native":
            use_native = True
        elif arg == "--seed":
            seed = int(args.pop(0))
        else:
            n_cases = int(arg)
    # Resolve the library ONCE either way: check_pair's python mode nulls
    # NB._lib, which only sticks if _lib_checked is already True (else
    # sweep_native's load_library() reloads it mid-pair).
    lib = NB.load_library()
    if use_native:
        assert lib is not None, "build native first: make -C native"
    rng = np.random.default_rng(seed)
    bad = 0
    done = 0
    t0 = time.perf_counter()
    while done < n_cases:
        pair = gen_pair(rng)
        if pair is None:
            continue
        a, b = pair
        done += 1
        try:
            findings = check_pair(a, b, rng, use_native)
        except Exception as e:  # engine crash IS a finding
            findings = [f"EXCEPTION {type(e).__name__}: {e}"]
        if findings:
            bad += 1
            print(f"CASE {done}:")
            for f in findings[:6]:
                print("  " + f)
            print("  A:", _dump(a))
            print("  B:", _dump(b))
        if done % 500 == 0:
            print(f"{done}/{n_cases} pairs, {bad} bad, "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
    print(f"DONE {done} pairs, {bad} bad cases, {time.perf_counter() - t0:.0f}s")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
