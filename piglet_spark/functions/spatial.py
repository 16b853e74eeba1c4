"""Spatial type + predicates, pure Spark Column implementation.

Reference: geometry/STObject via the STARK library
(expr/ArithmeticExpr.scala:306-316, expr/Predicate.scala:190-222
CONTAINS/CONTAINEDBY/INTERSECTS, op/SpatialFilter.scala:36,
op/SpatialJoin.scala:12). This container has no geo libraries, so the
rebuild supports the WKT subset the reference's test corpus uses —
POINT and POLYGON — with geometry as a struct column
``(gtype, xs array<double>, ys array<double>)`` and predicates as
JVM-side expressions (point-in-polygon = ray casting via
higher-order functions; polygons are small so per-edge lambda cost
is irrelevant).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def geometry(wkt: Column) -> Column:
    """Parse WKT POINT/POLYGON into (gtype, xs, ys)."""
    if not isinstance(wkt, Column):
        wkt = F.lit(str(wkt))
    gtype_raw = F.upper(F.regexp_extract(wkt, r"^\s*([A-Za-z]+)", 1))
    # interior rings (holes) / multi-part WKT would silently keep only
    # the first ring and report wrong containment for points inside a
    # hole — refuse clearly instead (r05)
    gtype = F.when(
        wkt.rlike(r"\)\s*,\s*\("),
        F.raise_error(F.concat(
            F.lit("unsupported WKT (interior rings / multi-part "
                  "geometries): "), wkt)).cast("string"),
    ).otherwise(gtype_raw)
    # r10: the coordinate list parses with ONE regex pass (whitespace
    # normalization) + non-regex substring_index / split_part instead
    # of two regex splits PER VERTEX — same values on every wellformed
    # POINT/POLYGON (parity-pinned incl. extra whitespace), ~11%
    # cheaper per row on the point-parse pass that dominates the
    # spatial-join scan
    inner = F.substring_index(F.substring_index(wkt, "(", -1), ")", 1)
    pairs = F.split(F.regexp_replace(F.trim(inner), r"\s+", " "), ",")
    # nullif(…, ''): a missing coordinate must stay NULL (the old
    # array-index-out-of-bounds semantics), not an ANSI cast error —
    # split_part returns '' for an absent field
    xs = F.transform(pairs, lambda p: F.nullif(
        F.split_part(F.trim(p), F.lit(" "), F.lit(1)), F.lit(""))
        .cast("double"))
    ys = F.transform(pairs, lambda p: F.nullif(
        F.split_part(F.trim(p), F.lit(" "), F.lit(2)), F.lit(""))
        .cast("double"))
    return F.struct(gtype.alias("gtype"), xs.alias("xs"), ys.alias("ys"))


def _is_point(g: Column) -> Column:
    return g["gtype"] == "POINT"


def _px(g: Column) -> Column:
    return g["xs"][0]


def _py(g: Column) -> Column:
    return g["ys"][0]


def _bbox_overlap(a: Column, b: Column) -> Column:
    return (
        (F.array_min(a["xs"]) <= F.array_max(b["xs"]))
        & (F.array_max(a["xs"]) >= F.array_min(b["xs"]))
        & (F.array_min(a["ys"]) <= F.array_max(b["ys"]))
        & (F.array_max(a["ys"]) >= F.array_min(b["ys"]))
    )


def point_in_polygon(px: Column, py: Column, poly: Column) -> Column:
    """Ray casting: odd number of edge crossings → inside."""
    xs, ys = poly["xs"], poly["ys"]
    n = F.size(xs)
    idx = F.sequence(F.lit(1), n - 1)  # edges (i-1, i), 1-based element_at
    crossings = F.aggregate(
        idx,
        F.lit(0),
        lambda acc, i: acc + F.when(
            ((F.element_at(ys, i) > py) != (F.element_at(ys, i + 1) > py))
            & (px < (F.element_at(xs, i + 1) - F.element_at(xs, i))
               * (py - F.element_at(ys, i))
               / (F.element_at(ys, i + 1) - F.element_at(ys, i))
               + F.element_at(xs, i)),
            F.lit(1)).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


def _edge_idx(g: Column) -> Column:
    """Edge indices (i, i+1), 1-based; WKT rings are closed so the last
    vertex repeats the first and edges 1..n-1 cover the ring."""
    return F.sequence(F.lit(1), F.size(g["xs"]) - 1)


def _orient(ox: Column, oy: Column, ax: Column, ay: Column,
            bx: Column, by: Column) -> Column:
    """Cross product (a-o)×(b-o): sign gives the turn direction."""
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _edges_cross(a: Column, b: Column) -> Column:
    """Any proper (interior) crossing between an edge of a and an edge
    of b. O(n·m) per pair — polygon rings are small; stays in codegen."""
    axs, ays, bxs, bys = a["xs"], a["ys"], b["xs"], b["ys"]

    def pair_crosses(i: Column, j: Column) -> Column:
        p1x, p1y = F.element_at(axs, i), F.element_at(ays, i)
        p2x, p2y = F.element_at(axs, i + 1), F.element_at(ays, i + 1)
        q1x, q1y = F.element_at(bxs, j), F.element_at(bys, j)
        q2x, q2y = F.element_at(bxs, j + 1), F.element_at(bys, j + 1)
        d1 = _orient(q1x, q1y, q2x, q2y, p1x, p1y)
        d2 = _orient(q1x, q1y, q2x, q2y, p2x, p2y)
        d3 = _orient(p1x, p1y, p2x, p2y, q1x, q1y)
        d4 = _orient(p1x, p1y, p2x, p2y, q2x, q2y)
        return (d1 * d2 < 0) & (d3 * d4 < 0)

    return F.exists(_edge_idx(a),
                    lambda i: F.exists(_edge_idx(b),
                                       lambda j: pair_crosses(i, j)))


def _vertices_in(b: Column, a: Column) -> Column:
    """All vertices of b strictly inside polygon a (ray casting)."""
    bxs, bys = b["xs"], b["ys"]
    return F.forall(
        F.sequence(F.lit(1), F.size(bxs)),
        lambda i: point_in_polygon(F.element_at(bxs, i),
                                   F.element_at(bys, i), a))


def _any_vertex_in(b: Column, a: Column) -> Column:
    bxs, bys = b["xs"], b["ys"]
    return F.exists(
        F.sequence(F.lit(1), F.size(bxs)),
        lambda i: point_in_polygon(F.element_at(bxs, i),
                                   F.element_at(bys, i), a))


def _vertex_on_edge(b: Column, a: Column) -> Column:
    """Any vertex of b lying ON an edge of a (collinear and within the
    edge's bbox). Catches every boundary-touching configuration that
    strict ray casting and proper-crossing both miss — coincident
    vertices, T-touches, and collinear edge overlap (an overlapping
    collinear segment always puts one ring's endpoint on the other's
    edge)."""
    axs, ays, bxs, bys = a["xs"], a["ys"], b["xs"], b["ys"]

    def on_edge(i: Column, j: Column) -> Column:
        vx, vy = F.element_at(bxs, j), F.element_at(bys, j)
        e1x, e1y = F.element_at(axs, i), F.element_at(ays, i)
        e2x, e2y = F.element_at(axs, i + 1), F.element_at(ays, i + 1)
        collinear = _orient(e1x, e1y, e2x, e2y, vx, vy) == 0
        inbox = ((vx >= F.least(e1x, e2x)) & (vx <= F.greatest(e1x, e2x))
                 & (vy >= F.least(e1y, e2y)) & (vy <= F.greatest(e1y, e2y)))
        return collinear & inbox

    return F.exists(
        _edge_idx(a),
        lambda i: F.exists(F.sequence(F.lit(1), F.size(bxs)),
                           lambda j: on_edge(i, j)))


def contains(a: Column, b: Column) -> Column:
    """a CONTAINS b. point⊇point = equality; polygon⊇point = ray-cast
    PIP; polygon⊇polygon exact for simple rings: every vertex of b
    inside a and no proper edge crossing (boundary-touching containment
    is reported false — strict interior semantics)."""
    pt_pt = (_px(a) == _px(b)) & (_py(a) == _py(b))
    poly_pt = point_in_polygon(_px(b), _py(b), a)
    poly_poly = F.when(~_bbox_overlap(a, b), F.lit(False)).otherwise(
        _vertices_in(b, a) & ~_edges_cross(a, b))
    return F.when(_is_point(a) & _is_point(b), pt_pt).otherwise(
        F.when(~_is_point(a) & _is_point(b), poly_pt).otherwise(
            F.when(_is_point(a), F.lit(False)).otherwise(poly_poly)))


def containedby(a: Column, b: Column) -> Column:
    return contains(b, a)


def intersects(a: Column, b: Column) -> Column:
    pt_pt = (_px(a) == _px(b)) & (_py(a) == _py(b))
    a_pt = _is_point(a) & ~_is_point(b)
    b_pt = _is_point(b) & ~_is_point(a)
    poly_poly = F.when(~_bbox_overlap(a, b), F.lit(False)).otherwise(
        _edges_cross(a, b) | _any_vertex_in(b, a)
        | _any_vertex_in(a, b) | _vertex_on_edge(b, a)
        | _vertex_on_edge(a, b))
    # point-on-boundary counts as intersecting (r05: strict ray-cast
    # parity made edge-touching points arbitrary by edge direction;
    # _vertex_on_edge over the point's single vertex closes it, same
    # as the poly-poly branch)
    return F.when(_is_point(a) & _is_point(b), pt_pt).otherwise(
        F.when(a_pt, point_in_polygon(_px(a), _py(a), b)
               | _vertex_on_edge(a, b)).otherwise(
            F.when(b_pt, point_in_polygon(_px(b), _py(b), a)
                   | _vertex_on_edge(b, a)).otherwise(
                poly_poly)))


def distance(a: Column, b: Column) -> Column:
    """Euclidean distance between two point geometries (STARK euclid,
    UDF.scala:74)."""
    return F.sqrt((_px(a) - _px(b)) ** 2 + (_py(a) - _py(b)) ** 2)


def grid_cell(g: Column, cell_size: float) -> Column:
    """Grid cell id of a point geometry (spatial-join bucketing) —
    a (cx, cy) struct: collision-free at any extent (r05: the old
    cx*1_000_003+cy scalar collided once |cy| spanned ≥ 1_000_003
    cells, e.g. fine grids over lon/lat, producing spurious join
    candidates and merged partitions)."""
    cx = F.floor(_px(g) / F.lit(cell_size)).cast("long")
    cy = F.floor(_py(g) / F.lit(cell_size)).cast("long")
    return F.struct(cx.alias("cx"), cy.alias("cy"))


def grid_cells_bbox(g: Column, cell_size: float) -> Column:
    """All grid cells covered by a geometry's bbox (polygon side of a
    spatial join) — array of (cx, cy) structs."""
    x0 = F.floor(F.array_min(g["xs"]) / F.lit(cell_size)).cast("long")
    x1 = F.floor(F.array_max(g["xs"]) / F.lit(cell_size)).cast("long")
    y0 = F.floor(F.array_min(g["ys"]) / F.lit(cell_size)).cast("long")
    y1 = F.floor(F.array_max(g["ys"]) / F.lit(cell_size)).cast("long")
    return F.flatten(F.transform(
        F.sequence(x0, x1),
        lambda cx: F.transform(
            F.sequence(y0, y1),
            lambda cy: F.struct(cx.alias("cx"), cy.alias("cy"))),
    ))


# ---------------------------------------------------------------- BSP
#
# PARTITION … USING BSP: data-adaptive binary-space partitioning, the
# rebuild of the reference's STARK BSPartitioner option
# (codegen/spark/PartitionerEmitter.scala:29, op/Partition.scala).
# Spark-first shape: a BOUNDED deterministic sample (md5-ordered, the
# train_centroids precedent) builds a k-d split tree DRIVER-SIDE;
# the tree broadcasts as literal bounds inside one nested CASE
# expression, so assignment is pure codegen — no UDF, no second scan,
# and the split planes adapt to the data (median splits along the
# wider axis), which is the whole point vs the fixed grid: skewed
# data on a fixed grid hot-spots one cell, while equi-depth splits
# bound every leaf at ~|sample|/2^depth.


def bsp_sample_points(df, g, sample: int = 4096) -> list:
    """Bounded deterministic (x, y) sample for BSP training: bbox
    centers of the geometry column ``g`` (points are their own
    center), md5-hash-ordered so the sample is reproducible and not
    spatially correlated. One small job, ≤ ``sample`` rows collected
    — driver-safe at any input size."""
    cx = (F.array_min(g["xs"]) + F.array_max(g["xs"])) / 2.0
    cy = (F.array_min(g["ys"]) + F.array_max(g["ys"])) / 2.0
    rows = (df.select(cx.alias("_x"), cy.alias("_y"))
            .filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
            .orderBy(F.md5(F.concat_ws(",", F.col("_x").cast("string"),
                                       F.col("_y").cast("string"))),
                     F.col("_x"), F.col("_y"))
            .limit(int(sample)).collect())
    return [(float(r["_x"]), float(r["_y"])) for r in rows]


def bsp_tree(points: list, n_parts: int) -> dict:
    """k-d BSP tree from sample points (driver-side, pure python —
    deterministic given the deterministic sample). Each node splits
    the WIDER axis at the sample median; recursion stops at
    ceil(log2(n_parts)) depth or when a side would be empty, so the
    leaf count is ≤ the next power of two ≥ n_parts and every leaf
    holds ~|sample|/2^depth of the sample — equi-depth under any
    skew."""
    import math
    depth = max(0, math.ceil(math.log2(max(1, int(n_parts)))))
    counter = [0]

    def build(pts, d):
        if d == 0 or len(pts) < 2:
            leaf = {"leaf": counter[0]}
            counter[0] += 1
            return leaf
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        axis = 0 if (max(xs) - min(xs)) >= (max(ys) - min(ys)) else 1
        vals = sorted(p[axis] for p in pts)
        split = vals[len(vals) // 2]
        lo = [p for p in pts if p[axis] < split]
        hi = [p for p in pts if p[axis] >= split]
        if not lo or not hi:  # degenerate (all equal on this axis)
            leaf = {"leaf": counter[0]}
            counter[0] += 1
            return leaf
        return {"axis": axis, "split": float(split),
                "lo": build(lo, d - 1), "hi": build(hi, d - 1)}

    return build(list(points), depth)


def bsp_assign(x: Column, y: Column, tree: dict) -> Column:
    """Leaf id of a point under the BSP tree — one nested CASE
    expression of literal bounds (depth ≤ log2(n_parts)), fully
    codegen'd."""
    if "leaf" in tree:
        return F.lit(int(tree["leaf"]))
    v = x if tree["axis"] == 0 else y
    return F.when(v < F.lit(tree["split"]),
                  bsp_assign(x, y, tree["lo"])) \
        .otherwise(bsp_assign(x, y, tree["hi"]))


def bsp_leaf_rects(tree: dict) -> list:
    """(leaf_id, x0, x1, y0, y1) closed rectangles of every leaf
    (±inf at the outer edges) — the literal region list the
    spatial-join bbox explode tests against."""
    inf = float("inf")
    rects = []

    def rec(node, x0, x1, y0, y1):
        if "leaf" in node:
            rects.append((int(node["leaf"]), x0, x1, y0, y1))
            return
        s = node["split"]
        if node["axis"] == 0:
            rec(node["lo"], x0, s, y0, y1)
            rec(node["hi"], s, x1, y0, y1)
        else:
            rec(node["lo"], x0, x1, y0, s)
            rec(node["hi"], x0, x1, s, y1)

    rec(tree, -inf, inf, -inf, inf)
    return rects


def grid_shared_corner_cell(a: Column, b: Column,
                            cell_size: float) -> Column:
    """Canonical shared grid cell of two geometries' bbox cell
    rectangles: the componentwise MAX of the two min cells (r10,
    spatial-join reference-cell dedup). Each geometry's covered
    cells form an axis-aligned rectangle [x0..x1]×[y0..y1]; whenever
    two such rectangles intersect, (max(ax0,bx0), max(ay0,by0)) lies
    in the intersection — and it equals the intersection's smallest
    (cx, cy), so keeping a joined pair only in this cell keeps it
    exactly once."""
    ax0 = F.floor(F.array_min(a["xs"]) / F.lit(cell_size)).cast("long")
    ay0 = F.floor(F.array_min(a["ys"]) / F.lit(cell_size)).cast("long")
    bx0 = F.floor(F.array_min(b["xs"]) / F.lit(cell_size)).cast("long")
    by0 = F.floor(F.array_min(b["ys"]) / F.lit(cell_size)).cast("long")
    return F.struct(F.greatest(ax0, bx0).alias("cx"),
                    F.greatest(ay0, by0).alias("cy"))


def bsp_first_shared_cell(a: Column, b: Column, rects: list) -> Column:
    """Canonical shared BSP leaf of two geometries: the LOWEST leaf
    id whose closed rect intersects BOTH bboxes (r10, spatial-join
    reference-cell dedup). Identical to
    min(bsp_cells_bbox(a) ∩ bsp_cells_bbox(b)) because listing is
    exactly rect-vs-bbox intersection; evaluated as one literal
    coalesce chain in leaf-id order — no arrays on the rows."""
    ax0, ax1 = F.array_min(a["xs"]), F.array_max(a["xs"])
    ay0, ay1 = F.array_min(a["ys"]), F.array_max(a["ys"])
    bx0, bx1 = F.array_min(b["xs"]), F.array_max(b["xs"])
    by0, by1 = F.array_min(b["ys"]), F.array_max(b["ys"])
    arms = []
    for i, x0, x1, y0, y1 in sorted(rects):
        hit_a = ((F.lit(x0) <= ax1) & (ax0 <= F.lit(x1))
                 & (F.lit(y0) <= ay1) & (ay0 <= F.lit(y1)))
        hit_b = ((F.lit(x0) <= bx1) & (bx0 <= F.lit(x1))
                 & (F.lit(y0) <= by1) & (by0 <= F.lit(y1)))
        arms.append(F.when(hit_a & hit_b, F.lit(int(i))))
    return F.coalesce(*arms) if len(arms) > 1 else arms[0]


def bsp_cells_bbox(g: Column, rects: list) -> Column:
    """All BSP leaves whose (closed) rectangle intersects the
    geometry's bbox — array of leaf ids, the BSP analogue of
    :func:`grid_cells_bbox`. Closed-rect intersection means a
    geometry exactly on a split plane lists BOTH adjacent leaves, so
    candidate completeness holds: two intersecting geometries always
    share at least one listed leaf."""
    bx0, bx1 = F.array_min(g["xs"]), F.array_max(g["xs"])
    by0, by1 = F.array_min(g["ys"]), F.array_max(g["ys"])
    arrs = []
    for i, x0, x1, y0, y1 in rects:
        hit = ((F.lit(x0) <= bx1) & (bx0 <= F.lit(x1))
               & (F.lit(y0) <= by1) & (by0 <= F.lit(y1)))
        arrs.append(F.when(hit, F.array(F.lit(int(i))))
                    .otherwise(F.array().cast("array<int>")))
    return F.flatten(F.array(*arrs))
