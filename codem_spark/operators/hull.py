"""Per-cluster summaries: convex hull, area, volume, change status (G7/A7).

Reference analog: vcd/meshing/mesh.py:18-105 — group points by ClusterID,
build a hull per cluster, record volume, area, ground flag and "Fled"/"New"
status = sign of the cluster's mean dZ3d; written as a per-cluster summary
table (the shapefile's attribute rows, mesh.py:85-89).

trimesh/scipy are unavailable: the 2D convex hull is Andrew's monotone
chain (vectorized numpy, ~40 LoC as planned in SURVEY.md §2.3 G7) and the
2.5D volume is the prism integral of (z - z_base) over the hull's footprint
triangulation — the natural volume of a building-change cluster. One
``applyInPandas`` per cluster group; cluster counts are small relative to
points, so the shuffle is the groupBy(cluster_id) only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def convex_hull_2d(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain. pts: (n, 2). Returns hull vertices CCW."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    p = pts[order]

    def half(points):
        out: list[np.ndarray] = []
        for q in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], q - out[-2]) <= 0:
                out.pop()
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    return np.array(lower[:-1] + upper[:-1])


def polygon_area(hull: np.ndarray) -> float:
    """Shoelace area of a CCW ring."""
    if len(hull) < 3:
        return 0.0
    x, y = hull[:, 0], hull[:, 1]
    return float(0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def cluster_summaries(
    points: DataFrame,
    cluster_col: str = "cluster_id",
    dz_col: str = "dz",
) -> DataFrame:
    """(pid, x, y, z, dz, cluster_id) -> one summary row per cluster:
    n_points, area (hull footprint), volume (|mean dz| * area — the prism
    volume of the change), mean_dz, status 'New' if mean dz > 0 else 'Fled'
    (reference mesh.py:51,66-72), plus the hull ring as an array of structs.
    Clusters labelled -1 (culled) are excluded, like the reference's
    ClusterID filter (vcd/preprocessing/preprocess.py:228-231)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf[cluster_col].iloc[0])
        xy = pdf[["x", "y"]].to_numpy(np.float64)
        hull = convex_hull_2d(xy)
        area = polygon_area(hull)
        mean_dz = float(pdf[dz_col].mean())
        return pd.DataFrame(
            {
                "cluster_id": [cid],
                "n_points": [len(pdf)],
                "area": [area],
                "volume": [abs(mean_dz) * area],
                "mean_dz": [mean_dz],
                "status": ["New" if mean_dz > 0 else "Fled"],
                "hull_x": [hull[:, 0].tolist() if len(hull) else []],
                "hull_y": [hull[:, 1].tolist() if len(hull) else []],
            }
        )

    schema = (
        "cluster_id long, n_points long, area double, volume double, "
        "mean_dz double, status string, hull_x array<double>, hull_y array<double>"
    )
    return (
        points.filter(F.col(cluster_col) >= 0)
        .groupBy(cluster_col)
        .applyInPandas(lambda _k, pdf: kernel(pdf), schema=schema)
    )
