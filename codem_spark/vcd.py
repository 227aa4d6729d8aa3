"""Vertical change detection (VCD) pipeline — the reference's second CLI
(§3.2 of SURVEY.md; reference src/vcd/main.py:216-349 stage sequence).

    before/after point tables
      -> preprocessing filter chain (F4-F8: class/returns/range predicates)
      -> J3 nearest-before dZ join (vcd/preprocessing/preprocess.py:196-199)
      -> threshold + class filters (":226-231")
      -> J8 Euclidean clustering (":234-249")
      -> G6 cluster-size window count (":253-256")
      -> G7/A7 per-cluster hull summaries (vcd/meshing/mesh.py:18-105)
      -> S8/G3 IDW product rasters (":283-325")

Every stage is a DataFrame -> DataFrame function (composable, resumable via
io/lineage.run_stage); the filter chain is pure Catalyst, the joins are the
tile+halo kernels.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codem_spark.operators import cluster as cluster_mod
from codem_spark.operators import grid, hull, knn

Extent = tuple[float, float, float, float]


@dataclass
class VcdConfig:
    ground_height: float = 1.0  # dZ threshold (reference ground_height, vcd/main.py:33)
    tolerance: float = 2.0  # cluster tolerance (":35")
    min_points: int = 30  # cluster cull (":34")
    resolution: float = 1.0  # product raster resolution (":32")
    knn_radius: float = 50.0  # dZ join search bound

    def __post_init__(self) -> None:
        if self.ground_height <= 0:
            raise ValueError("ground_height must be greater than 0.")
        if self.tolerance <= 0:
            raise ValueError("cluster tolerance must be greater than 0.")
        if self.min_points < 1:
            raise ValueError("min_points must be a positive integer.")
        if self.resolution <= 0:
            raise ValueError("resolution must be greater than 0.")


def preprocess_filters(points: DataFrame) -> DataFrame:
    """The reference's PDAL filter chain re-expressed as SQL predicates
    (vcd/preprocessing/preprocess.py:163-174):
      Classification![7:7], ![18:), ![9:9]  (noise/water dropped)
      returns: keep only-returns (return_number == number_of_returns == 1
      semantics for 'only' group)."""
    out = points.filter(~F.col("classification").isin([7, 9]) & (F.col("classification") < 18))
    if "return_number" in points.columns:
        out = out.filter((F.col("return_number") == 1) & (F.col("number_of_returns") == 1))
    return out


def compute_dz(
    before: DataFrame, after: DataFrame, extent: Extent, cfg: VcdConfig
) -> DataFrame:
    """J3: each after-point -> nearest before-point (3D), dz = z_a - z_b
    (reference VCD.compute_indexes, vcd/preprocessing/preprocess.py:196-199).
    Output: (pid, x, y, z, dz)."""
    j = knn.knn_join_complete(
        after.select("pid", "x", "y", "z"),
        before.select("pid", "x", "y", "z"),
        extent,
        radius=cfg.knn_radius,
        lid="pid",
        rid="pid",
        l_carry=("x", "y", "z"),
        r_carry=("z",),
    )
    return j.select(
        "pid",
        F.col("l_x").alias("x"),
        F.col("l_y").alias("y"),
        F.col("l_z").alias("z"),
        (F.col("l_z") - F.col("r_z")).alias("dz"),
    )


def significant_changes(dz: DataFrame, cfg: VcdConfig) -> DataFrame:
    """Range predicate dZ3d![-gh:gh] — keep |dz| > ground_height
    (reference ':226')."""
    return dz.filter(F.abs(F.col("dz")) > cfg.ground_height)


def cluster_changes(changes: DataFrame, extent: Extent, cfg: VcdConfig) -> DataFrame:
    """J8 + G6: Euclidean-cluster the significant points; append cluster
    sizes; cull clusters below min_points (reference ':234-256')."""
    labelled = cluster_mod.euclidean_cluster(
        changes.select("pid", "x", "y", "z"),
        extent,
        tolerance=cfg.tolerance,
        min_points=cfg.min_points,
    )
    out = changes.join(labelled, "pid")
    return grid.cluster_sizes(out, "cluster_id")


def products(changes: DataFrame, extent: Extent, cfg: VcdConfig) -> dict[str, DataFrame]:
    """The reference's Product set (vcd/preprocessing/preprocess.py:266-271):
    raised / lowered / combined change rasters, IDW-gridded (S8/G3)."""
    raised = changes.filter(F.col("dz") > 0)
    lowered = changes.filter(F.col("dz") < 0)
    out = {}
    for name, df in [("raised", raised), ("lowered", lowered), ("all", changes)]:
        out[name] = grid.grid_idw(
            df.select("x", "y", F.col("dz").alias("z")), extent, cfg.resolution
        )
    return out


def export_multipatch(
    clustered: DataFrame,
    path: str,
    crs_wkt: str | None = None,
    cull_ids: tuple[int, ...] = (),
    ground_col: str | None = None,
) -> dict:
    """The reference's final mesh export (vcd/main.py Mesh.write,
    vcd/meshing/mesh.py:74-105): per-cluster 3D hull triangles as an ESRI
    MultiPatch shapefile with the volume/area/clusterid/ground/status
    attribute table and .prj WKT sidecar — written from scratch
    (io/shapefile.py), one record per cluster."""
    from codem_spark.io import shapefile as shapefile_io

    meshes = hull.cluster_hull_meshes(clustered, ground_col=ground_col)
    return shapefile_io.write_cluster_multipatch(
        meshes, path, crs_wkt=crs_wkt, cull_ids=cull_ids
    )


def run_vcd(
    before: DataFrame,
    after: DataFrame,
    extent: Extent,
    cfg: VcdConfig | None = None,
) -> tuple[DataFrame, DataFrame, dict[str, DataFrame]]:
    """Full VCD run -> (clustered change points, cluster summaries,
    product rasters)."""
    cfg = cfg or VcdConfig()
    b = preprocess_filters(before) if "classification" in before.columns else before
    a = preprocess_filters(after) if "classification" in after.columns else after
    dz = compute_dz(b, a, extent, cfg)
    sig = significant_changes(dz, cfg)
    clustered = cluster_changes(sig, extent, cfg).persist()
    clustered.count()
    summaries = hull.cluster_summaries(clustered)
    prods = products(sig, extent, cfg)
    return clustered, summaries, prods
