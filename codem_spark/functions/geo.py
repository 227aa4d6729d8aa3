"""Georeferencing of web-page rows + synthetic elevation surface.

Per the driver input_hint, the engine's primary input is a table of
Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``. Pages get
deterministic pseudo-coordinates from a hash of ``url`` — after that they
behave exactly like the reference's point clouds (GeoData.point_cloud,
preprocess.py:138,285-315). The synthetic elevation surface gives the
"terrain + buildings" signal the registration pipeline needs (analog of
the demo data described in reference docs/details.md:30-46): a smooth
low-frequency ground plus rectangular building bumps anchored on a
deterministic grid, so DSM feature detection has corners to find.

All production-path functions are Spark Column expressions (JVM-side).
``*_np`` twins are bit/float-identical for kernel and oracle use.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Extent = tuple[float, float, float, float]

_MASK32 = 0xFFFFFFFF
_INV32 = 1.0 / 4294967296.0  # 2^-32


def pseudo_xy_cols(url: Column, extent: Extent) -> tuple[Column, Column]:
    """(x, y) uniform in extent from xxhash64(url) — the production path
    (Spark's built-in xxHash64, JVM-side). Deterministic per url."""
    x0, y0, x1, y1 = extent
    h = F.xxhash64(url)
    # Split the 64-bit hash into two 32-bit lanes; map to [0,1).
    hx = h.bitwiseAND(F.lit(_MASK32))
    hy = F.shiftrightunsigned(h, 32).bitwiseAND(F.lit(_MASK32))
    x = F.lit(x0) + hx.cast("double") * F.lit(_INV32) * F.lit(x1 - x0)
    y = F.lit(y0) + hy.cast("double") * F.lit(_INV32) * F.lit(y1 - y0)
    return x, y


# Deterministic integer mix (splitmix64 finalizer) — used when coordinates
# must be derivable from an integer id identically in Spark SQL, numpy and
# DuckDB (the oracle path; DuckDB lacks Spark's xxhash64).
_SM_M1 = -0x40A7B892E31B1A47  # 0xBF58476D1CE4E5B9 as signed int64
_SM_M2 = -0x6B2FB644ECCEEE15  # 0x94D049BB133111EB as signed int64


def splitmix64_col(v: Column) -> Column:
    z = v + F.lit(-0x61C8864680B583EB)  # 0x9E3779B97F4A7C15
    z = (z.bitwiseXOR(F.shiftrightunsigned(z, 30))) * F.lit(_SM_M1)
    z = (z.bitwiseXOR(F.shiftrightunsigned(z, 27))) * F.lit(_SM_M2)
    return z.bitwiseXOR(F.shiftrightunsigned(z, 31))


def splitmix64_np(v: np.ndarray) -> np.ndarray:
    z = v.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return (z ^ (z >> np.uint64(31))).astype(np.int64)


# Oracle-friendly per-id uniform lanes: simple multiplicative hashing that
# is exactly representable in BIGINT in Spark, numpy and DuckDB without
# overflow. lane(id, k) in [0, 1).
_LANE_P = 2_147_483_629  # large prime < 2^31
_LANE_A = (1_103_515_245, 1_229_782_938, 1_653_271_865, 1_973_272_811)
_LANE_B = (12_345, 987_654_321, 55_555_333, 777_767_777)


def id_lane_col(idc: Column, k: int) -> Column:
    a, b = _LANE_A[k % 4], _LANE_B[k % 4]
    return (((idc % F.lit(_LANE_P)) * F.lit(a) + F.lit(b)) % F.lit(_LANE_P)).cast(
        "double"
    ) / F.lit(float(_LANE_P))


def id_lane_np(ids: np.ndarray, k: int) -> np.ndarray:
    a, b = _LANE_A[k % 4], _LANE_B[k % 4]
    return (((ids.astype(np.int64) % _LANE_P) * a + b) % _LANE_P) / float(_LANE_P)


def id_lane_sql(id_expr: str, k: int) -> str:
    a, b = _LANE_A[k % 4], _LANE_B[k % 4]
    return (
        f"cast(((({id_expr}) % {_LANE_P}) * {a} + {b}) % {_LANE_P} as double) / {float(_LANE_P)!r}"
    )


# ------------------------------------------------------- synthetic elevation
# Ground: sum of 3 smooth sinusoids. Buildings: deterministic grid of
# rectangular prisms (sharp corners => Harris features). Constants chosen so
# z ranges ~[0, 120] m over a 100 km extent — terrain-like.
_G = (
    (40.0, 1.0 / 9000.0, 1.0 / 13000.0, 0.3),
    (18.0, 1.0 / 3100.0, 1.0 / 4700.0, 1.7),
    (7.0, 1.0 / 1300.0, 1.0 / 800.0, 4.1),
)
_B_SPACING = 480.0  # building grid pitch (m)
_B_SIZE = 200.0  # building footprint edge (m)
_B_HMAX = 35.0


def surface_z_col(x: Column, y: Column) -> Column:
    z = F.lit(0.0)
    for amp, fx, fy, ph in _G:
        z = z + F.lit(amp) * F.sin(x * F.lit(2 * math.pi * fx) + F.lit(ph)) * F.cos(
            y * F.lit(2 * math.pi * fy) - F.lit(ph)
        )
    # Building bump: inside the central _B_SIZE of each grid tile, add a
    # per-tile deterministic height.
    gx = F.floor(x / F.lit(_B_SPACING)).cast("long")
    gy = F.floor(y / F.lit(_B_SPACING)).cast("long")
    fx_ = x - gx.cast("double") * F.lit(_B_SPACING)
    fy_ = y - gy.cast("double") * F.lit(_B_SPACING)
    inside = (
        (fx_ > F.lit((_B_SPACING - _B_SIZE) / 2))
        & (fx_ < F.lit((_B_SPACING + _B_SIZE) / 2))
        & (fy_ > F.lit((_B_SPACING - _B_SIZE) / 2))
        & (fy_ < F.lit((_B_SPACING + _B_SIZE) / 2))
    )
    key = gx * F.lit(73_856_093) + gy * F.lit(19_349_663)
    h = id_lane_col(key, 2) * F.lit(_B_HMAX)
    return z + F.when(inside, h).otherwise(F.lit(0.0)) + F.lit(60.0)


def surface_z_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    z = np.zeros_like(x, dtype=np.float64)
    for amp, fx, fy, ph in _G:
        z += amp * np.sin(x * (2 * math.pi * fx) + ph) * np.cos(y * (2 * math.pi * fy) - ph)
    gx = np.floor(x / _B_SPACING).astype(np.int64)
    gy = np.floor(y / _B_SPACING).astype(np.int64)
    fx_ = x - gx * _B_SPACING
    fy_ = y - gy * _B_SPACING
    inside = (
        (fx_ > (_B_SPACING - _B_SIZE) / 2)
        & (fx_ < (_B_SPACING + _B_SIZE) / 2)
        & (fy_ > (_B_SPACING - _B_SIZE) / 2)
        & (fy_ < (_B_SPACING + _B_SIZE) / 2)
    )
    key = gx * 73_856_093 + gy * 19_349_663
    h = id_lane_np(key, 2) * _B_HMAX
    return z + np.where(inside, h, 0.0) + 60.0


# --------------------------------------------------- rigid/similarity apply
def apply_transform_cols(
    df: DataFrame, matrix: np.ndarray, x: str = "x", y: str = "y", z: str = "z"
) -> DataFrame:
    """Apply a 4x4 homogeneous similarity transform to point columns as pure
    column expressions (the reference pipes points through a PDAL
    transformation filter, apply.py:314-335; here Catalyst codegens the
    same affine math over the whole table, no Python in the loop)."""
    m = np.asarray(matrix, dtype=np.float64)
    cx, cy, cz = F.col(x), F.col(y), F.col(z)
    nx = cx * float(m[0, 0]) + cy * float(m[0, 1]) + cz * float(m[0, 2]) + float(m[0, 3])
    ny = cx * float(m[1, 0]) + cy * float(m[1, 1]) + cz * float(m[1, 2]) + float(m[1, 3])
    nz = cx * float(m[2, 0]) + cy * float(m[2, 1]) + cz * float(m[2, 2]) + float(m[2, 3])
    return (
        df.withColumn("_nx", nx)
        .withColumn("_ny", ny)
        .withColumn("_nz", nz)
        .drop(x, y, z)
        .withColumnsRenamed({"_nx": x, "_ny": y, "_nz": z})
    )


def similarity_matrix(
    scale: float = 1.0,
    omega_deg: float = 0.0,
    phi_deg: float = 0.0,
    kappa_deg: float = 0.0,
    t: tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> np.ndarray:
    """4x4 from scale, Euler angles (omega=x, phi=y, kappa=z, degrees) and
    translation — the reference's parameterization (dsm.py:408-416)."""
    o, p, k = (math.radians(a) for a in (omega_deg, phi_deg, kappa_deg))
    rx = np.array([[1, 0, 0], [0, math.cos(o), -math.sin(o)], [0, math.sin(o), math.cos(o)]])
    ry = np.array([[math.cos(p), 0, math.sin(p)], [0, 1, 0], [-math.sin(p), 0, math.cos(p)]])
    rz = np.array([[math.cos(k), -math.sin(k), 0], [math.sin(k), math.cos(k), 0], [0, 0, 1]])
    m = np.eye(4)
    m[:3, :3] = scale * (rz @ ry @ rx)
    m[:3, 3] = t
    return m


def decompose_similarity(m: np.ndarray) -> dict[str, float]:
    """scale + Euler angles (deg) + translation from a 4x4 similarity —
    parity with the reference's registration.txt fields (dsm.py:404-416:
    c = norm of first column; R = M[:3,:3]/c; omega/phi/kappa via atan2)."""
    m = np.asarray(m, dtype=np.float64)
    c = float(np.linalg.norm(m[:3, 0]))
    r = m[:3, :3] / c
    omega = math.degrees(math.atan2(-r[1, 2], r[2, 2]))
    phi = math.degrees(math.asin(max(-1.0, min(1.0, r[0, 2]))))
    kappa = math.degrees(math.atan2(-r[0, 1], r[0, 0]))
    return {
        "scale": c,
        "omega": omega,
        "phi": phi,
        "kappa": kappa,
        "trans_x": float(m[0, 3]),
        "trans_y": float(m[1, 3]),
        "trans_z": float(m[2, 3]),
    }
