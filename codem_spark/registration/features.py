"""DSM feature detection + description — tile kernels (A1 of SURVEY.md §2.5).

Reference analog: AKAZE detect/describe on the normalized uint8 DSM
(DsmRegistration._get_kp, reference dsm.py:140-163). OpenCV is not available
(and a port is not the goal): the engine uses a deterministic Harris corner
detector + an orientation-normalized binary patch descriptor, implemented in
vectorized numpy inside an ``applyInPandas`` tile kernel over the gridded
DSM. Parity is judged on *pipeline outputs* (recovered transform / RMSE),
not detector bit-equality — the reference's own tests assert exactly that
(tests/test_registration.py:113-115 asserts converged registration, not
keypoint equality).

Tiling: the DSM long-format table (gx, gy, z, z_u8) is grouped into TILE x
TILE pixel tiles with a HALO-pixel overlap ring (keypoints are only *kept*
in the tile core, so every descriptor sees its full support window and no
keypoint is emitted twice). Rotation invariance comes from sampling the
descriptor patch along the keypoint's dominant gradient orientation —
needed because the reference test matrix perturbs AOIs by 90/180/360-degree
rotations (test_registration.py:39-62).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Extent = tuple[float, float, float, float]

TILE = 256  # core tile edge, pixels
HALO = 24  # overlap ring, pixels (descriptor support 16px * sqrt2 / 2 + smoothing)
DESC_BITS = 256  # packed into 4 int64
PATCH = 16  # descriptor sampling grid (PATCH x PATCH = DESC_BITS)
PATCH_RADIUS = 7.5  # sampling radius in pixels


def _smooth(a: np.ndarray, passes: int = 2) -> np.ndarray:
    """Separable 3x3 binomial smoothing (repeated), edge-replicated."""
    k = np.array([0.25, 0.5, 0.25])
    for _ in range(passes):
        ap = np.pad(a, 1, mode="edge")
        a = (
            k[0] * ap[:-2, 1:-1] + k[1] * ap[1:-1, 1:-1] + k[2] * ap[2:, 1:-1]
        )
        ap = np.pad(a, 1, mode="edge")
        a = (
            k[0] * ap[1:-1, :-2] + k[1] * ap[1:-1, 1:-1] + k[2] * ap[1:-1, 2:]
        )
    return a


def harris_keypoints(
    img: np.ndarray,
    valid: np.ndarray,
    max_kp: int = 400,
    k: float = 0.05,
    rel_threshold: float = 0.001,
) -> np.ndarray:
    """Harris corner response + 3x3 non-max suppression.

    Returns (n, 3) array of (row, col, response), strongest first, ties
    broken by (row, col) for determinism.
    """
    a = img.astype(np.float64)
    a = _smooth(a, passes=1)
    iy, ix = np.gradient(a)
    sxx = _smooth(ix * ix)
    syy = _smooth(iy * iy)
    sxy = _smooth(ix * iy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    r = det - k * tr * tr
    # suppress responses near invalid (void) pixels
    ok = _smooth(valid.astype(np.float64), passes=2) > 0.999
    r = np.where(ok, r, -np.inf)
    # 3x3 NMS
    rp = np.pad(r, 1, mode="constant", constant_values=-np.inf)
    nms = np.ones_like(r, dtype=bool)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            nms &= r >= rp[1 + dr : r.shape[0] + 1 + dr, 1 + dc : r.shape[1] + 1 + dc]
    thresh = rel_threshold * max(r.max(initial=-np.inf), 1e-12)
    rows, cols = np.nonzero(nms & (r > thresh) & np.isfinite(r))
    resp = r[rows, cols]
    order = np.lexsort((cols, rows, -resp))[:max_kp]
    return np.column_stack([rows[order], cols[order], resp[order]]).astype(np.float64)


def _bilinear(img: np.ndarray, rr: np.ndarray, cc: np.ndarray) -> np.ndarray:
    h, w = img.shape
    rr = np.clip(rr, 0, h - 1.001)
    cc = np.clip(cc, 0, w - 1.001)
    r0 = np.floor(rr).astype(np.int64)
    c0 = np.floor(cc).astype(np.int64)
    fr = rr - r0
    fc = cc - c0
    return (
        img[r0, c0] * (1 - fr) * (1 - fc)
        + img[r0 + 1, c0] * fr * (1 - fc)
        + img[r0, c0 + 1] * (1 - fr) * fc
        + img[r0 + 1, c0 + 1] * fr * fc
    )


def describe(img: np.ndarray, kps: np.ndarray) -> np.ndarray:
    """Orientation-normalized binary patch descriptors, packed to 4 int64.

    For each keypoint: dominant orientation = atan2 of the smoothed gradient
    averaged over a 9x9 window; sample a PATCH x PATCH grid rotated by that
    orientation (bilinear); bit = sample > patch mean. All keypoints are
    processed in one vectorized batch.
    """
    if len(kps) == 0:
        return np.zeros((0, DESC_BITS // 64), dtype=np.int64)
    a = _smooth(img.astype(np.float64), passes=1)
    iy, ix = np.gradient(a)
    sx = _smooth(ix, passes=2)
    sy = _smooth(iy, passes=2)
    r = kps[:, 0].astype(np.int64)
    c = kps[:, 1].astype(np.int64)
    theta = np.arctan2(sy[r, c], sx[r, c])
    # rotated sampling grid
    lin = np.linspace(-PATCH_RADIUS, PATCH_RADIUS, PATCH)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    gx = gx.ravel()[None, :]  # (1, P*P)
    gy = gy.ravel()[None, :]
    ct = np.cos(theta)[:, None]
    st = np.sin(theta)[:, None]
    rr = kps[:, 0:1] + gx * st + gy * ct
    cc = kps[:, 1:2] + gx * ct - gy * st
    samples = _bilinear(a, rr, cc)  # (n, P*P)
    bits = samples > samples.mean(axis=1, keepdims=True)
    packed = np.zeros((len(kps), DESC_BITS // 64), dtype=np.uint64)
    for w in range(DESC_BITS // 64):
        chunk = bits[:, w * 64 : (w + 1) * 64]
        weights = (1 << np.arange(64, dtype=np.uint64))
        packed[:, w] = (chunk.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return packed.view(np.int64)


def extract_features(
    dsm: DataFrame,
    extent: Extent,
    resolution: float,
    max_kp_per_tile: int = 400,
) -> DataFrame:
    """DSM table (gx, gy, z, z_u8) -> keypoint table
    (gx, gy, x, y, z, response, d0, d1, d2, d3).

    Geo-coordinates use the Area pixel convention (+0.5 px — reference
    dsm.py:374-375, preprocess.py:304-306); z is the infilled DSM elevation
    at the keypoint cell (the reference samples the same DSM,
    dsm.py:335-384).
    """
    # optional det_u8 plane: keypoints are DETECTED on it (band-passed DSM,
    # pipeline._prep_dsm) while descriptors sample z_u8 (full-band). Falls
    # back to z_u8 for both when absent.
    has_det = "det_u8" in dsm.columns
    if not has_det:
        dsm = dsm.withColumn("det_u8", F.col("z_u8"))
    tx = F.floor(F.col("gx") / F.lit(TILE))
    ty = F.floor(F.col("gy") / F.lit(TILE))
    base = dsm.withColumn("tx", tx).withColumn("ty", ty)
    # halo membership: a pixel near a tile border is duplicated into the
    # neighboring tile(s) so each tile kernel sees TILE+2*HALO pixels
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    off = F.explode(
        F.array(*[F.struct(F.lit(a).alias("dx"), F.lit(b).alias("dy")) for a, b in offs])
    )
    e = base.withColumn("_o", off)
    ntx = F.col("tx") + F.col("_o.dx")
    nty = F.col("ty") + F.col("_o.dy")
    # keep the duplicate only if the pixel falls inside the neighbor tile's
    # halo window
    in_win = (
        (F.col("gx") >= ntx * TILE - HALO)
        & (F.col("gx") < (ntx + 1) * TILE + HALO)
        & (F.col("gy") >= nty * TILE - HALO)
        & (F.col("gy") < (nty + 1) * TILE + HALO)
    )
    tiled = e.filter(in_win).select(
        ntx.alias("tx"), nty.alias("ty"), "gx", "gy", "z", "z_u8", "det_u8"
    )

    def kernel(key, pdf):
        tx_, ty_ = int(key[0]), int(key[1])
        x0p = tx_ * TILE - HALO
        y0p = ty_ * TILE - HALO
        w = TILE + 2 * HALO
        img = np.zeros((w, w), dtype=np.float64)
        det = np.zeros((w, w), dtype=np.float64)
        valid = np.zeros((w, w), dtype=bool)
        rr = pdf["gy"].to_numpy() - y0p
        cc = pdf["gx"].to_numpy() - x0p
        img[rr, cc] = pdf["z_u8"].to_numpy(np.float64)
        det[rr, cc] = pdf["det_u8"].to_numpy(np.float64)
        valid[rr, cc] = True
        zs = np.zeros((w, w), dtype=np.float64)
        zs[rr, cc] = pdf["z"].to_numpy(np.float64)
        kps = harris_keypoints(det, valid, max_kp=max_kp_per_tile)
        if len(kps):
            # keep only keypoints whose center lies in the tile core
            core = (
                (kps[:, 0] >= HALO)
                & (kps[:, 0] < HALO + TILE)
                & (kps[:, 1] >= HALO)
                & (kps[:, 1] < HALO + TILE)
            )
            kps = kps[core]
        if len(kps) == 0:
            return pd.DataFrame(
                {c: [] for c in ["gx", "gy", "x", "y", "z", "response", "d0", "d1", "d2", "d3"]}
            )
        desc = describe(img, kps)
        gxk = kps[:, 1].astype(np.int64) + x0p
        gyk = kps[:, 0].astype(np.int64) + y0p
        return pd.DataFrame(
            {
                "gx": gxk,
                "gy": gyk,
                "x": extent[0] + (gxk + 0.5) * resolution,
                "y": extent[1] + (gyk + 0.5) * resolution,
                "z": zs[kps[:, 0].astype(np.int64), kps[:, 1].astype(np.int64)],
                "response": kps[:, 2],
                "d0": desc[:, 0],
                "d1": desc[:, 1],
                "d2": desc[:, 2],
                "d3": desc[:, 3],
            }
        )

    schema = (
        "gx long, gy long, x double, y double, z double, response double, "
        "d0 long, d1 long, d2 long, d3 long"
    )
    return tiled.groupBy("tx", "ty").applyInPandas(kernel, schema=schema)
