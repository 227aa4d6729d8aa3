from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from codem_spark.session import get_spark

EXTENT = (0.0, 0.0, 100_000.0, 100_000.0)
SMALL_EXTENT = (0.0, 0.0, 1000.0, 1000.0)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="codem_spark_tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


@pytest.fixture(scope="session")
def blob_points() -> pd.DataFrame:
    """Three dense blobs + scattered noise (FIXTURES.md §5 shape)."""
    rng = np.random.default_rng(7)
    frames = []
    for ci, (cx, cy) in enumerate([(100, 100), (500, 500), (800, 200)]):
        frames.append(
            pd.DataFrame(
                {
                    "pid": np.arange(ci * 1000, ci * 1000 + 60),
                    "x": cx + rng.uniform(-5, 5, 60),
                    "y": cy + rng.uniform(-5, 5, 60),
                    "z": np.zeros(60),
                }
            )
        )
    frames.append(
        pd.DataFrame(
            {
                "pid": np.arange(5000, 5020),
                "x": rng.uniform(0, 1000, 20),
                "y": rng.uniform(0, 1000, 20),
                "z": np.zeros(20),
            }
        )
    )
    return pd.concat(frames, ignore_index=True)


def union_find_oracle(P: np.ndarray, tol: float) -> np.ndarray:
    """Single-machine exact connected components (edges = dist <= tol)."""
    n = len(P)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(2)
    ii, jj = np.nonzero(d2 <= tol * tol)
    for a, b in zip(ii, jj):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)])
