"""Native C++ KNN: correctness vs scipy cKDTree + throughput sanity."""
import time

import numpy as np
import pytest

from emd_tpu.native import knn, native_available


def test_native_builds():
    assert native_available()


def test_knn_matches_scipy():
    from scipy.spatial import cKDTree
    rng = np.random.RandomState(0)
    pts = rng.randn(5000, 3).astype(np.float32)
    d, i = knn(pts, 3)
    ds, _ = cKDTree(pts).query(pts, k=4, workers=-1)
    np.testing.assert_allclose(d, ds[:, 1:], rtol=1e-4, atol=1e-5)
    # neighbour distances consistent with indices
    check = np.linalg.norm(pts - pts[i[:, 0]], axis=1)
    np.testing.assert_allclose(check, d[:, 0], rtol=1e-4, atol=1e-5)


def test_knn_clustered_distribution():
    """Lidar-like: dense ground plane + sparse structures."""
    rng = np.random.RandomState(1)
    ground = np.stack([rng.uniform(-50, 50, 20000),
                       rng.uniform(-10, 10, 20000),
                       rng.normal(0, 0.05, 20000)], 1).astype(np.float32)
    poles = np.stack([rng.uniform(-50, 50, 2000),
                      rng.uniform(-10, 10, 2000),
                      rng.uniform(0, 6, 2000)], 1).astype(np.float32)
    pts = np.concatenate([ground, poles])
    from scipy.spatial import cKDTree
    d, _ = knn(pts, 3)
    ds, _ = cKDTree(pts).query(pts, k=4, workers=-1)
    np.testing.assert_allclose(d, ds[:, 1:], rtol=1e-4, atol=1e-5)


def test_knn_speed_at_scale():
    rng = np.random.RandomState(2)
    pts = rng.randn(300_000, 3).astype(np.float32) * 20
    t0 = time.time()
    d, i = knn(pts, 3)
    dt = time.time() - t0
    assert np.all(d >= 0) and np.isfinite(d).all()
    # generous bound: should take well under 10 s for 300k on 4 cores
    assert dt < 10.0, f"native knn too slow: {dt:.1f}s"
