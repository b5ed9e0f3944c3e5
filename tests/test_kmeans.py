"""K-means trainer vs NumPy/sklearn references (replaces faiss.Kmeans,
backend/kmeans_faiss.py:5-50)."""

import numpy as np
import pytest

from image_search_engine_tpu.ops import kmeans as KM


def make_blobs(rng, n_per=100, k=5, d=16, spread=0.05):
    centers = rng.standard_normal((k, d)).astype(np.float32) * 3
    pts = np.concatenate(
        [c + spread * rng.standard_normal((n_per, d)).astype(np.float32) for c in centers]
    )
    labels = np.repeat(np.arange(k), n_per)
    return pts, centers, labels


def test_assign_matches_numpy(rng):
    x = rng.standard_normal((200, 24)).astype(np.float32)
    c = rng.standard_normal((10, 24)).astype(np.float32)
    codes, dists = KM.assign_jax(x, c)
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(codes), d.argmin(1))
    np.testing.assert_allclose(np.asarray(dists), d.min(1), rtol=1e-3, atol=1e-3)


def test_kmeans_recovers_blobs(rng):
    x, centers, labels = make_blobs(rng)
    km = KM.KMeans(n_clusters=5, niter=15, nredo=3, seed=0, spherical=False).fit(x)
    got = km.cluster_centers_
    # each true center has a learned centroid within the blob spread
    d = ((centers[:, None, :] - got[None, :, :]) ** 2).sum(-1)
    assert (d.min(1) < 0.1).all()
    # points in one blob share a code
    codes = km.transform(x)[:, 0]
    for b in range(5):
        blob_codes = codes[labels == b]
        assert (blob_codes == blob_codes[0]).all()


def test_kmeans_inertia_close_to_sklearn(rng):
    from sklearn.cluster import KMeans as SK

    x = rng.standard_normal((500, 8)).astype(np.float32)
    ours = KM.KMeans(n_clusters=16, niter=25, nredo=3, seed=42, spherical=False).fit(x)
    sk = SK(n_clusters=16, n_init=3, max_iter=25, random_state=0).fit(x)
    assert ours.inertia_ <= sk.inertia_ * 1.05, (ours.inertia_, sk.inertia_)


def test_spherical_kmeans_centroids_unit_norm(rng):
    x = rng.standard_normal((300, 12)).astype(np.float32)
    km = KM.KMeans(n_clusters=8, niter=10, nredo=1, spherical=True).fit(x)
    norms = np.linalg.norm(km.cluster_centers_, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_empty_cluster_keeps_centroid(rng):
    # k > distinct points: some clusters must stay at their previous centroid
    x = np.repeat(rng.standard_normal((3, 4)).astype(np.float32), 50, axis=0)
    km = KM.KMeans(n_clusters=8, niter=5, nredo=1, spherical=False).fit(x)
    assert np.isfinite(km.cluster_centers_).all()
    assert np.isfinite(km.inertia_)


def test_transform_shape_matches_reference_contract(rng):
    # reference FaissKMeans.transform returns (N, 1) labels (kmeans_faiss.py:49)
    x = rng.standard_normal((50, 6)).astype(np.float32)
    km = KM.KMeans(n_clusters=4, niter=5, nredo=1).fit(x)
    out = km.transform(x)
    assert out.shape == (50, 1)
    assert out.dtype in (np.int32, np.int64)
    assert (out >= 0).all() and (out < 4).all()


def test_subspace_kmeans_matches_serial_fits(rng):
    # the vmapped all-subspaces trainer must cluster as well as m serial
    # KMeans fits (same data, same k): compare per-subspace quantization
    # error, and codes must be valid nearest-centroid assignments
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.kmeans import KMeans, assign_jax, subspace_kmeans

    n, m, dsub, k = 3000, 4, 8, 16
    resid = rng.standard_normal((n, m, dsub)).astype(np.float32)
    books, codes = subspace_kmeans(jnp.asarray(resid), k=k, niter=15, seed=0)
    books, codes = np.asarray(books), np.asarray(codes)
    assert books.shape == (m, k, dsub) and codes.shape == (n, m)
    assert codes.min() >= 0 and codes.max() < k

    for j in range(m):
        # codes are the argmin assignment for the returned books
        direct, _ = assign_jax(jnp.asarray(resid[:, j]), jnp.asarray(books[j]))
        np.testing.assert_array_equal(codes[:, j], np.asarray(direct))
        # quantization error within 10% of a serial fit's
        err_v = ((resid[:, j] - books[j][codes[:, j]]) ** 2).sum(1).mean()
        km = KMeans(n_clusters=k, niter=15, nredo=1, seed=0,
                    spherical=False).fit(resid[:, j])
        err_s = ((resid[:, j] - km.cluster_centers_[km.transform(resid[:, j])[:, 0]]) ** 2).sum(1).mean()
        assert err_v <= err_s * 1.10, (err_v, err_s)


def test_subspace_kmeans_padding_does_not_pollute(rng):
    # N not a multiple of the chunk: pad rows must not drag centroids
    import jax.numpy as jnp

    from image_search_engine_tpu.ops.kmeans import subspace_kmeans

    resid = rng.standard_normal((1030, 2, 4)).astype(np.float32) + 5.0
    books, codes = subspace_kmeans(jnp.asarray(resid), k=8, niter=10, chunk=512)
    # all data is near +5; a pad-polluted centroid would sit near 0
    assert np.asarray(books).reshape(-1, 4).max(axis=1).min() > 2.0
