"""Distributed k-means on the 8-device CPU mesh vs the single-device
trainer (SURVEY.md §2.3: per-shard assignment + psum update)."""

import numpy as np

from image_search_engine_tpu.ops.kmeans import KMeans, kmeans_fit, lloyd, _random_init
from image_search_engine_tpu.parallel.kmeans import kmeans_fit_sharded, lloyd_sharded
from image_search_engine_tpu.parallel.mesh import make_mesh

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def test_sharded_lloyd_matches_single_device(rng):
    mesh = make_mesh(8)
    n, d, k = 256, 16, 6
    x = rng.standard_normal((n, d)).astype(np.float32)
    init = x[rng.choice(n, k, replace=False)]

    c1, _ = lloyd(jnp.asarray(x), jnp.asarray(init), k, niter=10)

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data", None)))
    ws = jax.device_put(jnp.ones((n,), jnp.float32), NamedSharding(mesh, P("data")))
    c2, inertia2 = lloyd_sharded(xs, ws, jnp.asarray(init), k, mesh, niter=10)

    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-3, atol=1e-4)


def test_sharded_fit_quality_and_padding(rng):
    mesh = make_mesh(8)
    # 203 rows: pad rows must not perturb the centroids (weight 0)
    centers = rng.standard_normal((4, 8)).astype(np.float32) * 4
    x = np.concatenate([c + 0.05 * rng.standard_normal((50, 8)).astype(np.float32) for c in centers])[:203]
    c, inertia = kmeans_fit_sharded(x, 4, mesh, niter=15, nredo=2, seed=0)
    d = ((centers[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    assert (d.min(1) < 0.1).all()
    assert np.isfinite(inertia)


def test_sharded_spherical_unit_norm(rng):
    mesh = make_mesh(8)
    x = rng.standard_normal((160, 12)).astype(np.float32)
    c, _ = kmeans_fit_sharded(x, 5, mesh, niter=8, nredo=1, spherical=True)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, rtol=1e-4)
