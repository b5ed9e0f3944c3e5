"""ICI-sharded IVF search.

Scales the cell-probe index across the mesh (BASELINE.json config #4/5 at
multi-chip corpora): rows are block-sharded as in the flat store, each
device keeps the *same* coarse centroids (trained globally, optionally via
parallel/kmeans.py) but balanced probe buckets over its own rows only
(cells above the width cap split into buckets that duplicate the cell
centroid — see index/ivf._build_buckets). A query ranks its shard's
buckets, scans the nprobe best locally, and the per-shard
(k, dist, global-id) results merge over ICI exactly like the flat path.
Because bucketization is per-shard, results can differ from the unsharded
index near the probe frontier; recall parity is what's tested.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ShardedIVF:
    """Device-resident sharded IVF built from host arrays.

    Build with ``from_components`` (vectors + global centroids); search is
    one shard_map program.
    """

    def __init__(self, mesh: Mesh, axis: str = "data"):
        self.mesh = mesh
        self.axis = axis
        self.centroids = None  # (nlist, d) replicated cell centroids
        self.bucket_centroids = None  # (S*nb, d) sharded; pads poisoned far
        self.rows = None  # (S*R, d) row-sharded
        self.lists = None  # (S*nb, cap) sharded on first axis
        self.n = 0
        self.rows_per_shard = 0
        self.nlist = 0
        self.nbuckets = 0
        self.nprobe = 0

    @classmethod
    def from_components(
        cls,
        x: np.ndarray,
        centroids: np.ndarray,
        nprobe: int,
        mesh: Mesh,
        axis: str = "data",
    ) -> "ShardedIVF":
        from image_search_engine_tpu.ops.kmeans import assign_jax

        self = cls(mesh, axis)
        x = np.asarray(x, np.float32)
        n, d = x.shape
        nlist = centroids.shape[0]
        s = mesh.shape[axis]
        r = _round_up(-(-n // s), 8)  # rows per shard
        npad = r * s

        xp = np.zeros((npad, d), np.float32)
        xp[:n] = x
        codes = np.asarray(assign_jax(jnp.asarray(x), jnp.asarray(centroids))[0])

        # per-shard balanced buckets over local rows (global row ids):
        # over-full cells split into fixed-cap buckets that duplicate the
        # cell centroid (see index/ivf._build_buckets — the single padded
        # rectangle is unbounded on skewed data)
        from image_search_engine_tpu.index.ivf import _build_buckets

        per_shard = []
        for si in range(s):
            lo, hi = si * r, min((si + 1) * r, n)
            lst, b_cell = _build_buckets(codes[lo:hi], nlist)
            lst = np.where(lst >= 0, lst + lo, -1).astype(np.int32)
            per_shard.append((lst, b_cell))
        cap = max(l.shape[1] for l, _ in per_shard)
        nb = max(l.shape[0] for l, _ in per_shard)
        lists = np.full((s, nb, cap), -1, np.int32)
        # pad-bucket centroids poisoned far away so they rank last
        bcents = np.full((s, nb, d), 1e15, np.float32)
        for si, (l, b_cell) in enumerate(per_shard):
            lists[si, : l.shape[0], : l.shape[1]] = l
            bcents[si, : l.shape[0]] = centroids[b_cell]

        self.centroids = jax.device_put(jnp.asarray(centroids, jnp.float32),
                                        NamedSharding(mesh, P()))
        self.rows = jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P(axis, None)))
        self.lists = jax.device_put(
            jnp.asarray(lists.reshape(s * nb, cap)),
            NamedSharding(mesh, P(axis, None)),
        )
        self.bucket_centroids = jax.device_put(
            jnp.asarray(bcents.reshape(s * nb, d)),
            NamedSharding(mesh, P(axis, None)),
        )
        self.n = n
        self.rows_per_shard = r
        self.nlist = nlist
        self.nbuckets = nb
        # nprobe is cell-denominated; split cells consume one probe slot per
        # bucket, so scale by the bucket/cell ratio (duplicated centroids
        # tie, keeping a split cell's buckets adjacent in the probe order)
        self.nprobe = int(min(nb, max(nprobe, -(-nprobe * nb // nlist))))
        return self

    def search(self, q: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        q = jnp.asarray(np.atleast_2d(np.asarray(q, np.float32)))
        nprobe = self.nprobe
        r = self.rows_per_shard
        max_l = self.lists.shape[1]
        n, axis = self.n, self.axis
        k_eff = min(k, max(1, min(n, self.mesh.shape[axis] * nprobe * max_l)))

        def shard_fn(qr, bcents, rows_local, lists_local):
            base = jax.lax.axis_index(axis) * r
            # nearest nprobe LOCAL buckets (pad buckets poisoned far away)
            cn = jnp.sum(bcents * bcents, axis=1)
            cd = cn[None, :] - 2.0 * jnp.dot(qr, bcents.T, preferred_element_type=jnp.float32)
            _, probe = jax.lax.top_k(-cd, nprobe)  # (Q, nprobe)

            cand = lists_local[probe].reshape(qr.shape[0], nprobe * max_l)  # global ids
            valid = cand >= 0
            local_idx = jnp.clip(cand - base, 0, r - 1)
            vecs = rows_local[local_idx]  # (Q, C, d)
            qn = jnp.sum(qr * qr, axis=1, keepdims=True)
            vn = jnp.sum(vecs * vecs, axis=2)
            cross = jnp.einsum("qd,qcd->qc", qr, vecs, preferred_element_type=jnp.float32)
            dist = jnp.where(valid, qn - 2.0 * cross + vn, jnp.inf)

            kk = min(k_eff, nprobe * max_l)
            vals, pos = jax.lax.top_k(-dist, kk)
            ids = jnp.take_along_axis(cand, pos, axis=1)

            # merge across shards
            d_all = jax.lax.all_gather(-vals, axis)  # (S, Q, kk) distances
            i_all = jax.lax.all_gather(ids, axis)
            d_cat = jnp.swapaxes(d_all, 0, 1).reshape(qr.shape[0], -1)
            i_cat = jnp.swapaxes(i_all, 0, 1).reshape(qr.shape[0], -1)
            mvals, mpos = jax.lax.top_k(-d_cat, k_eff)
            mids = jnp.take_along_axis(i_cat, mpos, axis=1)
            return -mvals, mids

        f = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(), P(axis, None), P(axis, None), P(axis, None)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        d, i = f(q, self.bucket_centroids, self.rows, self.lists)
        d, i = np.array(d), np.array(i)
        i[~np.isfinite(d)] = -1
        if d.shape[1] < k:
            d = np.pad(d, ((0, 0), (0, k - d.shape[1])), constant_values=np.inf)
            i = np.pad(i, ((0, 0), (0, k - i.shape[1])), constant_values=-1)
        return d[:, :k], i[:, :k]
