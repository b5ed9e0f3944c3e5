"""ICI-sharded IVF search.

Scales the cell-probe index across the mesh (BASELINE.json config #4/5 at
multi-chip corpora): rows are block-sharded as in the flat store, each
device keeps the *same* coarse centroids (trained globally, optionally via
parallel/kmeans.py) but inverted lists over its own rows only. A query
probes the same nprobe cells on every shard, scans local candidates, and
the per-shard (k, dist, global-id) results merge over ICI exactly like the
flat path — so the result set equals the unsharded IVF's (same probed
cells, candidates merely partitioned).
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
        self.centroids = None  # (nlist, d) replicated
        self.rows = None  # (S*R, d) row-sharded
        self.lists = None  # (S*nlist, max_l) sharded on first axis
        self.n = 0
        self.rows_per_shard = 0
        self.nlist = 0
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

        # per-shard inverted lists over local rows (global row ids),
        # vectorized via the shared argsort builder, padded to a common width
        from image_search_engine_tpu.index.ivf import _build_lists

        per_shard = [
            _build_lists(codes[si * r : min((si + 1) * r, n)], nlist, row_offset=si * r)
            for si in range(s)
        ]
        max_l = max(8, max(l.shape[1] for l in per_shard))
        lists = np.full((s, nlist, max_l), -1, np.int32)
        for si, l in enumerate(per_shard):
            lists[si, :, : l.shape[1]] = l

        self.centroids = jax.device_put(jnp.asarray(centroids, jnp.float32),
                                        NamedSharding(mesh, P()))
        self.rows = jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P(axis, None)))
        self.lists = jax.device_put(
            jnp.asarray(lists.reshape(s * nlist, max_l)),
            NamedSharding(mesh, P(axis, None)),
        )
        self.n = n
        self.rows_per_shard = r
        self.nlist = nlist
        self.nprobe = min(nprobe, nlist)
        return self

    def search(self, q: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        q = jnp.asarray(np.atleast_2d(np.asarray(q, np.float32)))
        nprobe, nlist = self.nprobe, self.nlist
        r = self.rows_per_shard
        max_l = self.lists.shape[1]
        n, axis = self.n, self.axis
        k_eff = min(k, max(1, min(n, self.mesh.shape[axis] * nprobe * max_l)))

        def shard_fn(qr, cents, rows_local, lists_local):
            base = jax.lax.axis_index(axis) * r
            # nearest nprobe cells (identical on every shard)
            cn = jnp.sum(cents * cents, axis=1)
            cd = cn[None, :] - 2.0 * jnp.dot(qr, cents.T, preferred_element_type=jnp.float32)
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
            in_specs=(P(), P(), P(axis, None), P(axis, None)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        d, i = f(q, self.centroids, self.rows, self.lists)
        d, i = np.array(d), np.array(i)
        i[~np.isfinite(d)] = -1
        if d.shape[1] < k:
            d = np.pad(d, ((0, 0), (0, k - d.shape[1])), constant_values=np.inf)
            i = np.pad(i, ((0, 0), (0, k - i.shape[1])), constant_values=-1)
        return d[:, :k], i[:, :k]
