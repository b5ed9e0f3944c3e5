"""IVF / IVF-PQ indexes: recall parity vs exact flat search (the
BASELINE.json metric; reference index built at backend/utils.py:311-325)."""

import numpy as np
import pytest

from image_search_engine_tpu.index.flat import FlatIndex
from image_search_engine_tpu.index.ivf import IVFIndex, IVFPQIndex


def recall_at_k(got_ids, true_ids):
    hits = 0
    for g, t in zip(got_ids, true_ids):
        hits += len(set(g.tolist()) & set(t.tolist()))
    return hits / true_ids.size


def common_id_dists(d1, i1, d2, i2):
    """Distance pairs for ids BOTH searches returned, row-aligned.

    Two near-equivalent search paths legitimately disagree about the
    k-th-rank frontier (ties / rounding pick different tail neighbors),
    which makes sorted-distance-vector comparison fragile — a frontier
    swap shifts every later sorted position. Distances are only
    comparable where the ids agree."""
    a, b = [], []
    for r in range(i1.shape[0]):
        m1 = {int(i): float(v) for i, v in zip(i1[r], d1[r]) if i >= 0}
        m2 = {int(i): float(v) for i, v in zip(i2[r], d2[r]) if i >= 0}
        for key in m1.keys() & m2.keys():
            a.append(m1[key])
            b.append(m2[key])
    return np.asarray(a), np.asarray(b)


@pytest.fixture
def corpus(rng):
    # clusterable data so IVF partitions meaningfully
    centers = rng.standard_normal((10, 32)).astype(np.float32) * 4
    x = np.concatenate([c + rng.standard_normal((200, 32)).astype(np.float32) for c in centers])
    q = x[rng.choice(len(x), 16, replace=False)] + 0.05 * rng.standard_normal((16, 32)).astype(np.float32)
    return x, q


def test_ivf_full_probe_matches_exact(corpus):
    x, q = corpus
    ivf = IVFIndex(nlist=8, nprobe=8).add(x)  # probe all lists -> exact
    flat = FlatIndex("l2").add(x)
    di, ii = ivf.search(q, 10)
    df, if_ = flat.search(q, 10)
    np.testing.assert_array_equal(ii, if_)
    np.testing.assert_allclose(di, df, rtol=1e-3, atol=1e-3)


def test_ivf_partial_probe_recall(corpus):
    x, q = corpus
    ivf = IVFIndex(nlist=16, nprobe=5).add(x)
    flat = FlatIndex("l2").add(x)
    _, ii = ivf.search(q, 10)
    _, if_ = flat.search(q, 10)
    assert recall_at_k(ii, if_) >= 0.95  # the BASELINE.json bar


def test_ivf_save_load_roundtrip(corpus, tmp_path):
    x, q = corpus
    ivf = IVFIndex(nlist=8, nprobe=3).add(x)
    p = tmp_path / "ivf.npz"
    ivf.save(p)
    ivf2 = IVFIndex.load(p)
    d1, i1 = ivf.search(q, 5)
    d2, i2 = ivf2.search(q, 5)
    np.testing.assert_array_equal(i1, i2)


def test_ivf_underfull_probes_return_minus_one(rng):
    x = rng.standard_normal((20, 8)).astype(np.float32)
    ivf = IVFIndex(nlist=10, nprobe=1).add(x)
    d, i = ivf.search(x[:2], 10)
    assert (i == -1).any()  # one probed list can't hold 10 candidates


def test_ivfpq_recall_reasonable(corpus):
    x, q = corpus
    pq = IVFPQIndex(nlist=8, nprobe=8, m=16).add(x)
    flat = FlatIndex("l2").add(x)
    _, ii = pq.search(q, 10)
    _, if_ = flat.search(q, 10)
    # PQ is lossy; with full probing recall@10 should still be high
    assert recall_at_k(ii, if_) >= 0.6


def test_ivfpq_save_load(corpus, tmp_path):
    x, q = corpus
    pq = IVFPQIndex(nlist=4, nprobe=4, m=8).add(x)
    p = tmp_path / "ivfpq.npz"
    pq.save(p)
    pq2 = IVFPQIndex.load(p)
    d1, i1 = pq.search(q, 5)
    d2, i2 = pq2.search(q, 5)
    np.testing.assert_array_equal(i1, i2)


def test_sharded_ivf_matches_unsharded(corpus):
    from image_search_engine_tpu.parallel.ivf import ShardedIVF
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, q = corpus
    mesh = make_mesh(8)
    ivf = IVFIndex(nlist=16, nprobe=16).add(x)  # full probe -> exact
    sharded = ShardedIVF.from_components(x, ivf.centroids, nprobe=16, mesh=mesh)
    d1, i1 = ivf.search(q, 10)
    d2, i2 = sharded.search(q, 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-3, atol=1e-3)


def test_sharded_ivf_partial_probe_recall(corpus):
    from image_search_engine_tpu.parallel.ivf import ShardedIVF
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, q = corpus
    mesh = make_mesh(8)
    ivf = IVFIndex(nlist=16, nprobe=5).add(x)
    sharded = ShardedIVF.from_components(x, ivf.centroids, nprobe=5, mesh=mesh)
    flat = FlatIndex("l2").add(x)
    _, si = sharded.search(q, 10)
    _, fi = flat.search(q, 10)
    assert recall_at_k(si, fi) >= 0.95
    # bucketization is per-shard, so results may differ from the unsharded
    # index near the probe frontier — recall parity is the contract
    _, ui = ivf.search(q, 10)
    assert recall_at_k(si, ui) >= 0.9


def test_sharded_ivf_pallas_scan_matches_xla_reference(corpus):
    """The mesh scan defaults to the fused probed-scan kernel (per-shard
    bucket blocks DMA'd per grid step); the XLA gather formulation is kept
    as impl="xla" purely as the parity oracle. Same probes, same candidate
    set -> identical neighbor ids, distances to accumulation tolerance —
    at a Q where the (Q, nprobe*cap, d) gather buffer would dominate on
    real hardware (per-shard cost model: BENCH_NOTES "Batched IVF via the
    fused probed-scan kernel", 118.7k QPS vs the gather path's OOM)."""
    from image_search_engine_tpu.parallel.ivf import ShardedIVF
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, _ = corpus
    rng = np.random.default_rng(7)
    q = rng.standard_normal((64, x.shape[1])).astype(np.float32)
    mesh = make_mesh(8)
    ivf = IVFIndex(nlist=16, nprobe=4).add(x)
    sharded = ShardedIVF.from_components(x, ivf.centroids, nprobe=4, mesh=mesh)
    dp, ip_ = sharded.search(q, 10, impl="pallas")
    dx, ix = sharded.search(q, 10, impl="xla")
    assert (np.sort(ip_, 1) == np.sort(ix, 1)).all()
    np.testing.assert_allclose(np.sort(dp, 1), np.sort(dx, 1),
                               rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError, match="impl"):
        sharded.search(q, 10, impl="gather")


def test_sharded_ivfpq_full_probe_matches_unsharded(corpus):
    from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, q = corpus
    mesh = make_mesh(8)
    pq = IVFPQIndex(nlist=8, nprobe=8, m=16).add(x)  # full probe
    spq = ShardedIVFPQ.from_index(pq, mesh)
    d1, i1 = pq.search(q, 10)
    d2, i2 = spq.search(q, 10)
    # full probing ADC-scores every row with identical LUT math on both
    # layouts -> same neighbor sets (tie order may differ)
    assert recall_at_k(np.asarray(i2), np.asarray(i1)) >= 0.95
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1), rtol=1e-3, atol=1e-3)


def test_sharded_ivfpq_partial_probe_recall(corpus):
    from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, q = corpus
    mesh = make_mesh(8)
    pq = IVFPQIndex(nlist=8, nprobe=4, m=16).add(x)
    spq = ShardedIVFPQ.from_index(pq, mesh)
    flat = FlatIndex("l2").add(x)
    _, si = spq.search(q, 10)
    _, fi = flat.search(q, 10)
    # PQ is lossy; match the unsharded IVFPQ recall bar vs exact search
    assert recall_at_k(np.asarray(si), np.asarray(fi)) >= 0.6
    _, ui = pq.search(q, 10)
    assert recall_at_k(np.asarray(si), np.asarray(ui)) >= 0.7


def test_sharded_ivfpq_from_codes_only_artifact(corpus, tmp_path):
    # the compressed (no raw vectors) artifact must scale out compressed —
    # round 1 silently ignored the mesh for codes-only artifacts
    from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, q = corpus
    pq = IVFPQIndex(nlist=8, nprobe=8, m=8).add(x)
    p = tmp_path / "pq.npz"
    pq.save(p)  # store_raw defaults False
    loaded = IVFPQIndex.load(p)
    assert loaded.vectors is None
    mesh = make_mesh(8)
    spq = ShardedIVFPQ.from_index(loaded, mesh)
    d1, i1 = pq.search(q, 10)
    d2, i2 = spq.search(q, 10)
    assert recall_at_k(np.asarray(i2), np.asarray(i1)) >= 0.95
    # sharded storage is the codes, not vectors
    # ...and stays byte-per-subspace on device (uint8): the mesh holds
    # ~N*m bytes of codes, not a 4x-widened int32 table
    assert spq.packed_codes.dtype == np.uint8
    assert spq.pq_books.shape[1] == 256


def test_sharded_ivfpq_recon_scan_matches_adc(corpus):
    """search_batched on the mesh: per-shard bf16 reconstruction table +
    fused probed-scan kernel must agree with the per-shard ADC scan (same
    probe sets; recon-scan distance IS ADC up to bf16 rounding), and with
    the rerank stage it must return the same EXACT distances as the ADC
    path's rerank."""
    from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, q = corpus
    mesh = make_mesh(8)
    pq = IVFPQIndex(nlist=8, nprobe=8, m=16).add(x)  # full probe
    spq = ShardedIVFPQ.from_index(pq, mesh)
    d_adc, i_adc = spq.search(q, 10)
    d_rec, i_rec = spq.search_batched(q, 10)
    assert recall_at_k(np.asarray(i_rec), np.asarray(i_adc)) >= 0.9
    # compare where the ids agree. The bf16 recon scan's distance error
    # scales with the CANCELLED OPERANDS (||q||^2, ||x||^2 ~ 5e2 on this
    # corpus; eps_bf16 = 2^-8 -> ~2 absolute), not with the distance —
    # near-self distances are cancellation-noisy by construction.
    a, b = common_id_dists(d_rec, i_rec, d_adc, i_adc)
    atol = 0.01 * float(np.mean((x * x).sum(1)))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=atol)
    # with exact rerank both paths re-score from the same raw f32 rows:
    # common-id distances must MATCH, not just correlate
    dr_adc, ir_adc = spq.search(q, 5, rerank=16)
    dr_rec, ir_rec = spq.search_batched(q, 5, rerank=16)
    assert recall_at_k(np.asarray(ir_rec), np.asarray(ir_adc)) >= 0.9
    a, b = common_id_dists(dr_rec, ir_rec, dr_adc, ir_adc)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_sharded_ivf_bf16_table(corpus):
    # the bf16-table serving recommendation must survive the mesh: same
    # neighbors as the f32 sharded table (up to bf16 rounding of ties),
    # half the per-shard row storage
    import jax.numpy as jnp

    from image_search_engine_tpu.parallel.ivf import ShardedIVF
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, q = corpus
    mesh = make_mesh(8)
    ivf = IVFIndex(nlist=16, nprobe=16).add(x)  # full probe -> exact
    s32 = ShardedIVF.from_components(x, ivf.centroids, nprobe=16, mesh=mesh)
    s16 = ShardedIVF.from_components(x, ivf.centroids, nprobe=16, mesh=mesh,
                                     table_dtype="bf16")
    assert s16.packed.dtype == jnp.bfloat16 and s32.packed.dtype == jnp.float32
    d1, i1 = s32.search(q, 10)
    d2, i2 = s16.search(q, 10)
    assert recall_at_k(np.asarray(i2), np.asarray(i1)) >= 0.95
    # bf16 tables score bf16(q) x bf16(x) on the MXU — the same contract
    # as the single-chip probed scans (index/ivf.py casts q to the table
    # dtype too). Compare only where the two paths returned the same id
    # (frontier neighbors legitimately differ), with a tolerance scaled
    # to the CANCELLED OPERANDS (||q||^2/||x||^2 ~ 5e2 here; bf16 eps
    # 2^-8 -> ~2 absolute on near-zero distances).
    a, b = common_id_dists(d1, i1, d2, i2)
    atol = 0.01 * float(np.mean((x * x).sum(1)))
    np.testing.assert_allclose(a, b, rtol=6e-2, atol=atol)
    with pytest.raises(ValueError, match="table_dtype"):
        ShardedIVF.from_components(x, ivf.centroids, nprobe=4, mesh=mesh,
                                   table_dtype="int8")


def test_sharded_ivfpq_rerank_parity(corpus, tmp_path):
    # the refine stage must survive the mesh: shard-local exact rescore of
    # the ADC shortlist, merged on exact distances — recall parity with the
    # single-chip IVFPQIndex.search(rerank=C) path AND with exact search
    from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, q = corpus
    mesh = make_mesh(8)
    pq = IVFPQIndex(nlist=8, nprobe=8, m=16, rerank=64).add(x)  # full probe
    p = tmp_path / "pq.npz"
    pq.save(p, store_raw=True)
    loaded = IVFPQIndex.load(p)
    spq = ShardedIVFPQ.from_index(loaded, mesh)
    assert spq.rerank == 64 and spq.raw_rows is not None

    d1, i1 = pq.search(q, 10)
    d2, i2 = spq.search(q, 10)
    flat = FlatIndex("l2").add(x)
    df, fi = flat.search(q, 10)
    # rerank distances are exact over the store on both layouts; full
    # probing means both shortlists cover the true neighbors
    assert recall_at_k(np.asarray(i2), np.asarray(fi)) >= 0.95
    assert recall_at_k(np.asarray(i2), np.asarray(i1)) >= 0.95
    np.testing.assert_allclose(np.sort(d2, 1), np.sort(df, 1),
                               rtol=1e-3, atol=1e-3)


def test_sharded_ivfpq_rerank_requires_raw(corpus, tmp_path, caplog):
    import logging

    from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, q = corpus
    pq = IVFPQIndex(nlist=8, nprobe=4, m=8, rerank=32).add(x)
    p = tmp_path / "pq.npz"
    pq.save(p)  # codes-only: rerank cannot survive
    loaded = IVFPQIndex.load(p)
    with caplog.at_level(logging.WARNING,
                         logger="image_search_engine_tpu.parallel.ivf"):
        spq = ShardedIVFPQ.from_index(loaded, make_mesh(8))
    assert any("codes-only" in r.message for r in caplog.records)
    assert spq.rerank == 0 and spq.raw_rows is None  # downgraded loudly...
    spq.search(q, 5)  # ...but ADC search still works
    with pytest.raises(ValueError, match="rerank needs raw vectors"):
        spq.search(q, 5, rerank=32)


def test_sharded_ivfpq_rerank_override_with_raw(corpus, tmp_path):
    # single-chip API parity: a store_raw artifact built WITHOUT a default
    # shortlist still honors per-call search(rerank=C) on the mesh
    from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x, q = corpus
    pq = IVFPQIndex(nlist=8, nprobe=8, m=16).add(x)  # rerank=0, full probe
    p = tmp_path / "pq.npz"
    pq.save(p, store_raw=True)
    spq = ShardedIVFPQ.from_index(IVFPQIndex.load(p), make_mesh(8))
    assert spq.rerank == 0 and spq.raw_rows is not None
    d1, i1 = pq.search(q, 10, rerank=64)
    d2, i2 = spq.search(q, 10, rerank=64)
    assert recall_at_k(np.asarray(i2), np.asarray(i1)) >= 0.95
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1),
                               rtol=1e-3, atol=1e-3)


def test_ivfpq_row_cells_roundtrip(corpus):
    from image_search_engine_tpu.ops.kmeans import assign_jax
    import jax.numpy as jnp

    x, _ = corpus
    pq = IVFPQIndex(nlist=8, nprobe=4, m=8).add(x)
    rc = pq.row_cells()
    direct, _ = assign_jax(jnp.asarray(pq.vectors), jnp.asarray(pq.centroids))
    np.testing.assert_array_equal(rc, np.asarray(direct))


def test_sharded_ivfpq_cosine_semantics(rng):
    from image_search_engine_tpu.parallel.ivf import ShardedIVFPQ
    from image_search_engine_tpu.parallel.mesh import make_mesh

    x = rng.standard_normal((400, 32)).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    pq = IVFPQIndex(metric="cosine", nlist=4, nprobe=4, m=8).add(x)
    spq = ShardedIVFPQ.from_index(pq, make_mesh(8))
    d1, _ = pq.search(q, 5)
    d2, _ = spq.search(q, 5)
    # both descending similarity
    assert (np.diff(d1, axis=1) <= 1e-6).all() and (np.diff(d2, axis=1) <= 1e-6).all()
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1), rtol=1e-2, atol=1e-2)


def test_cosine_semantics_consistent_across_index_types(rng):
    # review finding: FlatIndex and IVFIndex "cosine" must agree in sign
    x = rng.standard_normal((100, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    df, _ = FlatIndex("cosine").add(x).search(q, 5)
    di, _ = IVFIndex(metric="cosine", nlist=4, nprobe=4).add(x).search(q, 5)
    # both descending similarity in [-1, 1]
    np.testing.assert_allclose(df, di, rtol=1e-3, atol=1e-3)
    assert (np.diff(df, axis=1) <= 1e-6).all() and (np.diff(di, axis=1) <= 1e-6).all()


def test_ivfpq_save_excludes_raw_vectors_by_default(corpus, tmp_path):
    x, q = corpus
    pq = IVFPQIndex(nlist=4, nprobe=4, m=8).add(x)
    p = tmp_path / "pq.npz"
    pq.save(p)
    z = np.load(p)
    assert "vectors" not in z.files  # the compressed-storage claim holds
    pq2 = IVFPQIndex.load(p)
    assert pq2.ntotal == x.shape[0]
    d1, i1 = pq.search(q, 5)
    d2, i2 = pq2.search(q, 5)
    np.testing.assert_array_equal(i1, i2)


def test_skewed_cells_split_into_bounded_buckets(rng):
    from image_search_engine_tpu.index.ivf import _build_buckets

    # 90% of rows in one cell: the padded-rectangle layout would size EVERY
    # list at the largest cell; buckets cap the width and split the hot cell
    codes = np.concatenate([np.zeros(900, np.int64),
                            rng.integers(1, 8, 100)]).astype(np.int64)
    lists, bucket_cell = _build_buckets(codes, 8)
    cap = lists.shape[1]
    assert cap <= int(np.ceil(1.3 * 1000 / 8)) + 8  # ~1.3x mean, not 900
    assert lists.shape[0] > 8  # the hot cell split into several buckets
    assert (bucket_cell == 0).sum() == -(-900 // cap)
    # every row lands in exactly one bucket of its own cell
    got = lists[lists >= 0]
    assert sorted(got.tolist()) == list(range(1000))
    owner = np.repeat(bucket_cell, cap)[(lists >= 0).ravel()]
    np.testing.assert_array_equal(owner, codes[got])

    # end-to-end recall on skewed-but-clusterable data (forced small cap)
    x = np.concatenate([
        rng.standard_normal((900, 16)).astype(np.float32) * 0.1,
        rng.standard_normal((100, 16)).astype(np.float32) + 8.0,
    ])
    ivf = IVFIndex(nlist=8, nprobe=4).add(x)
    q = x[rng.choice(1000, 32, replace=False)] + 0.01 * rng.standard_normal((32, 16)).astype(np.float32)
    flat = FlatIndex("l2").add(x)
    _, fi = flat.search(q, 5)
    _, ii = ivf.search(q, 5)
    assert recall_at_k(ii, fi) >= 0.9  # scaled nprobe covers the split cells


def test_ivf_bf16_table_matches_f32(rng):
    from image_search_engine_tpu.index.ivf import IVFIndex

    x = rng.standard_normal((600, 32)).astype(np.float32)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    d1, i1 = IVFIndex("l2", nlist=8, nprobe=8).add(x).search(q, 10)
    d2, i2 = IVFIndex("l2", nlist=8, nprobe=8, table_dtype="bf16").add(x).search(q, 10)
    # full probe (nprobe == nlist): exhaustive scan, so bf16 rounding is
    # the only difference — near-identical neighbor sets
    i1, i2 = np.asarray(i1), np.asarray(i2)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i1.tolist(), i2.tolist())])
    assert recall >= 0.9, recall
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1), rtol=2e-2, atol=2e-2)


def test_ivf_bf16_save_load_roundtrip(rng, tmp_path):
    from image_search_engine_tpu.index.ivf import IVFIndex

    x = rng.standard_normal((300, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    idx = IVFIndex("cosine", nlist=4, nprobe=4, table_dtype="bf16").add(x)
    p = tmp_path / "ivf_bf16.npz"
    idx.save(p)
    idx2 = IVFIndex.load(p)
    assert idx2.table_dtype == "bf16"
    d1, i1 = idx.search(q, 5)
    d2, i2 = idx2.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)


def test_ivf_incremental_add_keeps_centroids(corpus, rng):
    # faiss semantics: train once, add appends — a second add must not
    # retrain the coarse quantizer (round-1 retrained from scratch each
    # call, invalidating any PQ residual books)
    x, q = corpus
    ivf = IVFIndex(nlist=8, nprobe=8).add(x[:1500])
    c0 = ivf.centroids.copy()
    ivf.add(x[1500:])
    np.testing.assert_array_equal(ivf.centroids, c0)
    assert ivf.ntotal == len(x)
    flat = FlatIndex("l2").add(x)
    _, fi = flat.search(q, 10)
    _, ii = ivf.search(q, 10)
    assert recall_at_k(np.asarray(ii), fi) >= 0.95


def test_ivfpq_rerank_full_pool_matches_raw_ivf(corpus):
    # rerank over the ENTIRE probed pool == the raw-vector probed scan:
    # same probes, exact scoring over the store (the refine stage's
    # correctness oracle, mirroring faiss IndexRefineFlat semantics)
    x, q = corpus
    pq = IVFPQIndex(nlist=8, nprobe=4, m=8, seed=42).add(x)
    ivf = IVFIndex(nlist=8, nprobe=4, seed=42).add(x)
    pool = pq._effective_nprobe() * pq.lists.shape[1]
    d_rr, i_rr = pq.search(q, 10, rerank=pool)
    d_raw, i_raw = ivf.search(q, 10)
    np.testing.assert_array_equal(i_rr, i_raw)
    np.testing.assert_allclose(d_rr, d_raw, rtol=1e-3, atol=1e-3)


def test_ivfpq_rerank_improves_recall_and_is_exact(corpus):
    x, q = corpus
    pq = IVFPQIndex(nlist=8, nprobe=8, m=4).add(x)  # coarse PQ: lossy ranks
    flat = FlatIndex("l2").add(x)
    _, if_ = flat.search(q, 10)
    _, i_adc = pq.search(q, 10)
    d_rr, i_rr = pq.search(q, 10, rerank=100)
    assert recall_at_k(i_rr, if_) >= recall_at_k(i_adc, if_)
    assert recall_at_k(i_rr, if_) >= 0.95
    # returned distances are exact over the store, not ADC estimates
    d2 = ((q[:, None] - x[None]) ** 2).sum(-1)
    np.testing.assert_allclose(
        d_rr, np.take_along_axis(d2, i_rr, 1), rtol=1e-3, atol=1e-2)


def test_ivfpq_rerank_persists_and_codes_only_raises(corpus, tmp_path):
    x, q = corpus
    pq = IVFPQIndex(nlist=8, nprobe=4, m=8, rerank=64).add(x)
    p_raw = tmp_path / "pq_raw.npz"
    pq.save(p_raw, store_raw=True)
    pq2 = IVFPQIndex.load(p_raw)
    assert pq2.rerank == 64  # constructor default round-trips
    d1, i1 = pq.search(q, 5)  # uses self.rerank
    d2, i2 = pq2.search(q, 5)
    np.testing.assert_array_equal(i1, i2)

    p_codes = tmp_path / "pq_codes.npz"
    pq.save(p_codes)  # default: codes only
    pq3 = IVFPQIndex.load(p_codes)
    with pytest.raises(ValueError, match="raw vectors"):
        pq3.search(q, 5, rerank=32)
    pq3.search(q, 5, rerank=0)  # ADC-only still works


def test_ivfpq_batched_matches_adc(corpus):
    # the reconstruction-scan path scores the SAME quantity ADC does
    # (residual-PQ ADC distance == distance to the reconstruction), so
    # top-k sets should agree up to bf16 rounding of the reconstruction
    x, q = corpus
    pq = IVFPQIndex(nlist=8, nprobe=4, m=8).add(x)
    d_adc, i_adc = pq.search(q, 10)
    d_b, i_b = pq.search_batched(q, 10)
    overlap = np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                       for a, b in zip(i_adc, i_b)])
    assert overlap >= 0.9
    same = i_adc == i_b
    rel = np.abs(d_adc - d_b)[same] / np.maximum(d_adc[same], 1e-9)
    assert np.median(rel) < 0.02  # bf16 table rounding, not a scoring bug


def test_ivfpq_recon_cache_matches_and_invalidates(corpus):
    # recon_cache=True keeps the bf16 reconstruction table resident
    # between search_batched dispatches; results must be IDENTICAL to the
    # per-dispatch-decompress path, and add() must invalidate the cache.
    x, q = corpus
    pq = IVFPQIndex(nlist=8, nprobe=4, m=8, recon_cache=True).add(x)
    d1, i1 = pq.search_batched(q, 10)
    assert pq._recon_tab is not None  # cache populated
    d2, i2 = pq.search_batched(q, 10)  # served from cache
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)
    ref = IVFPQIndex(nlist=8, nprobe=4, m=8).add(x)
    d0, i0 = ref.search_batched(q, 10)
    np.testing.assert_array_equal(i1, i0)
    pq.add(x[:32])  # mutation -> cache dropped, rebuilt next dispatch
    assert pq._recon_tab is None
    pq.search_batched(q, 5)
    assert pq._recon_tab is not None


def test_ivfpq_batched_rerank_exact_over_store(corpus):
    x, q = corpus
    pq = IVFPQIndex(nlist=8, nprobe=4, m=8).add(x)
    d_r, i_r = pq.search_batched(q, 10, rerank=64)
    d2 = ((q[:, None] - x[None]) ** 2).sum(-1)
    np.testing.assert_allclose(
        d_r, np.take_along_axis(d2, i_r, 1), rtol=1e-3, atol=1e-2)
    _, i_adc = pq.search_batched(q, 10)
    flat = FlatIndex("l2").add(x)
    _, if_ = flat.search(q, 10)
    assert recall_at_k(i_r, if_) >= recall_at_k(i_adc, if_)
