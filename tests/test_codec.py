"""Codec roundtrip + block-structure tests (property style, mirrors the
reference's randomized skip-list tests, test_block_skip_list.py:89-106)."""

import numpy as np
import pytest

from pysearchlite_spark import codec


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 1000, 5000])
def test_varbyte_roundtrip(seed, n):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2**40, size=n).astype(np.uint64)
    enc = codec.varbyte_encode(vals)
    dec = codec.varbyte_decode(enc)
    assert np.array_equal(dec, vals)


def test_varbyte_boundaries():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1],
                    dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(vals)), vals)
    # single-byte values encode to one byte each
    assert len(codec.varbyte_encode(np.array([0, 1, 127], dtype=np.uint64))) == 3


def test_varbyte_decode_count_limit():
    vals = np.arange(100, dtype=np.uint64) * 1000
    enc = codec.varbyte_encode(vals)
    assert np.array_equal(codec.varbyte_decode(enc, count=10), vals[:10])


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 300, 4096, 10000])
def test_pack_roundtrip(seed, n):
    rng = np.random.default_rng(seed + 100)
    doc_ids = np.sort(rng.choice(np.arange(4 * n, dtype=np.int64), size=n,
                                 replace=False))
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(1, 500, size=n).astype(np.int64)
    avgdl = float(dls.mean())
    p = codec.pack_postings(doc_ids, tfs, dls, avgdl)
    assert p.df == n
    assert np.array_equal(codec.unpack_docs(p.docs, p.df), doc_ids)
    assert np.array_equal(codec.unpack_stream(p.tfs, p.df).astype(np.int64), tfs)
    assert np.array_equal(codec.unpack_stream(p.dls, p.df).astype(np.int64), dls)
    nblocks = (n + codec.BLOCK_DOCS - 1) // codec.BLOCK_DOCS
    assert p.first_docs.shape == (nblocks,)
    assert np.array_equal(p.first_docs,
                          doc_ids[::codec.BLOCK_DOCS][:nblocks])
    # block-max is the exact max of per-posting partials within each block
    partial = codec.bm25_partial(tfs, dls, avgdl)
    for b in range(nblocks):
        s, e = b * codec.BLOCK_DOCS, min(n, (b + 1) * codec.BLOCK_DOCS)
        assert p.max_partial[b] == pytest.approx(partial[s:e].max())
        got = codec.unpack_block_docs(p, b)
        assert np.array_equal(got, doc_ids[s:e])
        assert np.array_equal(
            codec.unpack_block_stream(p.tfs, p.tf_offs, p.df, b).astype(np.int64),
            tfs[s:e])


@pytest.mark.parametrize("seed", range(3))
def test_pack_rows_equals_pack_postings(seed):
    rng = np.random.default_rng(seed + 500)
    rows = []
    for _ in range(40):
        n = int(rng.integers(1, 400))
        ids = np.sort(rng.choice(np.arange(5000, dtype=np.int64), size=n,
                                 replace=False))
        rows.append((ids, rng.integers(1, 30, n).astype(np.int64),
                     rng.integers(1, 300, n).astype(np.int64)))
    avgdl = 100.0
    batch = codec.pack_rows([r[0] for r in rows], [r[1] for r in rows],
                            [r[2] for r in rows], avgdl)
    for (ids, tfs, dls), got in zip(rows, batch):
        want = codec.pack_postings(ids, tfs, dls, avgdl)
        assert got.df == want.df
        assert got.docs == want.docs
        assert got.tfs == want.tfs
        assert got.dls == want.dls
        assert np.array_equal(got.first_docs, want.first_docs)
        assert np.array_equal(got.doc_offs, want.doc_offs)
        assert np.array_equal(got.tf_offs, want.tf_offs)
        assert np.array_equal(got.dl_offs, want.dl_offs)
        assert np.allclose(got.max_partial, want.max_partial)


def test_term_bucket_matches_spark_crc32():
    # build side computes tb with JVM crc32; query side with zlib.crc32 —
    # parity asserted here on the raw zlib values (JVM parity verified in
    # test_engine_e2e via end-to-end query results)
    import zlib
    from pysearchlite_spark.plans.builder import term_bucket
    for t in ["the", "key", "a" * 300, "ünïcode", "漢字", ""]:
        assert term_bucket(t, 16) == zlib.crc32(t.encode("utf-8")) % 16


def test_tombstone_keep_mask_edge_cases():
    docs = np.array([1, 5, 9], dtype=np.int64)
    # empty deleted array: everything kept (no IndexError on deleted[-1])
    keep = codec.tombstone_keep_mask(docs, np.empty(0, dtype=np.int64))
    assert keep.dtype == bool and keep.all()
    # ids above deleted[-1] clip to the last slot without a false hit
    keep = codec.tombstone_keep_mask(docs, np.array([5], dtype=np.int64))
    assert keep.tolist() == [True, False, True]
    # empty docs against non-empty deleted
    keep = codec.tombstone_keep_mask(np.empty(0, dtype=np.int64),
                                     np.array([5], dtype=np.int64))
    assert keep.shape == (0,)


@pytest.mark.parametrize("seed", range(3))
def test_unpack_docs_batch_matches_per_row(seed):
    rng = np.random.default_rng(seed + 900)
    payloads, dfs, expect = [], [], []
    for _ in range(60):
        n = int(rng.integers(0, 500))  # includes df=0 and multi-block rows
        if n == 0:
            payloads.append(b"")
            dfs.append(0)
            continue
        ids = np.sort(rng.choice(np.arange(20000, dtype=np.int64), size=n,
                                 replace=False))
        tfs = np.ones(n, dtype=np.int64)
        p = codec.pack_postings(ids, tfs, tfs, 1.0)
        payloads.append(p.docs)
        dfs.append(n)
        expect.append(ids)
    flat, offs = codec.unpack_docs_batch(payloads, np.asarray(dfs))
    assert offs.tolist() == np.concatenate(
        ([0], np.cumsum(dfs))).tolist()
    got = [flat[offs[i]:offs[i + 1]] for i in range(len(dfs)) if dfs[i]]
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert np.array_equal(g, e)


def test_unpack_docs_batch_empty():
    flat, offs = codec.unpack_docs_batch([], np.empty(0, dtype=np.int64))
    assert flat.size == 0 and offs.tolist() == [0]
