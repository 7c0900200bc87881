"""Incremental ingest (append_batch) + multimodal plumbing tests."""

import numpy as np
import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.oracle import OracleEngine
from pysearchlite_spark.streaming.ingest import append_batch


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_append_batches_match_full_oracle(spark, tmp_path):
    d = str(tmp_path / "idx")
    b1 = [(f"a{i:03d}", f"alpha beta t{i % 7}") for i in range(60)]
    b2 = [(f"b{i:03d}", f"beta gamma t{i % 5}") for i in range(50)]
    b3 = [(f"c{i:03d}", f"alpha gamma delta t{i % 3}") for i in range(40)]

    sid1 = append_batch(spark, _df(spark, b1), d, segment_docs=32, batch_id=0)
    assert sid1 == 1
    sid2 = append_batch(spark, _df(spark, b2), d, segment_docs=32, batch_id=1)
    sid3 = append_batch(spark, _df(spark, b3), d, segment_docs=32, batch_id=2)
    assert (sid2, sid3) == (2, 3)

    # idempotent replay of an already-ingested batch id
    sid_again = append_batch(spark, _df(spark, b2), d, segment_docs=32,
                             batch_id=1)
    assert sid_again == 3

    idx = SearchIndex(spark, d)
    # oracle over batches in the same order, each batch url-sorted, docIDs
    # continuing on segment boundaries — replicate by indexing in batch/url
    # order and checking SET-level results (ids differ by the segment gaps,
    # so compare via names)
    from pysearchlite_spark.plans.builder import doc_sort_key
    oracle = OracleEngine()
    names = []
    for batch in (b1, b2, b3):
        for url, text in sorted(batch, key=lambda x: doc_sort_key(x[0])):
            oracle.index(url, text)
            names.append(url)

    for q in ["alpha", "beta gamma", "alpha delta", "t1", "nope"]:
        assert idx.search(q) == oracle.search(q), q
        assert idx.count(q) == oracle.count(q), q

    # BM25 over the merged corpus: compare by NAME since ids differ
    for q in ["alpha beta", "gamma t1"]:
        got = idx.topk(q, k=10)
        rows = {r["doc_id"]: r["url"] for r in idx._docmap.collect()}
        got_named = [(rows[d], round(s, 9)) for d, s in got]
        want_named = [(oracle.doc_names[d], round(s, 9))
                      for d, s in oracle.topk(q, k=10)]
        assert [n for n, _ in got_named] == [n for n, _ in want_named], q
        np.testing.assert_allclose([s for _, s in got_named],
                                   [s for _, s in want_named], rtol=1e-9)


def test_append_after_compaction_no_seg_collision(spark, tmp_path):
    """Regression: compaction allocates posting seg ids from the catalog's
    global max; the NEXT append must not reuse the compacted segment's id
    (it previously derived its id from doc_segments only, appending into
    the committed postings/seg=<id> dir and overwriting its pack_avgdl —
    silently corrupting counts and block-max safety)."""
    from pysearchlite_spark.plans.compaction import compact_segments

    d = str(tmp_path / "idx")
    append_batch(spark, _df(spark, [(f"a{i}", f"x y t{i % 3}")
                                    for i in range(40)]), d,
                 segment_docs=16, batch_id=0)
    append_batch(spark, _df(spark, [(f"b{i}", f"y z t{i % 4}")
                                    for i in range(40)]), d,
                 segment_docs=16, batch_id=1)
    compact_segments(spark, d)
    mid = SearchIndex(spark, d)
    compacted = set(mid.snapshot["posting_segments"])

    append_batch(spark, _df(spark, [(f"c{i}", f"z w t{i % 5}")
                                    for i in range(40)]), d,
                 segment_docs=16, batch_id=2)
    idx = SearchIndex(spark, d)
    new_post = set(idx.snapshot["posting_segments"]) - compacted
    assert new_post and not (new_post & compacted)
    # counts across all three batches are exact
    assert idx.count("y") == 80
    assert idx.count("z") == 80
    assert idx.count("w") == 40
    assert idx.count("x z") == 0
    # every posting segment kept its own pack_avgdl entry
    assert set(idx.pack_avgdl) == set(idx.snapshot["posting_segments"])
    for q in ["y", "z w", "t1"]:
        assert idx.topk(q, k=10, use_blockmax=True) == \
            idx.topk(q, k=10, use_blockmax=False), q


def test_append_ignores_mismatched_segment_docs(spark, tmp_path):
    """The committed snapshot pins segment_docs — a caller passing a
    different value must not mint colliding doc ids."""
    d = str(tmp_path / "idx")
    append_batch(spark, _df(spark, [(f"a{i}", f"x t{i % 3}")
                                    for i in range(40)]), d,
                 segment_docs=16, batch_id=0)
    append_batch(spark, _df(spark, [(f"b{i}", f"y t{i % 3}")
                                    for i in range(40)]), d,
                 segment_docs=4096, batch_id=1)  # mismatched → ignored
    idx = SearchIndex(spark, d)
    ids = [r["doc_id"] for r in idx._docmap.select("doc_id").collect()]
    assert len(ids) == len(set(ids)) == 80  # no doc_id collisions
    assert idx.count("x") == 40 and idx.count("y") == 40


def test_blockmax_safe_after_avgdl_drift(spark, tmp_path):
    """Regression: block-max max_partial bounds are exact only at pack-time
    avgdl. Appending much longer docs raises the global avgdl, so true
    partials on OLD segments can exceed their baked bounds — pruned top-k
    silently dropped true winners. Bounds are now scaled by the
    current/pack avgdl ratio per segment (snapshot stats pack_avgdl)."""
    import numpy as np

    d = str(tmp_path / "idx")
    # batch 1: short docs (avgdl ~4); enough docs for multiple skip blocks
    b1 = [(f"a{i:05d}", f"alpha w{i % 997} x{i % 89} y{i % 7}")
          for i in range(2000)]
    append_batch(spark, _df(spark, b1), d, segment_docs=1 << 20, batch_id=0)
    # batch 2: few very LONG docs → avgdl jumps
    b2 = [(f"b{i}", "beta " + " ".join(f"pad{j}" for j in range(400)))
          for i in range(30)]
    append_batch(spark, _df(spark, b2), d, segment_docs=1 << 20, batch_id=1)

    idx = SearchIndex(spark, d)
    assert idx._bound_scale(0) > 1.0  # old segment's bounds must inflate
    for q in ["alpha w3", "alpha y1 w5", "alpha", "y2 x4"]:
        for k in (5, 10, 50):
            pruned = idx.topk(q, k=k, use_blockmax=True)
            exact = idx.topk(q, k=k, use_blockmax=False)
            assert [x[0] for x in pruned] == [x[0] for x in exact], (q, k)
            np.testing.assert_allclose([s for _, s in pruned],
                                       [s for _, s in exact], rtol=1e-9)


def test_ingest_then_compact(spark, tmp_path):
    from pysearchlite_spark.plans.compaction import compact_segments
    d = str(tmp_path / "idx")
    append_batch(spark, _df(spark, [(f"a{i}", f"x y t{i % 3}")
                                    for i in range(30)]), d,
                 segment_docs=16, batch_id=0)
    append_batch(spark, _df(spark, [(f"b{i}", f"y z t{i % 4}")
                                    for i in range(30)]), d,
                 segment_docs=16, batch_id=1)
    idx = SearchIndex(spark, d)
    before = {q: (idx.search_and_ids(q).tolist(), idx.topk(q, k=5))
              for q in ["y", "x z", "t1 y"]}
    compact_segments(spark, d)
    idx2 = SearchIndex(spark, d)
    assert len(idx2.snapshot["posting_segments"]) == 1
    for q, want in before.items():
        assert (idx2.search_and_ids(q).tolist(), idx2.topk(q, k=5)) == want


def test_multimodal_image_audio_video(spark):
    """Spec'd container decode + feature extraction (real pixel/sample math,
    no stubs): PSL1 images, PSLA audio, PSLV video frames."""
    from pysearchlite_spark.functions.multimodal import (
        audio_features, decode_image, encode_audio, encode_image,
        encode_video, frame_sample, image_feature_vec, image_features,
        media_stats)

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (16 + i % 5, 20, 3), dtype=np.uint8)
            for i in range(20)]
    rows = [(i, encode_image(a)) for i, a in enumerate(imgs)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")

    feats = {r["doc_id"]: r for r in image_features(df).collect()}
    assert len(feats) == 20
    for i, a in enumerate(imgs):
        r = feats[i]
        assert (r["meta"]["width"], r["meta"]["height"],
                r["meta"]["channels"]) == (20, a.shape[0], 3)
        # feature equals the spec'd kernel applied directly to the pixels
        np.testing.assert_allclose(r["feature"], image_feature_vec(a),
                                   rtol=1e-6)
        assert abs(r["feature"][0] - a[:, :, 0].mean() / 255.0) < 1e-6
    # roundtrip decode parity
    meta, px = decode_image(encode_image(imgs[0]))
    assert np.array_equal(px, imgs[0])

    # grayscale broadcasts to 3 channels
    g = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    gdf = spark.createDataFrame([(0, encode_image(g))],
                                "doc_id long, media binary")
    gr = image_features(gdf).collect()[0]
    assert len(gr["feature"]) == 64 and gr["meta"]["channels"] == 1

    # audio: 1s of a 440-ish square wave at 8kHz
    wave = (np.sign(np.sin(np.arange(8000) * 0.3)) * 16384).astype(np.int16)
    adf = spark.createDataFrame([(7, encode_audio(wave, 8000))],
                                "doc_id long, media binary")
    ar = audio_features(adf).collect()[0]
    assert ar["sample_rate"] == 8000
    assert abs(ar["duration_sec"] - 1.0) < 1e-9
    assert len(ar["feature"]) == 64
    assert abs(ar["feature"][1] - 0.5) < 0.01  # rms of +-0.5 square wave

    # video: 10 frames, sample every 3rd -> frames 0,3,6,9
    vid = encode_video([rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
                        for _ in range(10)])
    vdf = spark.createDataFrame([(3, vid)], "doc_id long, media binary")
    frames = frame_sample(vdf, every_n=3).collect()
    assert sorted(r["frame_no"] for r in frames) == [0, 3, 6, 9]
    # each sampled frame is itself a decodable PSL1 image
    for r in frames:
        _, fpx = decode_image(bytes(r["frame"]))
        assert fpx.shape == (4, 4, 3)

    stats = {r["doc_id"]: r for r in media_stats(df).collect()}
    assert stats[0]["n_bytes"] == len(rows[0][1])
    assert len(stats[0]["sha256"]) == 64

    # non-PSL1 bytes without Pillow raise the documented error
    bad = spark.createDataFrame([(0, b"\xff\xd8JPEGISH")],
                                "doc_id long, media binary")
    try:
        from PIL import Image  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(Exception) as ei:
            image_features(bad).collect()
        assert "Pillow" in str(ei.value) or "PSL1" in str(ei.value)


def test_degenerate_psl1_dims_raise_cleanly():
    """A corrupt/adversarial PSL1 header with a zero dimension must raise
    the documented ValueError at decode time — not an IndexError (c=0) or
    silent NaN feature vectors (w=0/h=0) deep inside a Spark stage."""
    import struct

    import pytest as _pytest

    from pysearchlite_spark.functions.multimodal import (decode_image,
                                                         image_feature_vec)
    for w, h, c in [(4, 4, 0), (0, 4, 1), (4, 0, 3)]:
        blob = b"PSL1" + struct.pack("<HHB", w, h, c) + b"\x00" * (w * h * c)
        with _pytest.raises(ValueError, match="degenerate"):
            decode_image(bytes(blob))
    # sane minimum still decodes and featurizes finitely
    blob = b"PSL1" + struct.pack("<HHB", 1, 1, 1) + b"\x7f"
    meta, px = decode_image(bytes(blob))
    import numpy as np
    assert np.isfinite(image_feature_vec(px)).all()


def test_media_quarantine_mode(spark):
    """on_error='quarantine': one corrupt blob must not kill the job —
    the bad row comes back with NULL outputs + decode_error, good rows
    are bit-identical to default mode. Default mode still raises (curated
    fixtures want loud failure)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from pysearchlite_spark.functions.multimodal import (audio_features,
                                                         encode_audio,
                                                         encode_image,
                                                         encode_video,
                                                         frame_sample,
                                                         image_features)

    good_img = encode_image(np.full((4, 4, 3), 128, dtype=np.uint8))
    bad_img = b"PSL1" + struct.pack("<HHB", 0, 4, 3)  # degenerate dims
    df = spark.createDataFrame(
        [(1, bytearray(good_img)), (2, bytearray(bad_img))],
        "doc_id long, media binary")

    with _pytest.raises(Exception):
        image_features(df).collect()  # default stays loud
    rows = {r["doc_id"]: r for r in
            image_features(df, on_error="quarantine").collect()}
    assert rows[1]["decode_error"] is None
    assert rows[1]["meta"]["width"] == 4 and len(rows[1]["feature"]) == 64
    assert rows[2]["meta"] is None and rows[2]["feature"] is None
    assert "degenerate" in rows[2]["decode_error"]

    good_aud = encode_audio(
        (np.sin(np.linspace(0, 20, 800)) * 3000).astype(np.int16), 8000)
    adf = spark.createDataFrame(
        [(1, bytearray(good_aud)), (2, bytearray(b"JUNKxxxx"))],
        "doc_id long, media binary")
    with _pytest.raises(Exception):
        audio_features(adf).collect()
    arows = {r["doc_id"]: r for r in
             audio_features(adf, on_error="quarantine").collect()}
    assert arows[1]["decode_error"] is None
    assert arows[1]["sample_rate"] == 8000
    assert arows[2]["sample_rate"] is None and arows[2]["feature"] is None
    assert "PSLA" in arows[2]["decode_error"]

    frames = [np.full((2, 2, 1), i, dtype=np.uint8) for i in range(4)]
    vdf = spark.createDataFrame(
        [(1, bytearray(encode_video(frames))), (2, bytearray(b"NOPE"))],
        "doc_id long, media binary")
    with _pytest.raises(Exception):
        frame_sample(vdf, every_n=2).collect()
    vrows = frame_sample(vdf, every_n=2,
                         on_error="quarantine").collect()
    good = [r for r in vrows if r["doc_id"] == 1]
    bad = [r for r in vrows if r["doc_id"] == 2]
    assert sorted(r["frame_no"] for r in good) == [0, 2]
    assert all(r["decode_error"] is None for r in good)
    assert len(bad) == 1 and bad[0]["frame_no"] is None
    assert "PSLV" in bad[0]["decode_error"]

    with _pytest.raises(ValueError, match="on_error"):
        image_features(df, on_error="skip")
