"""Driver-contract lock for the multimodal entries: run the
__spark_entry__ image_features / audio_features queries at sf0.001 and
compare row-for-row against their DuckDB oracle_sql — the same gate the
driver applies (rows + columns + order-insensitive values)."""

import os

import duckdb
import numpy as np
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/documents.parquet"),
    reason="driver testdata not present")


def _oracle(sql: str):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    return con.sql(sql).df()


@pytest.mark.parametrize("key", ["image_features", "audio_features",
                                 "video_features"])
def test_multimodal_entry_matches_oracle(spark, key):
    got = E.queries()[key](spark, SF).toPandas()
    want = _oracle(E.oracle_sql()[key])
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want) > 0

    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(np.asarray(gv).dtype, np.floating):
            assert np.allclose(gv.astype(float), wv.astype(float),
                               rtol=0, atol=1e-12), c
        else:
            assert (gv.astype(str) == wv.astype(str)).all(), c


def test_image_entry_features_nontrivial(spark):
    got = E.queries()["image_features"](spark, SF).toPandas()
    # 64 dims per doc; histogram fractions per doc sum to 1
    per_doc = got.groupby("doc_id")["dim"].count()
    assert (per_doc == 64).all()
    hist_sum = got[got["dim"] >= 6].groupby("doc_id")["val"].sum()
    assert np.allclose(hist_sum.to_numpy(), 1.0, atol=1e-4)


def test_video_entry_samples_expected_frames(spark):
    got = E.queries()["video_features"](spark, SF).toPandas()
    # every_n=2 over 4 frames keeps frames {0, 2}; 64 dims per frame
    assert sorted(got["frame_no"].unique().tolist()) == [0, 2]
    per = got.groupby(["doc_id", "frame_no"])["dim"].count()
    assert (per == 64).all()
    hist_sum = (got[got["dim"] >= 6]
                .groupby(["doc_id", "frame_no"])["val"].sum())
    assert np.allclose(hist_sum.to_numpy(), 1.0, atol=1e-4)
