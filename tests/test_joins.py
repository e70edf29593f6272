import pandas as pd
import pyarrow as pa

from pdf_to_text_ray.stages.joins import asof_join, bucketed_hash_join


def test_bucketed_hash_join_matches_pandas(ray_session):
    import ray.data as rd

    left = pa.table({"k": [1, 2, 2, 3, 5], "lv": [10, 20, 21, 30, 50]})
    right = pa.table({"k": [2, 3, 3, 4], "rv": ["a", "b", "c", "d"]})
    out = (
        bucketed_hash_join(rd.from_arrow(left), rd.from_arrow(right), on="k",
                           num_buckets=4)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    expect = (
        left.to_pandas().merge(right.to_pandas(), on="k")
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["k", "lv", "rv"]].astype({"k": "int64", "lv": "int64"}), expect)


def test_asof_join_backward(ray_session):
    import ray.data as rd

    left = pa.table({
        "k": [1, 1, 2],
        "lts": pa.array([100, 200, 150], pa.int64()),
        "lid": [10, 11, 20],
    })
    right = pa.table({
        "k": [1, 1, 2, 2],
        "rts": pa.array([90, 150, 150, 160], pa.int64()),
        "val": [7, 8, 9, 12],
    })
    out = (
        asof_join(rd.from_arrow(left), rd.from_arrow(right), key="k",
                  left_ts="lts", right_ts="rts", value_cols=["val"],
                  num_buckets=2)
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    # lid 10 (ts100) -> val 7 (ts90); lid 11 (ts200) -> val 8 (ts150);
    # lid 20 (ts150) -> val 9 (exact match allowed)
    assert out["val"].tolist() == [7, 8, 9]
