from __future__ import annotations

from icechunk_spark.operators.multimodal import frame_sample, media_table, resize

from .conftest import SF_DIR


def test_media_table_schema(spark):
    df = media_table(spark, SF_DIR)
    dtypes = dict(df.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["media_type"] == "string"
    assert dtypes["meta"].startswith("struct<n_bytes:bigint")
    types = {r["media_type"] for r in df.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_frame_sample_real_values(spark):
    """Frame slicing is real math over the RAW stream: every-2nd
    32-byte frame, verified against a plain-Python reference."""
    import hashlib

    from icechunk_spark.operators.multimodal import FRAME_BYTES, FRAME_EVERY_N

    media = {
        r["media_id"]: bytes(r["payload"])
        for r in media_table(spark, SF_DIR)
        .filter("media_type = 'video'")
        .limit(5)
        .collect()
    }
    got = [
        r
        for r in frame_sample(spark, SF_DIR).collect()
        if r["media_id"] in media
    ]
    expect = {}
    for mid, raw in media.items():
        for k in range(0, len(raw) // FRAME_BYTES, FRAME_EVERY_N):
            expect[(mid, k)] = hashlib.md5(
                raw[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
            ).hexdigest()
    assert {(r["media_id"], r["frame_idx"]): r["frame_md5"] for r in got} == expect


def test_resize_real_values(spark):
    """Nearest-neighbor resampling verified against a plain-Python
    gather on the same RAW8 layout."""
    import hashlib

    import numpy as np

    from icechunk_spark.operators.multimodal import IMG_W, RESIZE_TO

    media = {
        r["media_id"]: bytes(r["payload"])
        for r in media_table(spark, SF_DIR)
        .filter("media_type = 'image'")
        .limit(5)
        .collect()
    }
    got = {r["media_id"]: r for r in resize(spark, SF_DIR).collect() if r["media_id"] in media}
    for mid, raw in media.items():
        arr = np.frombuffer(raw, dtype=np.uint8)
        h = len(arr) // IMG_W
        img = arr[: h * IMG_W].reshape(h, IMG_W)
        rr = (np.arange(RESIZE_TO) * h) // RESIZE_TO
        cc = (np.arange(RESIZE_TO) * IMG_W) // RESIZE_TO
        small = img[np.ix_(rr, cc)]
        assert got[mid]["resized_md5"] == hashlib.md5(small.tobytes()).hexdigest()
        assert got[mid]["sum_pixels"] == int(small.sum())
