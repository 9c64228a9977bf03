from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.errors import PythonException

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


@pytest.mark.parametrize("op", [frame_sample, resize])
def test_stub_decoders_raise(spark, op):
    df = op(spark, SF_DIR)
    # plan builds (schema is real); execution hits the stub
    assert df.columns[0] == "media_id"
    with pytest.raises((PythonException, Py4JJavaError)):
        df.limit(1).collect()
