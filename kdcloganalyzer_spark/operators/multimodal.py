"""Multimodal column plumbing (SURVEY.md §2.3): opaque binary payloads with
typed metadata, decoded/feature-extracted via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode step is STUBBED
(deterministic metadata derived from the payload bytes; a real deployment
replaces ``_decode_stub`` with PIL/ffmpeg calls). Everything around the
stub — the binary column, the schema, the Arrow batch shape, the
partition-parallel UDF execution — is real and tested.

At 100 TB: payloads stay in executor-local Arrow batches; only extracted
metadata (a few ints per blob) crosses into the query plan. Batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("decode_status", T.StringType()),
    ]
)


def _make_extract_batches():
    """Build the mapInPandas function as a self-contained closure.

    Spark executors don't have this repo on sys.path; a closure (unlike a
    module-level function) is cloudpickled BY VALUE, so the worker needs
    only stdlib+pandas.
    """

    def extract_batches(iterator):
        import hashlib as _hashlib

        import pandas as _pd

        def decode_stub(payload: bytes) -> tuple[int, int]:
            # Deterministic fake of an image-dimension probe. A real
            # deployment replaces this with PIL.Image.open(io.BytesIO(p))
            # (raise NotImplementedError there if genuine decode is needed).
            h = _hashlib.md5(payload).digest()
            return 1 + h[0] % 1024, 1 + h[1] % 1024

        for pdf in iterator:
            dims = [decode_stub(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                    "decode_status": "stubbed",
                }
            )

    return extract_batches


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column (UTF-8 bytes of text stand in for an
    image/audio blob; schema and plan shape are what matter)."""
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def decode_metadata(docs: DataFrame) -> DataFrame:
    """binary payload → typed metadata via Arrow-batched mapInPandas."""
    return with_binary_payload(docs).mapInPandas(
        _make_extract_batches(), schema=DECODED_SCHEMA
    )
