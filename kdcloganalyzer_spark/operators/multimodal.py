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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("dst_width", T.IntegerType()),
        T.StructField("dst_height", T.IntegerType()),
        T.StructField("resize_status", T.StringType()),
    ]
)


def _make_resize_batches(max_side: int):
    """Aspect-preserving resize plan, decode/encode stubbed (see
    _make_extract_batches for the closure-pickling rationale)."""

    def resize_batches(iterator):
        import hashlib as _hashlib

        import pandas as _pd

        def probe(payload: bytes) -> tuple[int, int]:
            h = _hashlib.md5(payload).digest()
            return 1 + h[0] % 1024, 1 + h[1] % 1024

        for pdf in iterator:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h = probe(p)
                scale = min(1.0, max_side / max(w, h))
                # Real implementation: PIL resize + re-encode of the blob;
                # raise NotImplementedError there for a genuine decode.
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        max(1, int(w * scale)),
                        max(1, int(h * scale)),
                        "stubbed",
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "src_width",
                    "src_height",
                    "dst_width",
                    "dst_height",
                    "resize_status",
                ],
            )

    return resize_batches


def resize_images(docs: DataFrame, max_side: int = 256) -> DataFrame:
    """Image-resize plumbing: binary payload in, per-image geometry out.
    The Arrow batch shape and schema are real; pixel work is stubbed."""
    return with_binary_payload(docs).mapInPandas(
        _make_resize_batches(max_side), schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def _make_frame_sample_batches(frame_size: int, every_n: int):
    """Fixed-stride frame sampling over an opaque byte stream (a stand-in
    for video GOP sampling): emits every n-th frame_size-byte chunk.
    One input row fans out to many output rows — the mapInPandas
    contract's 1:N shape, which a row-wise UDF cannot express."""

    def frame_batches(iterator):
        import pandas as _pd

        for pdf in iterator:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(p) // frame_size)
                for i, f in enumerate(range(0, n_frames, every_n)):
                    off = f * frame_size
                    rows.append(
                        (int(doc_id), i, off, bytes(p[off : off + frame_size]))
                    )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "byte_offset", "frame_bytes"],
            )

    return frame_batches


def sample_frames(
    docs: DataFrame, frame_size: int = 64, every_n: int = 4
) -> DataFrame:
    """Video-frame-sampling plumbing: 1:N row fan-out through Arrow
    batches; decode of the sampled chunk is the stubbed step."""
    return with_binary_payload(docs).mapInPandas(
        _make_frame_sample_batches(frame_size, every_n), schema=FRAMES_SCHEMA
    )
