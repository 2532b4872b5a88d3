"""Multimodal column plumbing (SURVEY.md §2.3): opaque binary payloads with
typed metadata, decoded/feature-extracted via Arrow-batched mapInPandas.

The PNG and JPEG paths are REAL decodes: payloads built as structurally
valid containers (PNG signature + IHDR with big-endian geometry + spec
CRC32s; JFIF SOI + APP0 + SOF0 frame header + EOI trailer) are parsed
byte-for-byte with stdlib struct/zlib — marker/signature checks, segment
lengths, big-endian width/height/precision/component reads, CRC
validation for PNG. The containers carry no pixel codecs, so work beyond
the header probe (entropy decode, audio/video) keeps the documented
deterministic STUB (a real deployment replaces that branch with
PIL/ffmpeg calls). Everything around it — the binary column, the schema,
the Arrow batch shape, the partition-parallel UDF execution — is real
and tested.

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
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("color_type", T.IntegerType()),
        T.StructField("decode_status", T.StringType()),
    ]
)


def _make_extract_batches():
    """Build the mapInPandas function as a self-contained closure.

    Spark executors don't have this repo on sys.path; a closure (unlike a
    module-level function) is cloudpickled BY VALUE, so the worker needs
    only stdlib+pandas.

    The PNG branch is a REAL decode: signature check, IHDR length/type
    check, big-endian width/height/bit-depth/color-type reads at the
    spec's fixed offsets, and a zlib.crc32 validation of the IHDR chunk
    — exactly what an image-dimension probe does before committing to a
    full pixel decode. Non-PNG payloads fall back to the documented
    deterministic stub (the container has no pixel codecs; a real
    deployment replaces that branch with PIL/ffmpeg)."""

    def extract_batches(iterator):
        import hashlib as _hashlib
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        _PNG_SIG = b"\x89PNG\r\n\x1a\n"

        def parse_png(p: bytes):
            # returns (width, height, bit_depth, color_type, status)
            # or None when the payload is not a PNG container.
            if len(p) < 33 or p[:8] != _PNG_SIG:
                return None
            (ihdr_len,) = _struct.unpack(">I", p[8:12])
            if ihdr_len != 13 or p[12:16] != b"IHDR":
                return None
            w, h = _struct.unpack(">II", p[16:24])
            bit_depth, color_type = p[24], p[25]
            (crc,) = _struct.unpack(">I", p[29:33])
            ok = (_zlib.crc32(p[12:29]) & 0xFFFFFFFF) == crc
            return (w, h, bit_depth, color_type, "png" if ok else "png_bad_crc")

        def parse_jpeg(p: bytes):
            # JFIF header probe at the container's fixed offsets: SOI,
            # APP0 (marker + declared length + 'JFIF\0' identifier),
            # SOF0 frame header (length, 8-bit precision, big-endian
            # height/width, component count), EOI trailer. Exactly what
            # an image-dimension probe reads before an entropy decode.
            if len(p) < 41 or p[0:2] != b"\xff\xd8" or p[-2:] != b"\xff\xd9":
                return None
            if p[2:4] != b"\xff\xe0":
                return None
            (app0_len,) = _struct.unpack(">H", p[4:6])
            if app0_len != 16 or p[6:11] != b"JFIF\x00":
                return None
            if p[20:22] != b"\xff\xc0":
                return None
            (sof_len,) = _struct.unpack(">H", p[22:24])
            precision = p[24]
            if sof_len != 17 or precision != 8:
                return None
            h, w = _struct.unpack(">HH", p[25:29])
            n_components = p[29]
            return (w, h, precision, n_components, "jpeg")

        def decode_stub(payload: bytes):
            # Deterministic fake of an image-dimension probe for payloads
            # in formats this container can't decode.
            h = _hashlib.md5(payload).digest()
            return (1 + h[0] % 1024, 1 + h[1] % 1024, None, None, "stubbed")

        for pdf in iterator:
            rows = [
                parse_png(p) or parse_jpeg(p) or decode_stub(p)
                for p in pdf["payload"]
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": _pd.array(
                        [r[0] for r in rows], dtype=_pd.Int32Dtype()
                    ),
                    "height": _pd.array(
                        [r[1] for r in rows], dtype=_pd.Int32Dtype()
                    ),
                    "bit_depth": _pd.array(
                        [r[2] for r in rows], dtype=_pd.Int32Dtype()
                    ),
                    "color_type": _pd.array(
                        [r[3] for r in rows], dtype=_pd.Int32Dtype()
                    ),
                    "decode_status": [r[4] for r in rows],
                }
            )

    return extract_batches


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column (UTF-8 bytes of text stand in for an
    image/audio blob; schema and plan shape are what matter)."""
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def _be4(col):
    """Integer → 4-byte big-endian binary, JVM-side (hex → lpad → unhex)."""
    return F.unhex(F.lpad(F.hex(col), 8, "0"))


def _chunk(ctype_hex: str, data):
    """Assemble a spec-valid PNG chunk (length + type + data + CRC32 of
    type||data) from built-in functions only — the whole container build
    stays in whole-stage codegen; no Python touches the bytes until the
    decode probe."""
    ctype = F.expr(f"X'{ctype_hex}'")
    body = F.concat(ctype, data)
    return F.concat(_be4(F.length(data)), body, _be4(F.crc32(body)))


def _be2(col):
    """Integer → 2-byte big-endian binary, JVM-side."""
    return F.unhex(F.lpad(F.hex(col), 4, "0"))


def with_image_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary column: doc_id % 3 == 0 carries a structurally
    valid PNG container (signature + IHDR with genuine big-endian
    geometry + real CRC32s + the text bytes as the IDAT payload),
    doc_id % 3 == 1 a structurally valid JFIF/JPEG (SOI + spec APP0 +
    SOF0 frame header with big-endian height/width + the text bytes as
    the entropy-data stand-in + EOI), and the rest the raw bytes
    (exercising the non-decodable fallback).

    Embedded geometry is content-derived so BOTH decodes verify
    end-to-end against an engine-independent oracle: width = 1 +
    n_bytes mod 1024, height = 1 + first md5(text) byte (fits the
    16-bit JPEG fields by construction). Built entirely from
    concat/unhex/crc32 — codegen'd, no UDF on the write side."""
    payload = F.encode("text", "UTF-8")
    w = F.lit(1) + F.length(payload) % 1024
    h = F.lit(1) + F.conv(F.substring(F.md5(F.col("text")), 1, 2), 16, 10).cast(
        "long"
    )
    ihdr_data = F.concat(
        _be4(w), _be4(h), F.expr("X'0806000000'")
    )  # bit depth 8, color type 6 (RGBA), default compression/filter/interlace
    png = F.concat(
        F.expr("X'89504E470D0A1A0A'"),
        _chunk("49484452", ihdr_data),  # IHDR
        _chunk("49444154", payload),  # IDAT (opaque stand-in bytes)
        F.expr("X'0000000049454E44AE426082'"),  # IEND (fixed CRC)
    )
    jpeg = F.concat(
        F.expr("X'FFD8'"),  # SOI
        # APP0, length 16: 'JFIF\0', version 1.1, aspect-ratio units,
        # density 1x1, no thumbnail
        F.expr("X'FFE000104A46494600010100000100010000'"),
        # SOF0, length 17: precision 8, height, width, 3 components
        # (YCbCr ids 1-3 with 4:2:0 sampling, quant tables 0/1/1)
        F.expr("X'FFC0001108'"),
        _be2(h),
        _be2(w),
        F.expr("X'03012200021101031101'"),
        payload,  # entropy-data stand-in (header probe never reads it)
        F.expr("X'FFD9'"),  # EOI
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, jpeg)
        .otherwise(payload)
        .alias("payload"),
    )


def decode_metadata(docs: DataFrame) -> DataFrame:
    """binary payload → typed metadata via Arrow-batched mapInPandas;
    PNG containers get a genuine header decode (see _make_extract_batches)."""
    return with_image_payload(docs).mapInPandas(
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
    """Aspect-preserving resize plan. Source geometry comes from the
    GENUINE container header probes (PNG IHDR / JFIF SOF0 — duplicated
    into this closure because mapInPandas functions must be
    self-contained for executor pickling, see _make_extract_batches);
    only the pixel resample/re-encode step is stubbed."""

    def resize_batches(iterator):
        import hashlib as _hashlib
        import struct as _struct

        import pandas as _pd

        _PNG_SIG = b"\x89PNG\r\n\x1a\n"

        def probe(p: bytes):
            # (src_w, src_h, status): real header reads for the two
            # container formats, md5 fake for undecodable payloads.
            if len(p) >= 33 and p[:8] == _PNG_SIG and p[12:16] == b"IHDR":
                w, h = _struct.unpack(">II", p[16:24])
                return w, h, "png"
            if (
                len(p) >= 41
                and p[0:2] == b"\xff\xd8"
                and p[20:22] == b"\xff\xc0"
                and p[-2:] == b"\xff\xd9"
            ):
                h, w = _struct.unpack(">HH", p[25:29])
                return w, h, "jpeg"
            d = _hashlib.md5(p).digest()
            return 1 + d[0] % 1024, 1 + d[1] % 1024, "stubbed"

        for pdf in iterator:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, status = probe(p)
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
                        status,
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
    PNG/JPEG source geometry is a real header decode (with_image_payload
    containers); pixel work is stubbed."""
    return with_image_payload(docs).mapInPandas(
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
