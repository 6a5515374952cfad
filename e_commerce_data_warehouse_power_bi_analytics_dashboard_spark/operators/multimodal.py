"""Multimodal column operators: image/audio/video as opaque ``binary``
payloads with typed metadata (beyond-reference extension per
BASELINE.json's north star — the reference, a PostgreSQL/Power BI DW,
has no binary columns at all).

Design for 100 TB:
  - payloads are opaque ``BinaryType`` cells; all per-byte work runs in
    Arrow-batched ``mapInPandas`` (one Python worker per partition, no
    per-row pickling, no driver collect);
  - metadata lives in a typed struct column so filters on
    mime/width/height are plain Catalyst predicates (pushed to the scan,
    never touching the payload bytes — column pruning drops the blob);
  - decode/resize steps that need codec libraries (PIL/ffmpeg — not in
    this container) are STUBS behind an import-gate raising
    ``NotImplementedError``; everything around them (schema, batch
    iteration, frame-slicing arithmetic, hashing) is real and tested.

The test corpus has no real media files, so ``attach_payload`` fabricates
a deterministic payload (UTF-8 document bytes) + metadata from the
``documents`` table; at production scale the same schema would come from
``spark.read.format("binaryFile")`` or parquet with a binary column.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: typed metadata carried next to every payload
METADATA_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MIMES = ("image/png", "audio/wav", "video/mp4")


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct).

    Payload = UTF-8 bytes of the text (a deterministic stand-in for real
    media bytes); metadata derived arithmetically from doc_id/n_chars so
    a SQL oracle can replicate it exactly.
    """
    mime = F.element_at(F.array(*[F.lit(m) for m in MIMES]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            mime.alias("mime"),
            (64 + (F.col("doc_id") % 16) * 32).cast("int").alias("width"),
            (64 + (F.col("doc_id") % 9) * 32).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# feature extraction — Arrow-batched mapInPandas over the payload bytes
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("magic", T.StringType()),
        T.StructField("byte_entropy", T.DoubleType()),
    ]
)


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Per-payload content features (length, digest, magic bytes, byte
    entropy) via ``mapInPandas`` — the canonical shape for any real
    decode/featurize step: Arrow batches in, Arrow batches out, payload
    column pruned from the output."""

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                counts: dict[int, int] = {}
                for byte in b:
                    counts[byte] = counts.get(byte, 0) + 1
                n = len(b)
                entropy = (
                    -sum((c / n) * math.log2(c / n) for c in counts.values()) if n else 0.0
                )
                rows.append(
                    (
                        int(doc_id),
                        n,
                        hashlib.sha256(b).hexdigest(),
                        b[:4].hex(),
                        entropy,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return with_payload.select("doc_id", "payload").mapInPandas(featurize, FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# frame sampling — fixed-size virtual frames, every k-th kept
# ---------------------------------------------------------------------------

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_frames(with_payload: DataFrame, frame_size: int = 256, every: int = 4) -> DataFrame:
    """Slice each payload into fixed-size frames and keep every ``every``-th
    (frame-sampling a video without a codec: the slicing/batching is the
    real plumbing; a production build swaps byte-slices for decoded
    frames). One output row per sampled frame — a mapInPandas that
    *expands* rows, exercising the 1→N batch shape."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for idx in range(0, n_frames, every):
                    frame = b[idx * frame_size : (idx + 1) * frame_size]
                    rows.append(
                        (int(doc_id), idx, len(frame), hashlib.sha256(frame).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return with_payload.select("doc_id", "payload").mapInPandas(sample, FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# codec-dependent steps — stubbed (no PIL/ffmpeg in this container)
# ---------------------------------------------------------------------------


def decode_image(with_payload: DataFrame) -> DataFrame:
    """Decode image payloads to pixel arrays. STUB: requires PIL."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:  # pragma: no cover - PIL never present here
        raise NotImplementedError(
            "image decode requires pillow; this environment has no codec "
            "libraries. The surrounding plumbing (attach_payload → "
            "mapInPandas batch iteration) is exercised by extract_features."
        ) from e
    raise NotImplementedError("real decode path not implemented")  # pragma: no cover


def resize_image(with_payload: DataFrame, width: int, height: int) -> DataFrame:
    """Resize decoded images. STUB: requires PIL."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("image resize requires pillow") from e
    raise NotImplementedError("real resize path not implemented")  # pragma: no cover
