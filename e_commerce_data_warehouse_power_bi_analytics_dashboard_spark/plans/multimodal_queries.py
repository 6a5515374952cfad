"""Multimodal catalog entries: binary payload columns with typed
metadata, Arrow-batched feature extraction, and frame sampling
(beyond-reference extension — see operators/multimodal.py).

Oracle strategy: the test documents are pure ASCII (asserted in
tests/test_multimodal.py), so byte semantics are replicated in DuckDB
with string functions (length==octet_length, sha256(VARCHAR) hashes the
UTF-8 bytes) — a genuinely independent computation path from the Spark
side's real ``binary`` processing in pandas. Entropy is rounded to 6
decimals on both sides (summation order differs across engines at the
last bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..sources.tpch import read_table
from .catalog import register

_FRAME, _EVERY = 256, 4


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.attach_payload(read_table(spark, sf_dir, "documents"))


@register(
    "mm_attach_metadata",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                    WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
               CAST(64 + (doc_id % 16) * 32 AS INT) AS width,
               CAST(64 + (doc_id % 9) * 32 AS INT) AS height,
               CAST(n_chars * 10 AS BIGINT) AS duration_ms
        FROM documents
    """,
    tags=("multimodal", "binary", "schema"),
    doc="Binary payload + typed metadata struct attachment; metadata "
        "filters stay Catalyst-side (payload column pruned)",
)
def mm_attach_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_payload(spark, sf_dir)
    return df.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("byte_len"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


@register(
    "mm_feature_extract",
    oracle="""
        WITH counts AS (
            SELECT doc_id, ch, count(*) AS c
            FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents) t
            GROUP BY doc_id, ch
        ),
        entropy AS (
            SELECT c.doc_id,
                   round(-sum((c.c * 1.0 / d.n_chars) * log2(c.c * 1.0 / d.n_chars)), 6)
                       AS byte_entropy
            FROM counts c JOIN documents d USING (doc_id)
            GROUP BY c.doc_id
        )
        SELECT d.doc_id,
               CAST(length(d.text) AS BIGINT) AS byte_len,
               sha256(d.text) AS sha256,
               lower(hex(encode(substring(d.text, 1, 4)))) AS magic,
               e.byte_entropy
        FROM documents d JOIN entropy e USING (doc_id)
    """,
    tags=("multimodal", "binary", "mapInPandas"),
    doc="Arrow-batched per-payload feature extraction (digest, magic "
        "bytes, byte entropy) — the real decode/featurize plumbing shape",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = MM.extract_features(_with_payload(spark, sf_dir))
    return feats.withColumn("byte_entropy", F.round("byte_entropy", 6))


@register(
    "mm_frame_sample",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, text, CAST(ceil(length(text) / {_FRAME}.0) AS INT) AS n_frames
            FROM documents
        )
        SELECT doc_id,
               CAST(f.frame_idx AS INT) AS frame_idx,
               CAST(length(substring(text, f.frame_idx * {_FRAME} + 1, {_FRAME})) AS BIGINT)
                   AS frame_len,
               sha256(substring(text, f.frame_idx * {_FRAME} + 1, {_FRAME})) AS frame_sha256
        FROM p, unnest(range(0, p.n_frames, {_EVERY})) AS f(frame_idx)
    """,
    tags=("multimodal", "binary", "mapInPandas", "explode"),
    doc=f"Frame sampling: {_FRAME}-byte virtual frames, every {_EVERY}th kept "
        "(1→N row-expanding mapInPandas — the video frame-sample shape)",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.sample_frames(_with_payload(spark, sf_dir), frame_size=_FRAME, every=_EVERY)


@register(
    "mm_modality_stats",
    oracle="""
        SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                    WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
               COUNT(*) AS n_docs,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(MAX(64 + (doc_id % 16) * 32) AS INT) AS max_width,
               CAST(MAX(n_chars * 10) AS BIGINT) AS max_duration_ms
        FROM documents
        GROUP BY 1
    """,
    tags=("multimodal", "binary", "A6"),
    doc="Modality rollup over metadata only — Catalyst prunes the payload "
        "column so the scan never reads the blobs",
)
def mm_modality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_payload(spark, sf_dir)
    return df.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
        F.max("meta.width").alias("max_width"),
        F.max("meta.duration_ms").alias("max_duration_ms"),
    )


@register(
    "mm_png_header_parse",
    oracle="""
        SELECT doc_id,
               CAST(64 + (doc_id % 16) * 32 AS BIGINT) AS width,
               CAST(64 + (doc_id % 9) * 32 AS BIGINT) AS height
        FROM documents
        WHERE doc_id % 3 = 0
    """,
    tags=("multimodal", "binary", "parse"),
    doc="Real wire-format header parsing, no codec needed: frame each "
        "image payload with a correct PNG preamble (8-byte signature + "
        "IHDR length/type + big-endian width/height) built JVM-side from "
        "the metadata, then parse the dimensions BACK out of the raw "
        "bytes with substring/hex/conv byte arithmetic — the exact "
        "parser a pipeline runs over real PNG blobs to get dimensions "
        "without decoding pixels (pixel decode stays codec-gated in "
        "operators/multimodal.py). The payload bytes are synthesized "
        "because the container ships no image files; the PARSER side is "
        "the real operator, oracle-checked against the independent "
        "metadata formula.",
)
def mm_png_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    png = _with_payload(spark, sf_dir).filter(F.col("meta.mime") == "image/png")
    # 89 50 4E 47 0D 0A 1A 0A | len(IHDR data)=13 | 'IHDR' | width BE | height BE
    framed = png.select(
        "doc_id",
        F.expr(
            "concat(unhex('89504E470D0A1A0A'), unhex('0000000D'), unhex('49484452'), "
            "unhex(lpad(hex(meta.width), 8, '0')), "
            "unhex(lpad(hex(meta.height), 8, '0')), payload)"
        ).alias("png_bytes"),
    )
    return framed.select(
        "doc_id",
        F.expr("CAST(conv(hex(substring(png_bytes, 17, 4)), 16, 10) AS BIGINT)").alias("width"),
        F.expr("CAST(conv(hex(substring(png_bytes, 21, 4)), 16, 10) AS BIGINT)").alias("height"),
    )


# ---------------------------------------------------------------------------
# real pixel/sample decode — stdlib wire-format codecs (no PIL/ffmpeg)
# ---------------------------------------------------------------------------
#
# The container ships no media files or codec packages, so the PAYLOADS
# are synthesized (real PNG/WAV byte streams with correct CRCs, DEFLATE
# scanlines, RIFF chunk layout, from closed-form pixel/sample formulas in
# doc_id) — but the DECODERS are the real operator under test: they parse
# the wire format byte-for-byte (operators/multimodal.py encode_png/
# decode_png/decode_wav) and would accept libpng/ffmpeg-produced files of
# the same subset. The oracle recomputes the expected decoded output from
# the same closed-form formulas without ever touching the bytes — a
# genuinely independent path that fails if any filter/CRC/inflate step
# decodes wrong.

_IMG_DOCS = "SELECT doc_id, 8*(1 + doc_id % 6) AS w, 4*(1 + doc_id % 5) AS h FROM documents WHERE doc_id % 3 = 0"


@register(
    "mm_png_pixel_decode",
    oracle=f"""
        WITH img AS ({_IMG_DOCS}),
        px AS (
            SELECT i.doc_id, i.w, i.h, (i.doc_id * 7 + y.y * 3 + x.x) % 256 AS v
            FROM img i
            JOIN range(0, 20) y(y) ON y.y < i.h
            JOIN range(0, 48) x(x) ON x.x < i.w
        )
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(w * h AS BIGINT) AS n_pixels,
               round(avg(v), 6) AS mean_pixel
        FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="REAL PNG pixel decode, stdlib-only: synthesize valid grayscale-8 "
        "PNG files (CRC'd chunks, zlib IDAT, scanline filters cycling "
        "None/Sub/Up/Average/Paeth), then decode them back — chunk walk, "
        "CRC verify, inflate, de-filter — in Arrow-batched mapInPandas. "
        "Oracle reproduces the expected pixels from the closed-form "
        "formula without touching the bytes.",
)
def mm_png_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    decoded = MM.decode_image(MM.synthesize_png_payloads(docs))
    return decoded.withColumn("mean_pixel", F.round("mean_pixel", 6))


@register(
    "mm_png_rgb_decode",
    oracle="""
        WITH img AS (
            SELECT doc_id, 8*(1 + doc_id % 4) AS w, 4*(1 + doc_id % 3) AS h
            FROM documents WHERE doc_id % 3 = 1
        ),
        px AS (
            SELECT i.doc_id, i.w, i.h, c.c AS ch,
                   (i.doc_id * 7 + y.y * 3 + x.x + 11 * c.c) % 256 AS v
            FROM img i
            JOIN range(0, 12) y(y) ON y.y < i.h
            JOIN range(0, 32) x(x) ON x.x < i.w
            JOIN range(0, 3) c(c) ON true
        )
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               round(avg(CASE WHEN ch = 0 THEN v END), 6) AS mean_r,
               round(avg(CASE WHEN ch = 1 THEN v END), 6) AS mean_g,
               round(avg(CASE WHEN ch = 2 THEN v END), 6) AS mean_b
        FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="REAL truecolor-8 PNG decode (r6 — the gray-only gate from r5 "
        "narrowed): synthesize valid color-type-2 PNG files (CRC'd "
        "chunks, zlib IDAT, all five scanline filters at the 3-byte "
        "stride), decode them back with the stdlib codec, and emit "
        "per-channel means via a numpy stride slice. Oracle reproduces "
        "the channels from the closed-form formula without touching "
        "the bytes.",
)
def mm_png_rgb_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    decoded = MM.decode_image_rgb(MM.synthesize_png_rgb_payloads(docs))
    return decoded.select(
        "doc_id", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@register(
    "mm_png_palette_decode",
    oracle="""
        WITH img AS (
            SELECT doc_id, 8*(1 + doc_id % 5) AS w, 4*(1 + doc_id % 4) AS h
            FROM documents WHERE doc_id % 3 = 2
        ),
        px AS (
            SELECT i.doc_id, i.w, i.h,
                   (i.doc_id * 7 + y.y * 3 + x.x) % 16 AS idx
            FROM img i
            JOIN range(0, 16) y(y) ON y.y < i.h
            JOIN range(0, 40) x(x) ON x.x < i.w
        )
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               round(avg((idx * 17) % 256), 6) AS mean_r,
               round(avg((idx * 29) % 256), 6) AS mean_g,
               round(avg((idx * 53) % 256), 6) AS mean_b
        FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="REAL indexed-color PNG decode (r6 — the palette gate from the "
        "r5 codec narrowed): synthesize valid color-type-3 PNG files "
        "(PLTE chunk of 16 RGB triples, 1-byte-per-pixel scanlines "
        "filtered at the INDEX stride through all five filter types), "
        "decode with the stdlib codec — chunk walk, CRC verify, "
        "inflate, de-filter, palette expansion — and emit per-channel "
        "means. Oracle reproduces the expanded channels from the "
        "closed-form palette/index formulas without touching the bytes "
        "(operators/multimodal.py::encode_png_palette/decode_png).",
)
def mm_png_palette_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    decoded = MM.decode_image_rgb(MM.synthesize_png_palette_payloads(docs))
    return decoded.select(
        "doc_id", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@register(
    "mm_png_gray16_decode",
    oracle="""
        WITH img AS (
            SELECT doc_id, 8*(1 + doc_id % 3) AS w, 4*(1 + doc_id % 4) AS h
            FROM documents WHERE doc_id % 4 = 3
        ),
        px AS (
            SELECT i.doc_id, i.w, i.h,
                   (i.doc_id * 257 + y.y * 301 + x.x * 977) % 65536 AS v
            FROM img i
            JOIN range(0, 16) y(y) ON y.y < i.h
            JOIN range(0, 24) x(x) ON x.x < i.w
        )
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(MIN(v) AS BIGINT) AS min_px,
               CAST(MAX(v) AS BIGINT) AS max_px,
               CAST(SUM(v) AS BIGINT) AS sum_px
        FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="REAL 16-bit grayscale PNG decode (r7 — the highest-value "
        "remaining codec gate: scientific/medical imagery is 16-bit "
        "gray): synthesize valid depth-16 color-type-0 PNG files "
        "(big-endian byte pairs, CRC'd chunks, all five scanline "
        "filters at the 2-byte stride), decode with the stdlib codec — "
        "PNG filters are BYTE-lane operations at every depth, so the "
        "de-filter runs at the doubled stride and samples re-assemble "
        "big-endian — and emit exact integer pixel stats (min/max/sum "
        "over 0..65535). Oracle reproduces the stats from the "
        "closed-form pixel formula without touching the bytes. The "
        "codec gate narrows to sub-byte depths + Adam7 interlace "
        "(operators/multimodal.py::encode_png depth=16 / decode_png).",
)
def mm_png_gray16_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 3)
    return MM.decode_image_gray16(MM.synthesize_png_gray16_payloads(docs))


@register(
    "mm_png_interlaced_decode",
    oracle="""
        WITH img AS (
            SELECT doc_id, 3 + doc_id % 13 AS w, 2 + doc_id % 11 AS h
            FROM documents WHERE doc_id % 5 = 2
        ),
        px AS (
            SELECT i.doc_id, i.w, i.h,
                   (i.doc_id * 7 + y.y * 3 + x.x) % 256 AS v
            FROM img i
            JOIN range(0, 13) y(y) ON y.y < i.h
            JOIN range(0, 16) x(x) ON x.x < i.w
        )
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(MIN(v) AS BIGINT) AS min_px,
               CAST(MAX(v) AS BIGINT) AS max_px,
               CAST(SUM(v) AS BIGINT) AS sum_px
        FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="REAL Adam7-INTERLACED PNG decode (r8 — the last user-visible "
        "codec gate closed: web corpora contain interlaced PNGs): "
        "synthesize valid interlace-method-1 grayscale PNGs whose dims "
        "(3..15 × 2..12) are deliberately not multiples of 8 — every "
        "image exercises partial and EMPTY interlace passes — then "
        "decode with the stdlib codec: each of the 7 passes de-filters "
        "as an independent sub-image (fresh filter state per pass, all "
        "five filter types) and scatters into the full grid per spec "
        "§8.2. Exact integer pixel stats; the oracle reproduces them "
        "from the closed-form formula without touching the bytes "
        "(operators/multimodal.py::encode_png interlace=1 / decode_png).",
)
def mm_png_interlaced_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 2)
    return MM.decode_image_gray16(MM.synthesize_png_interlaced_payloads(docs))


@register(
    "mm_png_sub8_decode",
    oracle="""
        WITH img AS (
            SELECT doc_id, 5 + doc_id % 12 AS w, 3 + doc_id % 6 AS h,
                   CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END
                       AS depth
            FROM documents WHERE doc_id % 5 = 4
        ),
        px AS (
            SELECT i.doc_id, i.w, i.h, i.depth,
                   (i.doc_id * 7 + y.y * 3 + x.x)
                       % (CASE i.depth WHEN 1 THEN 2 WHEN 2 THEN 4
                          ELSE 16 END) AS v
            FROM img i
            JOIN range(0, 9) y(y) ON y.y < i.h
            JOIN range(0, 17) x(x) ON x.x < i.w
        )
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(depth AS INT) AS depth,
               CAST(MIN(v) AS BIGINT) AS min_px,
               CAST(MAX(v) AS BIGINT) AS max_px,
               CAST(SUM(v) AS BIGINT) AS sum_px
        FROM px GROUP BY doc_id, w, h, depth
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="REAL sub-byte PNG decode (r8 — depth 1/2/4 grayscale, the "
        "bilevel/fax end of the spec; completes the depth matrix after "
        "the 16-bit r7 entry, so the stdlib codec now covers EVERY "
        "valid PNG depth/colortype combination): widths are chosen so "
        "most packed rows carry pad bits; scanlines filter at the "
        "packed-BYTE stride (spec §9.2) and samples unpack MSB-first "
        "(§7.2), surfaced raw (0..2^depth-1, no bit replication). "
        "Exact integer stats; oracle from the closed-form formula "
        "(operators/multimodal.py::encode_png depth<8 / decode_png).",
)
def mm_png_sub8_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 4)
    stats = MM.decode_image_gray16(MM.synthesize_png_sub8_payloads(docs))
    return stats.select(
        "doc_id", "width", "height",
        F.element_at(
            F.array(F.lit(1), F.lit(2), F.lit(4)),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).cast("int").alias("depth"),
        "min_px", "max_px", "sum_px",
    )


@register(
    "mm_image_resize_box",
    oracle=f"""
        WITH img AS ({_IMG_DOCS}),
        px AS (
            SELECT i.doc_id, CAST(x.x // 2 AS INT) AS x, CAST(y.y // 2 AS INT) AS y,
                   (i.doc_id * 7 + y.y * 3 + x.x) % 256 AS v
            FROM img i
            JOIN range(0, 20) y(y) ON y.y < i.h
            JOIN range(0, 48) x(x) ON x.x < i.w
        )
        SELECT doc_id, x, y, round(avg(v), 6) AS value
        FROM px GROUP BY doc_id, x, y
    """,
    tags=("multimodal", "binary", "decode", "resize", "mapInPandas"),
    doc="Image resize over REAL decoded pixels: 2x box-average downsample "
        "(numpy reshape-mean per Arrow batch) of the stdlib-decoded "
        "grayscale grid; one row per output pixel, oracle-checked "
        "blockwise.",
)
def mm_image_resize_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    resized = MM.resize_image(MM.synthesize_png_payloads(docs), factor=2)
    return resized.withColumn("value", F.round("value", 6))


@register(
    "mm_wav_pcm_decode",
    oracle="""
        WITH aud AS (
            SELECT doc_id, 50 + (doc_id % 20) * 25 AS n
            FROM documents WHERE doc_id % 3 = 1
        ),
        s AS (
            SELECT a.doc_id, a.n, ((a.doc_id * 131 + i.i * 37) % 20001) - 10000 AS v
            FROM aud a JOIN range(0, 525) i(i) ON i.i < a.n
        )
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               round(n * 1000.0 / 8000, 6) AS duration_ms,
               round(sqrt(avg(v * v)), 6) AS rms
        FROM s GROUP BY doc_id, n
    """,
    tags=("multimodal", "binary", "decode", "audio", "mapInPandas"),
    doc="REAL WAV PCM decode, stdlib-only: synthesize valid RIFF/WAVE "
        "files (fmt + data chunks, int16-LE mono @ 8 kHz), then chunk-walk "
        "and decode the samples in mapInPandas, emitting rate/duration/RMS. "
        "Non-PCM encodings raise from the fmt parse (would need ffmpeg).",
)
def mm_wav_pcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    decoded = MM.decode_wav(MM.synthesize_wav_payloads(docs))
    return decoded.select(
        "doc_id", "sample_rate", "n_samples",
        F.round("duration_ms", 6).alias("duration_ms"),
        F.round("rms", 6).alias("rms"),
    )


@register(
    "mm_wav_pcm24_decode",
    oracle="""
        WITH aud AS (
            SELECT doc_id, 40 + (doc_id % 16) * 20 AS n
            FROM documents WHERE doc_id % 5 = 3
        ),
        s AS (
            SELECT a.doc_id, a.n,
                   ((a.doc_id * 131 + i.i * 37) % 2000001) - 1000000 AS v
            FROM aud a JOIN range(0, 340) i(i) ON i.i < a.n
        )
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(MIN(v) AS BIGINT) AS min_s,
               CAST(MAX(v) AS BIGINT) AS max_s,
               CAST(SUM(v) AS BIGINT) AS sum_s
        FROM s GROUP BY doc_id, n
    """,
    tags=("multimodal", "binary", "decode", "audio", "mapInPandas"),
    doc="REAL 24-bit PCM WAV decode (r8 — the studio/DAW interchange "
        "depth; completes the integer-PCM matrix 8/16/24 in "
        "operators/multimodal.py::parse_wav): synthesize valid "
        "RIFF/WAVE files with 3-byte little-endian two's-complement "
        "frames AND an odd-length LIST junk chunk before fmt (the "
        "word-alignment walk is part of what's tested), decode in "
        "Arrow-batched mapInPandas, emit exact integer sample stats. "
        "Oracle reproduces them from the closed-form sample formula "
        "without touching the bytes.",
)
def mm_wav_pcm24_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 3)
    return MM.decode_wav_stats(MM.synthesize_wav_pcm24_payloads(docs))


@register(
    "mm_wav_mulaw_decode",
    oracle="""
        WITH aud AS (
            SELECT doc_id, 30 + (doc_id % 10) * 15 AS n
            FROM documents WHERE doc_id % 5 = 0
        ),
        b AS (
            SELECT a.doc_id, a.n,
                   255 - ((a.doc_id * 17 + i.i * 29) % 256) AS u
            FROM aud a JOIN range(0, 165) i(i) ON i.i < a.n
        ),
        s AS (
            SELECT doc_id, n,
                   CASE WHEN u >= 128
                        THEN 132 - (((u % 16) * 8 + 132) << ((u // 16) % 8))
                        ELSE (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132
                   END AS v
            FROM b
        )
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(MIN(v) AS BIGINT) AS min_s,
               CAST(MAX(v) AS BIGINT) AS max_s,
               CAST(SUM(v) AS BIGINT) AS sum_s
        FROM s GROUP BY doc_id, n
    """,
    tags=("multimodal", "binary", "decode", "audio", "mapInPandas"),
    doc="REAL G.711 mu-law WAV decode (r8 — the telephony codec; the "
        "first NON-linear-PCM encoding the chunk walker accepts): "
        "synthesize fmt-code-7 RIFF/WAVE files whose companded bytes "
        "are closed-form in doc_id, decode via the canonical integer "
        "expansion (invert complement, mant*8+0x84 << exponent, "
        "de-bias, sign — operators/multimodal.py::_mulaw_expand) in "
        "Arrow-batched mapInPandas, emit exact integer sample stats. "
        "The oracle replays the SAME expansion in pure SQL arithmetic "
        "on the byte formula — two independent implementations of the "
        "standard must agree bit-for-bit on every byte value.",
)
def mm_wav_mulaw_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return MM.decode_wav_stats(MM.synthesize_wav_mulaw_payloads(docs))


@register(
    "mm_wav_alaw_decode",
    oracle="""
        WITH aud AS (
            SELECT doc_id, 30 + (doc_id % 10) * 15 AS n
            FROM documents WHERE doc_id % 6 = 1
        ),
        b AS (
            SELECT a.doc_id, a.n,
                   xor((a.doc_id * 23 + i.i * 31) % 256, 85) AS x
            FROM aud a JOIN range(0, 165) i(i) ON i.i < a.n
        ),
        s AS (
            SELECT doc_id, n,
                   CASE WHEN (x % 128) // 16 = 0 THEN (x % 16) * 16 + 8
                        WHEN (x % 128) // 16 = 1 THEN (x % 16) * 16 + 264
                        ELSE ((x % 16) * 16 + 264) << ((x % 128) // 16 - 1)
                   END * CASE WHEN x >= 128 THEN 1 ELSE -1 END AS v
            FROM b
        )
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(MIN(v) AS BIGINT) AS min_s,
               CAST(MAX(v) AS BIGINT) AS max_s,
               CAST(SUM(v) AS BIGINT) AS sum_s
        FROM s GROUP BY doc_id, n
    """,
    tags=("multimodal", "binary", "decode", "audio", "mapInPandas"),
    doc="REAL G.711 A-law WAV decode (r9 — the European companding "
        "twin of the r8 mu-law entry, closing the last G.711 gate): "
        "synthesize fmt-code-6 RIFF/WAVE files whose companded bytes "
        "are closed-form in doc_id, decode via the canonical integer "
        "expansion (XOR 0x55, mantissa<<4 + segment bias << seg-1, "
        "sign from bit 7 — SET means positive, the opposite of two's "
        "complement; operators/multimodal.py::_alaw_expand) in Arrow-"
        "batched mapInPandas, emit exact integer sample stats. The "
        "oracle replays the SAME expansion in pure SQL arithmetic "
        "(xor + shifts) — two independent implementations of the "
        "standard agreeing bit-for-bit on every byte value (validated "
        "exhaustively over all 256 bytes in tests).",
)
def mm_wav_alaw_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 6 == 1)
    return MM.decode_wav_stats(MM.synthesize_wav_alaw_payloads(docs))


@register(
    "mm_wav_float32_decode",
    oracle="""
        WITH aud AS (
            SELECT doc_id, 35 + (doc_id % 12) * 18 AS n
            FROM documents WHERE doc_id % 5 = 1
        ),
        s AS (
            SELECT a.doc_id, a.n,
                   (a.doc_id * 131 + i.i * 37) % 20001 - 10000 AS numer
            FROM aud a JOIN range(0, 234) i(i) ON i.i < a.n
        )
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(MIN(numer) AS DOUBLE) / 32768.0 AS min_v,
               CAST(MAX(numer) AS DOUBLE) / 32768.0 AS max_v,
               CAST(SUM(numer) AS DOUBLE) / 32768.0 AS sum_v
        FROM s GROUP BY doc_id, n
    """,
    tags=("multimodal", "binary", "decode", "audio", "mapInPandas"),
    doc="REAL 32-bit IEEE-float WAV decode (r8 — fmt code 3, the "
        "DAW/processing-chain format; struct-unpackable, so the old "
        "'needs ffmpeg' gate was dishonest and is gone): samples are "
        "exact multiples of 2^-15 (numerators < 2^14), so min/max/sum "
        "are float64-exact on BOTH engines — the oracle aggregates the "
        "integer numerators exactly and divides ONCE, sidestepping "
        "float-accumulation order entirely. As of r9b every WAV "
        "encoding short of licensed codecs decodes natively (PCM "
        "8/16/24, G.711 both, IMA+MS ADPCM, float32/64).",
)
def mm_wav_float32_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 1)
    return MM.decode_wav_fstats(MM.synthesize_wav_float32_payloads(docs))


@register(
    "mm_wav_stereo_decode",
    oracle="""
        WITH aud AS (
            SELECT doc_id, 40 + (doc_id % 15) * 20 AS n
            FROM documents WHERE doc_id % 3 = 2
        ),
        s AS (
            SELECT a.doc_id, a.n, c.c AS ch,
                   ((a.doc_id * 131 + i.i * 37 + c.c * 53) % 20001) - 10000 AS v
            FROM aud a
            JOIN range(0, 320) i(i) ON i.i < a.n
            JOIN range(0, 2) c(c) ON true
        )
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(n AS BIGINT) AS n_frames,
               round(sqrt(avg(CASE WHEN ch = 0 THEN v * v END)), 6) AS rms_left,
               round(sqrt(avg(CASE WHEN ch = 1 THEN v * v END)), 6) AS rms_right
        FROM s GROUP BY doc_id, n
    """,
    tags=("multimodal", "binary", "decode", "audio", "mapInPandas"),
    doc="REAL stereo WAV decode (r6 — the mono-only gate from r5 "
        "narrowed to mono/stereo): synthesize valid int16-LE STEREO "
        "RIFF/WAVE files (interleaved L/R, block align 4), chunk-walk "
        "and de-interleave in mapInPandas, emitting per-channel RMS. "
        "Channel sums of squares are exact ints, so the single "
        "sqrt-of-ratio per channel is engine-stable; oracle reproduces "
        "both channels from the closed-form formula without touching "
        "the bytes.",
)
def mm_wav_stereo_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    decoded = MM.decode_wav_stereo(MM.synthesize_wav_stereo_payloads(docs))
    return decoded.select(
        "doc_id", "sample_rate", "n_frames",
        F.round("rms_left", 6).alias("rms_left"),
        F.round("rms_right", 6).alias("rms_right"),
    )


@register(
    "mm_wav_multichannel_decode",
    oracle="""
        WITH aud AS (
            SELECT doc_id, 30 + (doc_id % 12) * 15 AS n,
                   3 + doc_id % 4 AS nch
            FROM documents WHERE doc_id % 7 = 5
        ),
        s AS (
            SELECT a.doc_id, a.n, a.nch, c.c AS ch,
                   ((a.doc_id * 131 + i.i * 37 + c.c * 53) % 20001) - 10000 AS v
            FROM aud a
            JOIN range(0, 195) i(i) ON i.i < a.n
            JOIN range(0, 6) c(c) ON c.c < a.nch
        )
        SELECT doc_id, CAST(nch AS INT) AS n_channels,
               CAST(ch AS INT) AS channel,
               CAST(n AS BIGINT) AS n_frames,
               round(sqrt(avg(v * v)), 6) AS rms
        FROM s GROUP BY doc_id, nch, ch, n
    """,
    tags=("multimodal", "binary", "decode", "audio", "mapInPandas"),
    doc="N-CHANNEL WAV decode (r9 — closes the r8 two-channel ceiling, "
        "verdict task #9): synthesize valid int16-LE RIFF/WAVE files "
        "with 3-6 interleaved channels (block align = 2*nch), "
        "chunk-walk and deinterleave at stride nch in mapInPandas, "
        "emitting per-channel RMS in LONG format (one row per channel "
        "— the shape that scales to any surround layout without "
        "per-channel columns). Channel sums of squares are exact ints, "
        "so the sqrt-of-ratio is engine-stable; the oracle reproduces "
        "every channel from the closed-form formula without touching "
        "bytes.",
)
def mm_wav_multichannel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 5)
    decoded = MM.decode_wav_multichannel(
        MM.synthesize_wav_multichannel_payloads(docs)
    )
    return decoded.select(
        "doc_id", "n_channels", "channel", "n_frames",
        F.round("rms", 6).alias("rms"),
    )


@register(
    "mm_jpeg_header_parse",
    oracle="""
        SELECT doc_id,
               CAST(64 + (doc_id % 16) * 32 AS INT) AS width,
               CAST(64 + (doc_id % 9) * 32 AS INT) AS height,
               CAST(8 AS INT) AS precision,
               CAST(1 AS INT) AS n_components,
               CAST(octet_length(encode(substr(text, 1, 40))) AS INT) AS com_len
        FROM documents WHERE doc_id % 3 = 0
    """,
    tags=("multimodal", "binary", "parse", "mapInPandas"),
    doc="REAL JPEG/JFIF marker-segment walk, stdlib-only: synthesize "
        "structurally valid JFIF streams (SOI, APP0, a variable-length "
        "COM segment carrying the doc text head — so fixed offsets "
        "cannot cheat — SOF0, EOI), then recover precision/dimensions/"
        "component count by walking big-endian segment lengths in "
        "mapInPandas. The COM byte length is re-derived independently "
        "by the oracle (UTF-8 octet_length of the same 40-char head, "
        "exercising multibyte zh docs). Companion to the PNG pixel and "
        "WAV PCM decoders; the walker is fuzz-tested like parse_wav.",
)
def mm_jpeg_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return MM.decode_jpeg_header(MM.synthesize_jpeg_payloads(docs))


@register(
    "mm_jpeg_pixel_decode",
    oracle="""
        WITH img AS (
            SELECT doc_id, 2 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
            FROM documents WHERE doc_id % 5 = 1
        ),
        blk AS (
            SELECT i.doc_id, i.bw, i.bh,
                   2 * ((i.doc_id * 7 + y.y * 3 + x.x) % 128) AS g
            FROM img i
            JOIN range(0, 4) x(x) ON x.x < i.bw
            JOIN range(0, 2) y(y) ON y.y < i.bh
        )
        SELECT doc_id,
               CAST(bw * 8 AS INT) AS width,
               CAST(bh * 8 AS INT) AS height,
               CAST(MIN(g) AS BIGINT) AS min_px,
               CAST(MAX(g) AS BIGINT) AS max_px,
               CAST(SUM(g) * 64 AS BIGINT) AS sum_px
        FROM blk GROUP BY doc_id, bw, bh
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="REAL baseline JPEG pixel decode (r9 — verdict task #3, the top "
        "remaining multimodal gate): synthesize baseline-sequential "
        "JFIF streams with a REAL entropy-coded scan (canonical-Huffman "
        "DC/AC coding, byte stuffing — operators/multimodal.py "
        "encode_jpeg), then FULLY decode them in mapInPandas: DHT-built "
        "Huffman tables, bit-destuffed scan read, DC prediction, AC "
        "run-length/EOB/ZRL expansion, dezigzag, DQT dequantization, "
        "float IDCT, level shift + clamp (parse_jpeg_pixels — general "
        "over conforming 4:4:4 baseline inputs, not just this "
        "encoder's). Fixture blocks are constant-gray with even values, "
        "so the DCT path round-trips EXACTLY (DC-only blocks, DC "
        "divisible by the quant step) and the oracle states pixel "
        "min/max/sum in closed form; the lossy general-AC path is "
        "pinned by property tests against an independent numpy "
        "reference. Subsampled chroma / DRI / progressive raise "
        "honestly (fuzz-tested).",
)
def mm_jpeg_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 1)
    return MM.decode_jpeg_pixel_stats(MM.synthesize_jpeg_pixel_payloads(docs))


@register(
    "mm_jpeg_420_decode",
    oracle="""
        WITH img AS (
            SELECT doc_id, 2 + doc_id % 2 AS mw, 1 + doc_id % 3 AS mh
            FROM documents WHERE doc_id % 4 = 2
        ),
        ys AS (
            SELECT i.doc_id,
                   SUM(2 * ((i.doc_id * 5 + y.y * 3 + x.x) % 128)) * 64 AS s
            FROM img i
            JOIN range(0, 6) x(x) ON x.x < 2 * i.mw
            JOIN range(0, 6) y(y) ON y.y < 2 * i.mh
            GROUP BY i.doc_id
        ),
        cbs AS (
            SELECT i.doc_id,
                   SUM(2 * ((i.doc_id * 7 + 29 + y.y * 3 + x.x) % 128)) * 256 AS s
            FROM img i
            JOIN range(0, 3) x(x) ON x.x < i.mw
            JOIN range(0, 3) y(y) ON y.y < i.mh
            GROUP BY i.doc_id
        ),
        crs AS (
            SELECT i.doc_id,
                   SUM(2 * ((i.doc_id * 7 + 58 + y.y * 3 + x.x) % 128)) * 256 AS s
            FROM img i
            JOIN range(0, 3) x(x) ON x.x < i.mw
            JOIN range(0, 3) y(y) ON y.y < i.mh
            GROUP BY i.doc_id
        )
        SELECT i.doc_id, CAST(i.mw * 16 AS INT) AS width,
               CAST(i.mh * 16 AS INT) AS height,
               CAST(ys.s AS BIGINT) AS y_sum,
               CAST(cbs.s AS BIGINT) AS cb_sum,
               CAST(crs.s AS BIGINT) AS cr_sum
        FROM img i
        JOIN ys USING (doc_id) JOIN cbs USING (doc_id)
        JOIN crs USING (doc_id)
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="REAL 4:2:0 color JPEG decode (r9 — the dominant layout of "
        "actual photo corpora, closing the subsampling gate the 4:4:4 "
        "entry left): 3-component MCUs interleave FOUR luma blocks + "
        "one Cb + one Cr; the decoder walks sampling factors from "
        "SOF0, decodes each plane at its own resolution and "
        "replication-upsamples chroma back to full size. Fixture luma "
        "is constant per 8x8 block, chroma per 16x16 MCU, all even — "
        "so box decimation and the DCT round-trip are both exact and "
        "each plane's full-resolution pixel sum has a closed-form "
        "oracle (luma sum x64/block, chroma x256/MCU — the x256 only "
        "holds if upsampling replicated every subsampled pixel exactly "
        "4x). Lossy general 4:2:0 is pinned by property test against "
        "an independent numpy reference.",
)
def mm_jpeg_420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 2)
    return MM.decode_jpeg_420_stats(MM.synthesize_jpeg_420_payloads(docs))


@register(
    "mm_image_ahash",
    oracle=f"""
        WITH img AS ({_IMG_DOCS}),
        px AS (
            SELECT i.doc_id, i.w, i.h, x.x, y.y,
                   (i.doc_id * 7 + y.y * 3 + x.x) % 256 AS v
            FROM img i
            JOIN range(0, 20) y(y) ON y.y < i.h
            JOIN range(0, 48) x(x) ON x.x < i.w
        ),
        cells AS (
            SELECT i.doc_id, i.w, i.h, cx.cx, cy.cy
            FROM img i, range(0, 8) cx(cx), range(0, 8) cy(cy)
        ),
        cellagg AS (
            SELECT c.doc_id, c.w, c.h, c.cx, c.cy,
                   COALESCE(SUM(p.v), 0) AS s,
                   COUNT(p.v) AS ncell
            FROM cells c
            LEFT JOIN px p ON p.doc_id = c.doc_id
               AND p.x >= (c.cx * c.w) // 8 AND p.x < ((c.cx + 1) * c.w) // 8
               AND p.y >= (c.cy * c.h) // 8 AND p.y < ((c.cy + 1) * c.h) // 8
            GROUP BY 1, 2, 3, 4, 5
        ),
        tot AS (
            SELECT doc_id, SUM(v) AS tot, COUNT(*) AS npx
            FROM px GROUP BY doc_id
        ),
        bits AS (
            SELECT ca.doc_id, ca.w, ca.h,
                   ca.cy * 8 + ca.cx AS bit,
                   CASE WHEN ca.s * t.npx > t.tot * ca.ncell
                        THEN 1 ELSE 0 END AS b
            FROM cellagg ca JOIN tot t USING (doc_id)
        )
        SELECT doc_id,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(SUM(CASE WHEN bit < 32
                    THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT)
                   AS hash_hi,
               CAST(SUM(CASE WHEN bit >= 32
                    THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT)
                   AS hash_lo,
               CAST(SUM(b) AS INT) AS n_ones
        FROM bits GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "binary", "decode", "dedup", "mapInPandas"),
    doc="64-bit average-hash (aHash) over the decoded grayscale PNGs — "
        "perceptual image fingerprinting for visual near-dup detection. "
        "Every bit is an EXACT integer comparison (cell_sum * n_pixels "
        "> image_sum * cell_n — no float mean, no libm DCT like pHash) "
        "so the hash is bit-deterministic and the SQL twin reproduces "
        "it from the closed-form pixel formula without touching bytes. "
        "Sub-8-pixel dimensions yield empty cells hashing to 0 "
        "(defined, mirrored in the oracle). Hash emitted as two 32-bit "
        "words + popcount — the SimHash wire shape, so visual pairing "
        "rides the existing pigeonhole hamming machinery; on this "
        "synthetic gradient corpus the pair stage would be degenerate "
        "(all images are smooth ramps), so this entry pins the hashing "
        "operator itself. operators/multimodal.py::ahash_image.",
)
def mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return MM.ahash_image(MM.synthesize_png_payloads(docs))


@register(
    "mm_png_rgba_decode",
    oracle="""
        WITH img AS (
            SELECT doc_id, 8*(1 + doc_id % 3) AS w, 4*(1 + doc_id % 4) AS h
            FROM documents WHERE doc_id % 7 = 3
        ),
        px AS (
            SELECT i.doc_id, i.w, i.h, c.c AS ch,
                   (i.doc_id * 7 + y.y * 3 + x.x + 11 * c.c) % 256 AS v
            FROM img i
            JOIN range(0, 16) y(y) ON y.y < i.h
            JOIN range(0, 24) x(x) ON x.x < i.w
            JOIN range(0, 4) c(c) ON true
        )
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               round(avg(CASE WHEN ch = 0 THEN v END), 6) AS mean_r,
               round(avg(CASE WHEN ch = 1 THEN v END), 6) AS mean_g,
               round(avg(CASE WHEN ch = 2 THEN v END), 6) AS mean_b,
               round(avg(CASE WHEN ch = 3 THEN v END), 6) AS mean_a
        FROM px GROUP BY doc_id, w, h
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="REAL RGBA PNG decode (color type 6 — the alpha gate from the "
        "r6 palette round closed): synthesize valid RGBA files with "
        "filters cycling through all five types at the 4-byte pixel "
        "stride, decode with the stdlib codec, emit per-channel means "
        "including alpha. With this the 8-bit PNG color-type matrix is "
        "COMPLETE (gray/gray+alpha/truecolor/palette/RGBA); remaining "
        "codec gates are sub-byte/16-bit depths and Adam7 interlace. "
        "Oracle reproduces the channels from the closed-form formula "
        "without touching bytes (operators/multimodal.py::"
        "synthesize_png_rgba_payloads/decode_image_rgba).",
)
def mm_png_rgba_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 3)
    decoded = MM.decode_image_rgba(MM.synthesize_png_rgba_payloads(docs))
    return decoded.select(
        "doc_id", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("mean_a", 6).alias("mean_a"),
    )


@register(
    "mm_mp4_box_walk",
    oracle="""
        SELECT doc_id,
               'isom' AS major_brand,
               CAST(4 AS INT) AS n_top_boxes,
               CAST((doc_id % 90 + 1) * 1000 AS BIGINT) AS duration_ms,
               CAST(320 + (doc_id % 8) * 16 AS INT) AS width,
               CAST(240 + (doc_id % 5) * 16 AS INT) AS height,
               CAST(octet_length(encode(substr(text, 1, 32))) AS INT) AS free_len
        FROM documents WHERE doc_id % 4 = 1
    """,
    tags=("multimodal", "binary", "parse", "mapInPandas", "video"),
    doc="REAL ISO-BMFF (MP4) container walk, stdlib-only: synthesize "
        "structurally valid streams (ftyp, a variable-length free box "
        "carrying the doc text head so fixed offsets cannot cheat, moov "
        "with mvhd timescale/duration and tkhd 16.16 fixed-point "
        "dimensions, and an mdat using the size==1 64-bit LARGESIZE "
        "escape — the >4 GiB-recording path), then recover brand/"
        "duration/dimensions by walking box sizes in mapInPandas, one "
        "moov recursion deep. duration_ms is exact integer arithmetic "
        "(units * 1000 // timescale); free_len is re-derived "
        "independently by the oracle as the UTF-8 octet length of the "
        "same 32-char head (multibyte zh docs exercised). The video "
        "companion to the JPEG marker walk and WAV chunk walk; the "
        "walker raises (never misparses) on truncation, overrun, or "
        "v1 64-bit headers, and is fuzz-tested like parse_wav.",
)
def mm_mp4_box_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 1)
    return MM.decode_mp4_header(MM.synthesize_mp4_payloads(docs))


@register(
    "mm_wav_tone_detect",
    oracle="""
        SELECT doc_id,
               CAST(8000 AS INT) AS sample_rate,
               CAST(800 AS BIGINT) AS n_samples,
               CAST(doc_id % 4 AS INT) AS tone_idx,
               CAST(440 * (doc_id % 4 + 1) AS INT) AS freq_hz
        FROM documents WHERE doc_id % 5 = 2
    """,
    tags=("multimodal", "binary", "audio", "mapInPandas", "dft"),
    doc="Frequency-domain audio feature extraction: synthesize real "
        "int16-PCM WAV files each carrying a pure sine from the "
        "440/880/1320/1760 Hz tone table (tone = doc_id %% 4), decode "
        "with the fuzz-tested chunk walker, and classify by single-bin "
        "DFT — project the sample vector onto cos/sin at each candidate "
        "frequency (Goertzel shape, numpy GEMV inside Arrow-batched "
        "mapInPandas) and argmax the energies. Candidates are exact DFT "
        "bins of the synthesized length (zero leakage), so the true "
        "tone's energy is ~(N*A/2)^2 against near-zero off bins — the "
        "argmax label is float-noise-invariant and the oracle checks "
        "the RECOVERED label against doc_id %% 4 plus exact integer "
        "metadata, never a float. The spectral companion to the "
        "time-domain RMS/zero-cross features.",
)
def mm_wav_tone_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 2)
    return MM.detect_wav_tone(MM.synthesize_wav_tone_payloads(docs))


@register(
    "mm_jpeg_restart_decode",
    oracle="""
        WITH img AS (
            SELECT doc_id, 2 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
            FROM documents WHERE doc_id % 6 = 3
        ),
        blk AS (
            SELECT i.doc_id, i.bw, i.bh,
                   2 * ((i.doc_id * 11 + y.y * 3 + x.x) % 128) AS g
            FROM img i
            JOIN range(0, 4) x(x) ON x.x < i.bw
            JOIN range(0, 2) y(y) ON y.y < i.bh
        )
        SELECT doc_id,
               CAST(bw * 8 AS INT) AS width,
               CAST(bh * 8 AS INT) AS height,
               CAST(MIN(g) AS BIGINT) AS min_px,
               CAST(MAX(g) AS BIGINT) AS max_px,
               CAST(SUM(g) * 64 AS BIGINT) AS sum_px
        FROM blk GROUP BY doc_id, bw, bh
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="Baseline JPEG with RESTART INTERVALS (r9): same DC-exact "
        "constant-block fixture family as mm_jpeg_pixel_decode but "
        "encoded with restart_interval=2 — a DRI segment plus "
        "byte-aligned RST0-7 markers every two MCUs, DC predictors "
        "reset at each boundary (what real encoders emit so corrupted "
        "scans resynchronize). The decoder must consume each marker at "
        "the right bit position, verify the modulo-8 sequence, and "
        "restart prediction — one mis-timed restart shifts every "
        "subsequent DC and breaks the closed-form pixel-stat hash.",
)
def mm_jpeg_restart_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 6 == 3)
    return MM.decode_jpeg_pixel_stats(
        MM.synthesize_jpeg_restart_payloads(docs)
    )


@register(
    "mm_jpeg_progressive_decode",
    oracle="""
        WITH img AS (
            SELECT doc_id, 2 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh
            FROM documents WHERE doc_id % 7 = 2
        ),
        blk AS (
            SELECT i.doc_id, i.bw, i.bh,
                   2 * ((i.doc_id * 11 + y.y * 5 + x.x) % 128) AS g
            FROM img i
            JOIN range(0, 5) x(x) ON x.x < i.bw
            JOIN range(0, 3) y(y) ON y.y < i.bh
        )
        SELECT doc_id,
               CAST(bw * 8 AS INT) AS width,
               CAST(bh * 8 AS INT) AS height,
               CAST(MIN(g) AS BIGINT) AS min_px,
               CAST(MAX(g) AS BIGINT) AS max_px,
               CAST(SUM(g) * 64 AS BIGINT) AS sum_px
        FROM blk GROUP BY doc_id, bw, bh
    """,
    tags=("multimodal", "binary", "decode", "mapInPandas"),
    doc="PROGRESSIVE JPEG decode (r10 — verdict #6, the last honest "
        "codec gate in the image family): synthesize real SOF2 "
        "multi-scan streams (encode_jpeg_progressive — DC first at "
        "Al=1 + DC refinement, split 1-5/6-63 AC bands at Al=1 + "
        "refinement scans, end-of-band runs with EOBn symbols) and "
        "FULLY decode them in mapInPandas: per-scan coefficient "
        "accumulation (spectral selection), successive-approximation "
        "bit appends (sign + correction bits through EOB runs, the "
        "T.81 §G model), then one dequantize+IDCT materialization at "
        "EOI. Same DC-exact constant-block fixture family as "
        "mm_jpeg_pixel_decode, so the completed scans reproduce the "
        "grid bit-for-bit and the oracle states the pixel stats in "
        "closed form; the general lossy path is pinned by the "
        "progressive==baseline bit-identity property test "
        "(tests/test_multimodal.py).",
)
def mm_jpeg_progressive_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 2)
    return MM.decode_jpeg_pixel_stats(
        MM.synthesize_jpeg_progressive_payloads(docs)
    )


#: IMA step table as a DuckDB list literal (inlined ONCE in the oracle)
_IMA_ST_SQL = "[" + ",".join(str(s) for s in MM._IMA_STEPS) + "]"


@register(
    "mm_wav_adpcm_decode",
    oracle=f"""
        WITH RECURSIVE aud AS (
            SELECT doc_id,
                   CAST(((doc_id * 131) % 20001) - 10000 AS INTEGER) AS p0,
                   CAST(doc_id % 89 AS INTEGER) AS i0,
                   CAST(24 + (doc_id % 8) * 8 AS INTEGER) AS n
            FROM documents WHERE doc_id % 7 = 2
        ),
        dec AS (
            SELECT doc_id, n, 0 AS i, p0 AS pred, i0 AS idx,
                   CAST(p0 AS BIGINT) AS mn, CAST(p0 AS BIGINT) AS mx,
                   CAST(p0 AS BIGINT) AS s
            FROM aud
            UNION ALL
            SELECT doc_id, n, i, pred, idx,
                   LEAST(mn, pred), GREATEST(mx, pred), s + pred
            FROM (
                SELECT doc_id, n, i + 1 AS i,
                       CAST(GREATEST(-32768, LEAST(32767,
                           pred + CASE WHEN (c & 8) = 8
                                       THEN -diff ELSE diff END))
                            AS INTEGER) AS pred,
                       CAST(GREATEST(0, LEAST(88,
                           idx + ([-1,-1,-1,-1,2,4,6,8])[(c & 7) + 1]))
                            AS INTEGER) AS idx,
                       mn, mx, s
                FROM (
                    SELECT *,
                           (st >> 3)
                           + CASE WHEN (c & 1) = 1 THEN st >> 2 ELSE 0 END
                           + CASE WHEN (c & 2) = 2 THEN st >> 1 ELSE 0 END
                           + CASE WHEN (c & 4) = 4 THEN st ELSE 0 END
                             AS diff
                    FROM (
                        SELECT *,
                               CAST((doc_id * 7 + i * 13) % 16 AS INTEGER) AS c,
                               ({_IMA_ST_SQL})[idx + 1] AS st
                        FROM dec WHERE i < n
                    )
                )
            )
        )
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(n + 1 AS BIGINT) AS n_samples,
               mn AS min_s, mx AS max_s, s AS sum_s
        FROM dec WHERE i = n
    """,
    tags=("multimodal", "binary", "decode", "audio", "adpcm", "mapInPandas"),
    doc="REAL IMA ADPCM WAV decode (r9 — fmt code 0x11, the classic "
        "4:1 adaptive speech compressor; closes the r8 'ADPCM needs "
        "ffmpeg' gate): synthesize single-block mono fmt-0x11 files "
        "whose header predictor/step-index and 4-bit nibble CODES are "
        "closed-form in doc_id, then block-walk and decode the full "
        "adaptive quantizer state machine (89-entry step table, "
        "per-bit truncated difference, index adaptation, int16 clamp "
        "— operators/multimodal.py::_ima_step) in Arrow-batched "
        "mapInPandas. The oracle replays the SAME state machine as a "
        "recursive-CTE fold in pure SQL — step table inlined once, "
        "per-nibble transition per iteration — so two independent "
        "implementations of the published IMA spec must agree on "
        "every decoded sample (exact integer min/max/sum). The MS "
        "ADPCM twin is mm_wav_msadpcm_decode; float64 decodes too — "
        "the WAV gate list now holds only licensed codecs.",
)
def mm_wav_adpcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 2)
    return MM.decode_wav_stats(MM.synthesize_wav_adpcm_payloads(docs))


@register(
    "mm_wav_float64_decode",
    oracle="""
        WITH aud AS (
            SELECT doc_id, 30 + (doc_id % 9) * 14 AS n
            FROM documents WHERE doc_id % 9 = 4
        ),
        s AS (
            SELECT a.doc_id, a.n,
                   ((a.doc_id * 131 + i.i * 37) % 20001) - 10000 AS numer
            FROM aud a JOIN range(0, 142) i(i) ON i.i < a.n
        )
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(MIN(numer) AS DOUBLE) / 32768.0 AS min_v,
               CAST(MAX(numer) AS DOUBLE) / 32768.0 AS max_v,
               CAST(SUM(numer) AS DOUBLE) / 32768.0 AS sum_v
        FROM s GROUP BY doc_id, n
    """,
    tags=("multimodal", "binary", "decode", "audio", "mapInPandas"),
    doc="64-bit IEEE-float WAV decode (r9b — fmt 3 / bits 64, the "
        "scientific double-precision interchange): the r8 gate text "
        "listed float64 among 'genuinely-ffmpeg encodings', which was "
        "dishonest — it is one struct unpack; the gate is gone and the "
        "honest remainder is MS-proprietary-free. Samples are exact "
        "multiples of 2^-15, so min/max/sum are bit-exact on both "
        "engines (integer numerators aggregated, divided once).",
)
def mm_wav_float64_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 9 == 4)
    return MM.decode_wav_fstats(MM.synthesize_wav_float64_payloads(docs))


#: MS ADPCM tables as DuckDB list literals (each inlined ONCE)
_MSA_AT_SQL = "[" + ",".join(str(v) for v in MM._MS_ADAPT) + "]"
_MSA_C1_SQL = "[" + ",".join(str(v) for v in MM._MS_C1) + "]"
_MSA_C2_SQL = "[" + ",".join(str(v) for v in MM._MS_C2) + "]"


@register(
    "mm_wav_msadpcm_decode",
    oracle=f"""
        WITH RECURSIVE aud AS (
            SELECT doc_id,
                   ({_MSA_C1_SQL})[CAST(doc_id % 7 AS INTEGER) + 1] AS c1,
                   ({_MSA_C2_SQL})[CAST(doc_id % 7 AS INTEGER) + 1] AS c2,
                   CAST(16 + (doc_id % 500) * 3 AS INTEGER) AS d0,
                   CAST(((doc_id * 131 + 37) % 20001) - 10000 AS INTEGER) AS s1_0,
                   CAST(((doc_id * 173 + 91) % 20001) - 10000 AS INTEGER) AS s2_0,
                   CAST(20 + (doc_id % 6) * 10 AS INTEGER) AS n
            FROM documents WHERE doc_id % 9 = 7
        ),
        dec AS (
            SELECT doc_id, c1, c2, n, 0 AS i,
                   s1_0 AS s1, s2_0 AS s2, d0 AS delta,
                   CAST(LEAST(s1_0, s2_0) AS BIGINT) AS mn,
                   CAST(GREATEST(s1_0, s2_0) AS BIGINT) AS mx,
                   CAST(s1_0 + s2_0 AS BIGINT) AS s
            FROM aud
            UNION ALL
            SELECT doc_id, c1, c2, n, i, s1, s2, delta,
                   LEAST(mn, s1), GREATEST(mx, s1), s + s1
            FROM (
                SELECT doc_id, c1, c2, n, i + 1 AS i,
                       CAST(GREATEST(-32768, LEAST(32767,
                           base + nsig * delta)) AS INTEGER) AS s1,
                       s1 AS s2,
                       CAST(GREATEST(16,
                           CAST(floor(({_MSA_AT_SQL})[c + 1] * delta
                                      / 256.0) AS INTEGER))
                            AS INTEGER) AS delta,
                       mn, mx, s
                FROM (
                    SELECT *,
                           CAST(floor((s1 * c1 + s2 * c2) / 256.0)
                                AS INTEGER) AS base,
                           CASE WHEN c >= 8 THEN c - 16 ELSE c END AS nsig
                    FROM (
                        SELECT *,
                               ([0,1,2,3,4,13,14,15])[
                                   CAST((doc_id * 11 + i * 7) % 8
                                        AS INTEGER) + 1] AS c
                        FROM dec WHERE i < n
                    )
                )
            )
        )
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(n + 2 AS BIGINT) AS n_samples,
               mn AS min_s, mx AS max_s, s AS sum_s
        FROM dec WHERE i = n
    """,
    tags=("multimodal", "binary", "decode", "audio", "adpcm", "mapInPandas"),
    doc="REAL MS ADPCM WAV decode (r9b — fmt code 2, the other classic "
        "4-bit speech codec; with IMA this completes the ADPCM pair "
        "and empties the WAV gate list of everything but genuinely "
        "proprietary encodings): per-block header carries a predictor-"
        "PAIR index (7 published coefficient pairs), an initial delta "
        "and the two seed samples (emitted oldest-first); each nibble "
        "then computes ((s1*C1 + s2*C2) >> 8) + signed4 * delta with "
        "int16 clamp and table-driven delta adaptation floored at 16 "
        "(operators/multimodal.py::_ms_adpcm_decode). The oracle "
        "replays the state machine as a recursive-CTE fold with all "
        "three published tables inlined — arithmetic-shift semantics "
        "on negative bases are pinned by floor(x/256.0), matching "
        "Python's >> exactly. Exact integer min/max/sum per doc.",
)
def mm_wav_msadpcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 9 == 7)
    return MM.decode_wav_stats(MM.synthesize_wav_msadpcm_payloads(docs))
