"""Multimodal (image/audio/video) column handling.

Media is carried as an opaque ``binary`` column plus a typed metadata
struct — the schema pattern for multimodal training data at 100 TB:

    media: binary, media_meta: struct<format:string, width:int, height:int>

Decode / feature-extraction runs through Arrow-batched ``mapInPandas``:
the ONLY sanctioned Python hot path in the engine (real codecs are C
libraries behind Python APIs, so the UDF boundary is unavoidable — but it
is vectorized per Arrow batch, never per row). The actual image/audio
libraries are not in this container, so:

- ``decode_media`` with the default ``codec="fake"`` runs a deterministic
  byte-statistics decoder (REAL plumbing: schema, Arrow batching,
  partition-preserving mapInPandas — fake only in what the bytes mean),
  which makes the whole path oracle-checkable;
- ``codec="pil"`` decodes real images through Pillow in the SAME
  mapInPandas shape (width/height/mean intensity come from the decoded
  pixels), and ``resize`` re-encodes through Pillow; both raise
  NotImplementedError at the import gate when Pillow is absent (it is
  not in this container — tests skipif-gate on it);
- ``codec="av"`` decodes real video through PyAV in the same shape:
  ``decode_media`` probes the first video stream (dimensions + first-
  frame mean luminance), ``frame_sample`` decodes and keeps every
  N-th frame's mean luminance — gated identically (NotImplementedError
  when PyAV is absent; tests skipif-gate the real path and pin the
  gate).

Scale notes: mapInPandas streams Arrow batches (no per-row pickling, no
full-partition materialization); decode is stateless per row so any
partitioning works — keep upstream file-size-based partitioning and
repartition only if decode skew (giant videos) shows up, ideally by a
size-bucket column.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_intensity", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("frames", ArrayType(IntegerType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from ``documents``: utf-8 bytes as the
    opaque payload + deterministic metadata (the test-fixture generator —
    a real pipeline lands actual image/audio bytes in the same shape)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.lit("fake").alias("format"),
            ((F.col("n_chars") % 64) + 16).cast("int").alias("width"),
            ((F.col("doc_id") % 32) + 8).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def _require(codec: str) -> None:
    if codec == "fake":
        return
    if codec == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib absent by design
            raise NotImplementedError(
                "codec='pil' needs Pillow (not in this environment); the "
                "decode pipeline below is identical — only the per-batch "
                "decode function changes"
            ) from e
    elif codec == "av":
        try:
            import av  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "codec='av' needs PyAV (not in this environment)"
            ) from e
    else:
        raise ValueError(f"unknown codec: {codec}")


def decode_media(df: DataFrame, codec: str = "fake") -> DataFrame:
    """(doc_id, n_bytes, mean_intensity, width, height) per media row.

    Arrow-batched. ``codec="fake"``: numpy byte math per batch — integer
    byte sums are exact in float64, so mean_intensity is bit-reproducible
    in SQL. ``codec="pil"``: the same per-batch contract, but
    width/height/mean_intensity come from Pillow-DECODED pixels
    (grayscale mean), not the metadata struct — the real-image path.
    ``codec="av"``: the real-video path — dimensions from the first
    video stream, mean_intensity from the FIRST decoded frame's
    grayscale mean (the cheap probe; whole-video statistics go through
    ``frame_sample``, which decodes only sampled frames).
    """
    _require(codec)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            buf = pdf["media"]
            meta = pdf["media_meta"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": buf.map(len).astype("int32"),
                    "mean_intensity": buf.map(
                        lambda b: float(np.frombuffer(b, dtype=np.uint8).sum())
                        / len(b)
                        if len(b)
                        else 0.0
                    ),
                    "width": meta.map(lambda m: m["width"]).astype("int32"),
                    "height": meta.map(lambda m: m["height"]).astype("int32"),
                }
            )

    def decode_pil(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        from io import BytesIO

        import numpy as np
        import pandas as pd
        from PIL import Image

        for pdf in batches:
            n_bytes, mean_i, widths, heights = [], [], [], []
            for b in pdf["media"]:
                raw = bytes(b)
                n_bytes.append(len(raw))
                with Image.open(BytesIO(raw)) as im:
                    px = np.asarray(im.convert("L"), dtype=np.uint8)
                    widths.append(im.width)
                    heights.append(im.height)
                    mean_i.append(float(px.mean()) if px.size else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(n_bytes, dtype="int32"),
                    "mean_intensity": pd.Series(mean_i, dtype="float64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                }
            )

    def decode_av(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        from io import BytesIO

        import av
        import pandas as pd

        for pdf in batches:
            n_bytes, mean_i, widths, heights = [], [], [], []
            for b in pdf["media"]:
                raw = bytes(b)
                n_bytes.append(len(raw))
                with av.open(BytesIO(raw)) as container:
                    stream = container.streams.video[0]
                    stream.thread_type = "AUTO"  # frame-parallel decode
                    widths.append(stream.codec_context.width)
                    heights.append(stream.codec_context.height)
                    frame = next(container.decode(stream), None)
                    if frame is None:
                        mean_i.append(0.0)
                    else:
                        px = frame.to_ndarray(format="gray")
                        mean_i.append(float(px.mean()) if px.size else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(n_bytes, dtype="int32"),
                    "mean_intensity": pd.Series(mean_i, dtype="float64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                }
            )

    fns = {"fake": decode, "pil": decode_pil, "av": decode_av}
    return df.mapInPandas(fns[codec], DECODE_SCHEMA)


def frame_sample(df: DataFrame, every: int = 32, codec: str = "fake") -> DataFrame:
    """Every ``every``-th frame per media row, as one int per sampled
    frame. ``codec="fake"``: every N-th byte IS the frame value (the
    oracle-checkable plumbing twin). ``codec="av"``: real video — decode
    the first video stream and keep every N-th frame's mean grayscale
    luminance, skipping the frames in between (the decode-only-what-you-
    sample pattern; PyAV still demuxes every packet, but the ndarray
    conversion + stats run only on sampled frames)."""
    _require(codec)

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            frames = pdf["media"].map(
                lambda b: [
                    int(x) for x in np.frombuffer(b, dtype=np.uint8)[::every]
                ]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": frames.map(len).astype("int32"),
                    "frames": frames,
                }
            )

    def sample_av(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from io import BytesIO

        import av
        import pandas as pd

        for pdf in batches:
            counts, vals = [], []
            for b in pdf["media"]:
                with av.open(BytesIO(bytes(b))) as container:
                    stream = container.streams.video[0]
                    stream.thread_type = "AUTO"
                    fr = [
                        int(f.to_ndarray(format="gray").mean())
                        for i, f in enumerate(container.decode(stream))
                        if i % every == 0
                    ]
                counts.append(len(fr))
                vals.append(fr)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": pd.Series(counts, dtype="int32"),
                    "frames": vals,
                }
            )

    return df.mapInPandas(sample_av if codec == "av" else sample, FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_meta", MEDIA_META),
    ]
)


def resize(df: DataFrame, width: int, height: int) -> DataFrame:
    """Pillow resize: binary in -> re-encoded PNG binary out + updated
    media_meta, in the same Arrow-batched mapInPandas shape as
    ``decode_media`` (gated on Pillow like ``codec="pil"``)."""
    _require("pil")

    def do(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from io import BytesIO

        import pandas as pd
        from PIL import Image

        for pdf in batches:
            out = []
            for b in pdf["media"]:
                with Image.open(BytesIO(bytes(b))) as im:
                    buf = BytesIO()
                    im.resize((width, height)).save(buf, format="PNG")
                    out.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "media_meta": [
                        {"format": "png", "width": width, "height": height}
                    ]
                    * len(out),
                }
            )

    return df.mapInPandas(do, RESIZE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Backwards-compatible alias for the pre-Pillow gate: delegates to
    ``resize`` (raises NotImplementedError when Pillow is absent)."""
    return resize(df, width, height)


# ---------------------------------------------------------------------------
# Audio: real RIFF/WAV decode through the stdlib ``wave`` parser
# ---------------------------------------------------------------------------
# Unlike the image (Pillow) and video (PyAV) paths, the audio path needs no
# external library: WAV is a stdlib-parseable container, so this modality is
# REAL end-to-end in this environment — actual RIFF header parsing, actual
# 16-bit PCM sample extraction — in the same Arrow-batched mapInPandas shape
# as the other codecs. Feature outputs are integer-exact (sum of squares in
# int64) so the whole decode is oracle-checkable; float features (duration,
# RMS) are derived from the exact integers by the caller in JVM SQL.

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("sum_sq", LongType()),
    ]
)


def wav_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize real WAV files from ``documents``: each utf-8 byte of
    ``text`` becomes one 16-bit PCM sample ``(byte - 128) * 256`` at a
    per-doc sample rate ``8000 + (doc_id % 4) * 4000`` — a deterministic
    fixture (like ``media_from_documents``), but the payload is a
    conformant RIFF/WAV container written through the stdlib ``wave``
    module, so downstream decode exercises a real parser."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import wave
        from io import BytesIO

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                samples = (
                    np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(
                        np.int16
                    )
                    - 128
                ) * 256
                buf = BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000 + (int(doc_id) % 4) * 4000)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": payloads})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("media", BinaryType())]
    )
    return docs.select("doc_id", "text").mapInPandas(gen, schema)


def decode_audio(df: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, sample_rate, n_samples, sum_sq) per WAV payload.

    Real decode: the stdlib ``wave`` parser reads the RIFF header
    (sample rate, frame count) and the PCM frames; samples go through
    numpy as int16 and ``sum_sq`` accumulates their squares in exact
    int64 — the caller derives float features (duration = n_samples /
    sample_rate, RMS = sqrt(sum_sq / n_samples)) JVM-side, keeping this
    UDF integer-only and bit-reproducible."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import wave
        from io import BytesIO

        import numpy as np
        import pandas as pd

        for pdf in batches:
            n_bytes, rates, counts, sums = [], [], [], []
            for b in pdf["media"]:
                raw = bytes(b)
                n_bytes.append(len(raw))
                with wave.open(BytesIO(raw), "rb") as w:
                    rates.append(w.getframerate())
                    n = w.getnframes()
                    counts.append(n)
                    samples = np.frombuffer(
                        w.readframes(n), dtype="<i2"
                    ).astype(np.int64)
                sums.append(int((samples * samples).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(n_bytes, dtype="int32"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(counts, dtype="int32"),
                    "sum_sq": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(decode, AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Images: real binary PNM (P5 grayscale / P6 RGB) decode, stdlib-only
# ---------------------------------------------------------------------------
# The q102 WAV pattern applied to the image modality: PNM is the one image
# container parseable with no external library (binary PGM/PPM — a text
# header ``P5|P6 <width> <height> <maxval>`` followed by raw samples), so
# image decode can be REAL end-to-end in this environment — actual header
# tokenization, actual pixel-array extraction — while the Pillow path
# (``decode_media(codec="pil")``) stays the gate for compressed formats.
# The UDF emits only exact integers (dimensions, channel count, int64 pixel
# sum); mean intensity is derived JVM-side, keeping the decode
# bit-reproducible and oracle-checkable.

PNM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pix_sum", LongType()),
    ]
)


def _make_pnm_parser():
    # Defined through a factory so the function pickles BY VALUE into
    # mapInPandas closures: executor Python workers do not have this
    # package on sys.path, so a module-level helper (pickled by
    # reference) would fail to import worker-side.
    def parse_pnm(raw: bytes):
        import numpy as np

        if len(raw) < 2 or raw[0:1] != b"P" or raw[1:2] not in b"56":
            raise ValueError(f"not a binary PNM payload (magic {raw[:2]!r})")
        magic = raw[:2].decode("ascii")
        channels = 3 if magic == "P6" else 1
        pos, fields = 2, []
        while len(fields) < 3:
            # skip whitespace and comment lines between header tokens
            while pos < len(raw) and raw[pos : pos + 1].isspace():
                pos += 1
            if raw[pos : pos + 1] == b"#":
                while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(raw) and raw[pos : pos + 1].isdigit():
                pos += 1
            if start == pos:
                raise ValueError("malformed PNM header")
            fields.append(int(raw[start:pos]))
        width, height, maxval = fields
        if maxval > 255:
            raise ValueError(
                f"two-byte PNM samples unsupported (maxval {maxval})"
            )
        pos += 1  # exactly one whitespace byte separates header from samples
        n = width * height * channels
        if len(raw) - pos < n:
            raise ValueError(
                f"truncated PNM: expected {n} samples, got {len(raw) - pos}"
            )
        return magic, width, height, channels, np.frombuffer(
            raw, dtype=np.uint8, count=n, offset=pos
        )

    return parse_pnm


#: Parse a binary PNM payload -> (magic, width, height, channels, flat
#: uint8 sample array). Handles arbitrary header whitespace and ``#``
#: comments per the netpbm spec; rejects non-binary magics and
#: two-byte-sample maxvals (>255).
_parse_pnm = _make_pnm_parser()


def pnm_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize real binary PNM images from ``documents``: each utf-8
    byte of ``text`` becomes one pixel value in a ``(doc_id % 16) + 4``
    wide image (height = ceil(len / width), zero-padded to fill the
    last row); even doc_ids write P5 grayscale, odd ones P6 RGB with
    r=g=b — both branches of the parser exercised by one fixture whose
    statistics stay restatable in SQL (like ``wav_from_documents``)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                vals = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                w = (int(doc_id) % 16) + 4
                h = max(1, -(-len(vals) // w))
                padded = np.zeros(w * h, dtype=np.uint8)
                padded[: len(vals)] = vals
                if int(doc_id) % 2 == 0:
                    header = f"P5\n{w} {h}\n255\n".encode("ascii")
                    body = padded
                else:
                    header = f"P6\n{w} {h}\n255\n".encode("ascii")
                    body = np.repeat(padded, 3)  # r = g = b
                payloads.append(header + body.tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": payloads})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("media", BinaryType())]
    )
    return docs.select("doc_id", "text").mapInPandas(gen, schema)


def decode_pnm(df: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, format, width, height, channels, pix_sum) per
    PNM payload — real stdlib+numpy decode in the same Arrow-batched
    mapInPandas shape as ``decode_audio``. ``pix_sum`` is the exact
    int64 sum over every channel sample; callers derive mean intensity
    as ``pix_sum / (width * height * channels)`` JVM-side."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            n_bytes, fmts, ws, hs, chs, sums = [], [], [], [], [], []
            for b in pdf["media"]:
                raw = bytes(b)
                n_bytes.append(len(raw))
                magic, w, h, c, pixels = _parse_pnm(raw)
                fmts.append(magic)
                ws.append(w)
                hs.append(h)
                chs.append(c)
                sums.append(int(pixels.sum(dtype="int64")))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(n_bytes, dtype="int32"),
                    "format": fmts,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(chs, dtype="int32"),
                    "pix_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(decode, PNM_SCHEMA)


PNM_MEDIA_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("media", BinaryType())]
)


def resize_pnm(df: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of binary PNM payloads: PNM in -> PNM out
    (same magic/channels, new dimensions) — the image analogue of
    ``resample_audio``: a REAL, stdlib+numpy transform executable in
    this environment, in the same Arrow-batched mapInPandas shape, while
    ``resize`` (Pillow) remains the gate for compressed formats.
    Nearest-neighbor keeps pixel VALUES from the source (no
    interpolation), so resized statistics stay integer-exact."""
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")
    parse = _parse_pnm

    def do(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for b in pdf["media"]:
                magic, w, h, c, px = parse(bytes(b))
                img = px.reshape(h, w, c)
                # endpoint-preserving nearest-neighbor sample grid
                ys = np.minimum(
                    (np.arange(height) * h) // height, h - 1
                ).astype(np.int64)
                xs = np.minimum(
                    (np.arange(width) * w) // width, w - 1
                ).astype(np.int64)
                res = img[ys][:, xs]
                header = f"{magic}\n{width} {height}\n255\n".encode("ascii")
                out.append(header + res.tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": out})

    return df.mapInPandas(do, PNM_MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Images: real COMPRESSED-format decode — stdlib PNG (zlib inflate +
# per-scanline unfilter), no external library
# ---------------------------------------------------------------------------
# One step past q108's PNM (raw samples): PNG is a genuinely compressed
# container that is still fully parseable with the stdlib — chunk framing
# with CRC-32 validation, IHDR geometry, concatenated-IDAT zlib inflate, and
# the five per-scanline filters (None/Sub/Up/Average/Paeth) undone exactly
# per the PNG spec (RFC 2083 §6). 8-bit depth, color types 0 (gray),
# 2 (RGB) and 6 (RGBA), non-interlaced. Pillow remains the gate for JPEG
# and exotic PNGs (16-bit, palette, interlaced). The decode UDF emits only
# exact integers (dimensions, channels, int64 pixel sum, a bitmask of the
# filter types actually encountered) so the whole path stays
# oracle-checkable; floats are derived JVM-side.

PNG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("color_type", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pix_sum", LongType()),
        StructField("filter_mask", IntegerType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _make_png_codec():
    # Factory so both functions pickle BY VALUE into mapInPandas closures
    # (the _make_pnm_parser precedent: executor workers lack this package
    # on sys.path, so by-reference pickles fail worker-side).
    import struct
    import zlib

    import numpy as np

    sig = b"\x89PNG\r\n\x1a\n"

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    def encode_png(img, color_type: int, row_filters) -> bytes:
        """Encode an (h, w, c) uint8 array as a conformant PNG, filtering
        scanline r with filter type ``row_filters[r]`` — the fixture
        exercises ALL five unfilter paths, not just the trivial one.
        Filtering is vectorized: each predictor reads RAW bytes (encode-
        side dependencies never chain through the output)."""
        h, w, c = img.shape
        expected = {0: 1, 2: 3, 6: 4}[color_type]
        if c != expected:
            raise ValueError(f"color_type {color_type} needs {expected} channels")
        bpp = c
        zeros = np.zeros(bpp, dtype=np.int64)
        out = bytearray()
        prev = np.zeros(w * c, dtype=np.int64)
        for r in range(h):
            raw = img[r].reshape(-1).astype(np.int64)
            left = np.concatenate([zeros, raw[:-bpp]]) if len(raw) > bpp else (
                np.zeros_like(raw)
            )
            upleft = np.concatenate([zeros, prev[:-bpp]]) if len(raw) > bpp else (
                np.zeros_like(raw)
            )
            f = int(row_filters[r]) % 5
            if f == 0:
                filt = raw
            elif f == 1:
                filt = raw - left
            elif f == 2:
                filt = raw - prev
            elif f == 3:
                filt = raw - (left + prev) // 2
            else:  # Paeth
                p = left + prev - upleft
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - prev),
                    np.abs(p - upleft),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, prev, upleft),
                )
                filt = raw - pred
            out.append(f)
            out.extend((filt % 256).astype(np.uint8).tobytes())
            prev = raw
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            sig
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b"")
        )

    def decode_png(raw: bytes):
        """Parse a PNG -> (color_type, width, height, channels, flat uint8
        pixel array, filter_mask). Validates the signature and every
        chunk CRC; inflates the concatenated IDAT stream; undoes the five
        scanline filters exactly per spec (row 0's missing predecessors
        are zero). Supports 8-bit gray/RGB/RGBA, non-interlaced."""
        if raw[:8] != sig:
            raise ValueError(f"not a PNG payload (signature {raw[:8]!r})")
        pos, idat, ihdr = 8, [], None
        while pos + 8 <= len(raw):
            (length,) = struct.unpack(">I", raw[pos : pos + 4])
            ctype = raw[pos + 4 : pos + 8]
            data = raw[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack(
                ">I", raw[pos + 8 + length : pos + 12 + length]
            )
            if zlib.crc32(ctype + data) != crc:
                raise ValueError(f"CRC mismatch in {ctype!r} chunk")
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if ihdr is None:
            raise ValueError("missing IHDR chunk")
        w, h, depth, color_type, comp, filt, interlace = ihdr
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
            raise ValueError(
                "unsupported PNG variant (need 8-bit, deflate, filter "
                f"method 0, non-interlaced; got depth={depth} comp={comp} "
                f"filt={filt} interlace={interlace}) — use codec='pil'"
            )
        channels = {0: 1, 2: 3, 6: 4}.get(color_type)
        if channels is None:
            raise ValueError(
                f"unsupported color type {color_type} — use codec='pil'"
            )
        stream = zlib.decompress(b"".join(idat))
        stride = w * channels
        if len(stream) != h * (stride + 1):
            raise ValueError(
                f"inflated stream is {len(stream)} bytes, expected "
                f"{h * (stride + 1)}"
            )
        bpp = channels
        pixels = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int64)
        mask = 0
        for r in range(h):
            base = r * (stride + 1)
            f = stream[base]
            mask |= 1 << f
            filt_row = np.frombuffer(
                stream, dtype=np.uint8, count=stride, offset=base + 1
            ).astype(np.int64)
            if f == 0:
                recon = filt_row
            elif f == 1:
                # Sub: recon[x] = filt[x] + recon[x-bpp] — a per-lane
                # prefix sum mod 256 (lanes = channel positions)
                recon = (
                    np.cumsum(filt_row.reshape(w, bpp), axis=0) % 256
                ).reshape(-1)
            elif f == 2:
                recon = (filt_row + prev) % 256
            elif f in (3, 4):
                # Average/Paeth chain through recon along x: sequential
                rec = [0] * stride
                pv = prev
                for x in range(stride):
                    a = rec[x - bpp] if x >= bpp else 0
                    b = int(pv[x])
                    if f == 3:
                        pred = (a + b) // 2
                    else:
                        cc = int(pv[x - bpp]) if x >= bpp else 0
                        p = a + b - cc
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                        pred = a if pa <= pb and pa <= pc else (
                            b if pb <= pc else cc
                        )
                    rec[x] = (int(filt_row[x]) + pred) & 0xFF
                recon = np.asarray(rec, dtype=np.int64)
            else:
                raise ValueError(f"bad filter byte {f} on scanline {r}")
            pixels[r] = recon.astype(np.uint8)
            prev = recon
        return color_type, w, h, channels, pixels.reshape(-1), mask

    return encode_png, decode_png


#: Driver-side handles (tests use these directly); UDFs re-create the
#: pair inside the factory-produced closure below.
_encode_png, _decode_png = _make_png_codec()


def png_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize real PNG files from ``documents``: each utf-8 byte of
    ``text`` becomes one pixel value in a ``(doc_id % 16) + 4`` wide
    image (height = ceil(len / width), zero-padded last row — the q108
    geometry, so the oracle restates statistics from the text column);
    even doc_ids encode 8-bit grayscale (color type 0), odd ones RGB
    with r=g=b (color type 2); scanline r is filtered with type
    ``(doc_id + r) % 5`` so every unfilter branch executes."""
    codec_factory = _make_png_codec

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        encode_png, _ = codec_factory()
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                vals = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                w = (int(doc_id) % 16) + 4
                h = max(1, -(-len(vals) // w))
                padded = np.zeros(w * h, dtype=np.uint8)
                padded[: len(vals)] = vals
                if int(doc_id) % 2 == 0:
                    img = padded.reshape(h, w, 1)
                    ct = 0
                else:
                    img = np.repeat(padded, 3).reshape(h, w, 3)  # r = g = b
                    ct = 2
                filters = [(int(doc_id) + r) % 5 for r in range(h)]
                payloads.append(encode_png(img, ct, filters))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": payloads})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("media", BinaryType())]
    )
    return docs.select("doc_id", "text").mapInPandas(gen, schema)


def decode_png(df: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, color_type, width, height, channels, pix_sum,
    filter_mask) per PNG payload — a REAL compressed-image decode
    (chunk CRCs, zlib inflate, spec-exact unfiltering) with no external
    library, in the same Arrow-batched mapInPandas shape as
    ``decode_pnm``. ``pix_sum`` is the exact int64 sum over every
    channel sample; ``filter_mask`` ORs ``1 << filter_type`` per
    scanline actually decoded, so the oracle can prove all five filter
    paths ran. Callers derive mean intensity JVM-side."""
    codec_factory = _make_png_codec

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        _, decode_one = codec_factory()
        for pdf in batches:
            n_bytes, cts, ws, hs, chs, sums, masks = [], [], [], [], [], [], []
            for b in pdf["media"]:
                raw = bytes(b)
                n_bytes.append(len(raw))
                ct, w, h, c, px, mask = decode_one(raw)
                cts.append(ct)
                ws.append(w)
                hs.append(h)
                chs.append(c)
                sums.append(int(px.sum(dtype="int64")))
                masks.append(mask)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(n_bytes, dtype="int32"),
                    "color_type": pd.Series(cts, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(chs, dtype="int32"),
                    "pix_sum": pd.Series(sums, dtype="int64"),
                    "filter_mask": pd.Series(masks, dtype="int32"),
                }
            )

    return df.mapInPandas(decode, PNG_SCHEMA)


PNG_MEDIA_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("media", BinaryType())]
)


def resize_png(df: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of PNG payloads: PNG in -> PNG out (same
    color type, new dimensions, re-deflated) — the COMPRESSED-format
    twin of ``resize_pnm``, still with no external library: decode
    (inflate + unfilter), endpoint-preserving nearest-neighbor sample,
    re-encode through the stdlib deflate path (filter 0 scanlines — the
    transform's job is geometry, not ratio tuning). Pixel VALUES come
    from the source with no interpolation, so resized statistics stay
    integer-exact and restatable."""
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")
    codec_factory = _make_png_codec

    def do(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        encode_one, decode_one = codec_factory()
        for pdf in batches:
            out = []
            for b in pdf["media"]:
                ct, w, h, c, px, _mask = decode_one(bytes(b))
                img = px.reshape(h, w, c)
                ys = np.minimum(
                    (np.arange(height) * h) // height, h - 1
                ).astype(np.int64)
                xs = np.minimum(
                    (np.arange(width) * w) // width, w - 1
                ).astype(np.int64)
                out.append(encode_one(img[ys][:, xs], ct, [0] * height))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": out})

    return df.mapInPandas(do, PNG_MEDIA_SCHEMA)


RESAMPLE_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("media", BinaryType())]
)


def resample_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """Linear-interpolation resample to ``target_rate``: WAV in -> WAV
    out (same mapInPandas shape as ``resize``). Sample count scales by
    target_rate / source_rate (endpoints preserved); the interpolation
    runs vectorized in numpy per payload, and the result re-encodes
    through the stdlib ``wave`` writer so the output is again a real
    container any WAV reader can open."""
    if target_rate <= 0:
        raise ValueError("target_rate must be positive")

    def do(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import wave
        from io import BytesIO

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for b in pdf["media"]:
                with wave.open(BytesIO(bytes(b)), "rb") as w:
                    rate = w.getframerate()
                    n = w.getnframes()
                    samples = np.frombuffer(w.readframes(n), dtype="<i2")
                if n == 0:
                    res = samples
                else:
                    m = max(1, int(round(n * target_rate / rate)))
                    # endpoint-preserving sample positions in source time
                    pos = np.linspace(0.0, n - 1, m)
                    res = np.interp(
                        pos, np.arange(n), samples.astype(np.float64)
                    ).astype(np.int16)
                buf = BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(target_rate)
                    w.writeframes(res.tobytes())
                out.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": out})

    return df.mapInPandas(do, RESAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Images: stdlib baseline JPEG decode — the last rung of the
# q102 (WAV) -> q108 (PNM) -> q122 (PNG) compressed-decode ladder
# ---------------------------------------------------------------------------
# Baseline sequential DCT JPEG (ITU-T T.81) is still fully parseable with
# the stdlib + numpy: marker segmentation, DQT/DHT/SOF0/SOS parsing,
# canonical-Huffman entropy decode with FF00 byte unstuffing, DC-delta +
# AC run-length/EOB coefficient reconstruction, zig-zag descan,
# dequantization, and a separable float IDCT per 8x8 block. Supported:
# 8-bit single-component (grayscale) baseline, no restart markers —
# progressive (SOF2), arithmetic, subsampled color, and restart-interval
# streams raise loudly with a Pillow pointer, exactly like the PNG
# decoder's variant gate.
#
# Exactness contract (what makes the face oracle-checkable despite JPEG
# being lossy): the fixture composes each 8x8 block as a CONSTANT level v
# plus a horizontal-frequency-4 stripe of amplitude b. The orthonormal
# forward DCT of such a block is EXACTLY DC = 8*(v-128) and
# AC(u=4,v=0) = 8*b (all other coefficients ~1e-13, rounding to zero), so
# with a unit quant table the encoder emits exact integer coefficients;
# the IDCT evaluates back to (v-128) +- b with ~1e-13 float error, far
# below the 0.5 rounding threshold — the decoded pixels are EXACT and
# every per-image statistic restates from the text rule in SQL. The
# Huffman layer is genuinely exercised: DC deltas vary per block, and the
# stripe coefficient sits at zig-zag index 14 (run of 13 zeros), driving
# the AC run/size path, not just EOB.

JPEG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_blocks", IntegerType()),
        StructField("pix_sum", LongType()),
        StructField("ac_nonzero", IntegerType()),
        StructField("ac_abs_sum", LongType()),
    ]
)


def _make_jpeg_codec():
    # Factory so both halves pickle BY VALUE into mapInPandas closures
    # (the _make_pnm_parser / _make_png_codec precedent).
    import struct

    import numpy as np

    # orthonormal 8x8 DCT basis: A[u, x] = c(u) cos((2x+1) u pi / 16);
    # F = A f A^T matches T.81's F(u,v) = 1/4 C(u) C(v) sum sum f cos cos
    A = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            A[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)

    def _zigzag_order():
        """The 64 (row, col) positions in T.81 zig-zag scan order,
        generated by the diagonal walk rather than hand-typed."""
        order = []
        r = c = 0
        up = True
        for _ in range(64):
            order.append((r, c))
            if up:
                if c == 7:
                    r += 1
                    up = False
                elif r == 0:
                    c += 1
                    up = False
                else:
                    r -= 1
                    c += 1
            else:
                if r == 7:
                    c += 1
                    up = True
                elif c == 0:
                    r += 1
                    up = True
                else:
                    r += 1
                    c -= 1
        return order

    ZZ = _zigzag_order()

    # Huffman alphabets: every symbol at one canonical length (DC: 12
    # categories at 4 bits; AC: EOB + ZRL + all 160 run/size pairs at
    # 8 bits). Valid baseline tables (<= 2^L - 1 codes of length L, so
    # the all-ones code stays unused); compression is modest but the
    # DECODER is fully general canonical-Huffman and reads whatever the
    # DHT declares.
    DC_VALS = list(range(12))
    AC_VALS = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]

    def _canonical(bits, vals):
        """DHT (BITS, HUFFVAL) -> {symbol: (code, length)} via T.81's
        canonical assignment."""
        out = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                out[vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        return out

    DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
    ENC_DC = _canonical(DC_BITS, DC_VALS)
    ENC_AC = _canonical(AC_BITS, AC_VALS)

    class _BitWriter:
        def __init__(self):
            self.buf = bytearray()
            self.acc = 0
            self.n = 0

        def write(self, code, length):
            self.acc = (self.acc << length) | (code & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                byte = (self.acc >> (self.n - 8)) & 0xFF
                self.buf.append(byte)
                if byte == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.n -= 8
            self.acc &= (1 << self.n) - 1

        def done(self) -> bytes:
            if self.n:
                pad = 8 - self.n
                self.write((1 << pad) - 1, pad)  # 1-bit padding per spec
            return bytes(self.buf)

    def _seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    def _encode_block(bw, block_shifted, prev_dc) -> int:
        """Forward-DCT + entropy-encode one level-shifted 8x8 block
        against ``prev_dc`` (this component's predictor); returns the
        new predictor."""
        coef = np.rint(A @ block_shifted @ A.T).astype(np.int64)
        zz = [int(coef[r, c]) for r, c in ZZ]
        diff = zz[0] - prev_dc
        cat = abs(diff).bit_length()
        if cat > 11:
            raise ValueError("DC difference out of baseline range")
        code, ln = ENC_DC[cat]
        bw.write(code, ln)
        if cat:
            bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        run = 0
        for k in range(1, 64):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ENC_AC[0xF0]
                bw.write(code, ln)
                run -= 16
            size = abs(v).bit_length()
            if size > 10:
                raise ValueError("AC coefficient out of baseline range")
            code, ln = ENC_AC[(run << 4) | size]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            code, ln = ENC_AC[0x00]  # EOB
            bw.write(code, ln)
        return zz[0]

    def encode_jpeg(img) -> bytes:
        """Encode an (h, w) uint8 grayscale array — or an (h, w, 3)
        array of raw components (interleaved non-subsampled 4:4:4, one
        block per component per MCU, per-component DC predictors) — as
        a baseline sequential JPEG with a UNIT quantization table
        (coefficients are round(DCT) exactly). Dimensions must be
        multiples of 8 (the fixture's geometry; a general encoder would
        edge-pad)."""
        nc = 1 if img.ndim == 2 else img.shape[2]
        if nc not in (1, 3):
            raise ValueError("encode_jpeg takes (h, w) or (h, w, 3)")
        h, w = img.shape[:2]
        if h % 8 or w % 8:
            raise ValueError("encode_jpeg needs multiple-of-8 dimensions")
        out = bytearray(b"\xff\xd8")  # SOI
        out += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id 0, all 1s
        sof = struct.pack(">BHHB", 8, h, w, nc)
        for cid in range(1, nc + 1):
            sof += bytes([cid, 0x11, 0])  # 1x1 sampling, quant 0
        out += _seg(0xC0, sof)
        out += _seg(0xC4, bytes([0x00] + DC_BITS) + bytes(DC_VALS))
        out += _seg(0xC4, bytes([0x10] + AC_BITS) + bytes(AC_VALS))
        sos = bytes([nc])
        for cid in range(1, nc + 1):
            sos += bytes([cid, 0x00])  # DC table 0, AC table 0
        out += _seg(0xDA, sos + bytes([0, 63, 0]))
        bw = _BitWriter()
        shifted = img.astype(np.float64) - 128.0
        if nc == 1:
            shifted = shifted.reshape(h, w, 1)
        prev_dc = [0] * nc
        for by in range(h // 8):
            for bx in range(w // 8):
                for c in range(nc):  # interleaved MCU: one block per comp
                    block = shifted[
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c
                    ]
                    prev_dc[c] = _encode_block(bw, block, prev_dc[c])
        out += bw.done()
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    class _BitReader:
        def __init__(self, data, pos):
            self.data = data
            self.pos = pos
            self.acc = 0
            self.n = 0

        def bit(self) -> int:
            if self.n == 0:
                if self.pos >= len(self.data):
                    raise ValueError("entropy stream truncated")
                b = self.data[self.pos]
                self.pos += 1
                if b == 0xFF:
                    nxt = (
                        self.data[self.pos]
                        if self.pos < len(self.data)
                        else None
                    )
                    if nxt == 0x00:
                        self.pos += 1  # unstuff
                    elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                        raise ValueError(
                            "restart markers are not supported — use "
                            "codec='pil'"
                        )
                    else:
                        raise ValueError(
                            "unexpected marker inside entropy stream"
                        )
                self.acc = b
                self.n = 8
            self.n -= 1
            return (self.acc >> self.n) & 1

        def bits(self, k) -> int:
            v = 0
            for _ in range(k):
                v = (v << 1) | self.bit()
            return v

    def _read_huffman(reader, table):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def _extend(v, size):
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    def decode_jpeg(raw: bytes):
        """Parse a baseline single-component JPEG -> (width, height,
        n_blocks, pixels[h, w] uint8, ac_nonzero, ac_abs_sum). General
        over quant tables and DHT layouts; raises with a Pillow pointer
        for progressive / multi-component / restart-interval variants."""
        if raw[:2] != b"\xff\xd8":
            raise ValueError(f"not a JPEG payload (starts {raw[:2]!r})")
        pos = 2
        qt = {}
        dc_tables = {}
        ac_tables = {}
        dims = None
        comp = None
        while pos + 4 <= len(raw):
            if raw[pos] != 0xFF:
                raise ValueError(f"expected marker at byte {pos}")
            marker = raw[pos + 1]
            if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                          0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError(
                    "only baseline sequential (SOF0) JPEG is supported — "
                    "use codec='pil'"
                )
            if marker == 0xDD:
                raise ValueError(
                    "restart intervals are not supported — use codec='pil'"
                )
            (seglen,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
            if pos + 2 + seglen > len(raw):
                raise ValueError("truncated JPEG segment")
            body = raw[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT (possibly several tables)
                b = 0
                while b < len(body):
                    pq, tq = body[b] >> 4, body[b] & 0xF
                    if pq != 0:
                        raise ValueError(
                            "16-bit quant tables are not baseline — use "
                            "codec='pil'"
                        )
                    tbl = np.zeros((8, 8), dtype=np.int64)
                    for k, (r, c) in enumerate(ZZ):
                        tbl[r, c] = body[b + 1 + k]
                    qt[tq] = tbl
                    b += 65
            elif marker == 0xC4:  # DHT (possibly several tables)
                b = 0
                while b < len(body):
                    tc, th = body[b] >> 4, body[b] & 0xF
                    bits = list(body[b + 1 : b + 17])
                    nval = sum(bits)
                    if len(bits) < 16 or b + 17 + nval > len(body):
                        raise ValueError("truncated DHT segment")
                    vals = list(body[b + 17 : b + 17 + nval])
                    dec = {}
                    code = 0
                    k = 0
                    for length in range(1, 17):
                        for _ in range(bits[length - 1]):
                            dec[(length, code)] = vals[k]
                            code += 1
                            k += 1
                        code <<= 1
                    (dc_tables if tc == 0 else ac_tables)[th] = dec
                    b += 17 + nval
            elif marker == 0xC0:  # SOF0
                prec, h, w, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8:
                    raise ValueError(
                        "only 8-bit precision is supported — use codec='pil'"
                    )
                if nc not in (1, 3):
                    raise ValueError(
                        "only 1-component (grayscale) or 3-component "
                        "4:4:4 JPEG is supported — use codec='pil'"
                    )
                dims = (h, w)
                comp = {}
                for i in range(nc):
                    cid, sampling, tq = body[6 + 3 * i : 9 + 3 * i]
                    if sampling != 0x11:
                        raise ValueError(
                            "subsampling is not supported — use codec='pil'"
                        )
                    comp[cid] = tq
            elif marker == 0xDA:  # SOS: entropy data follows
                if dims is None:
                    raise ValueError("SOS before SOF0")
                ns = body[0]
                if ns != len(comp):
                    raise ValueError(
                        "interleaved scan over every frame component "
                        "expected (progressive/multi-scan — use "
                        "codec='pil')"
                    )
                comps = []
                for i in range(ns):
                    cid = body[1 + 2 * i]
                    td, ta = body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF
                    comps.append(
                        (qt[comp[cid]], dc_tables[td], ac_tables[ta])
                    )
                data_start = pos + 2 + seglen
                return _scan(raw, data_start, dims, comps)
            pos += 2 + seglen
            # APPn / COM / others: skipped by the generic length walk
        raise ValueError("no SOS marker found")

    def _scan(raw, start, dims, comps):
        """Interleaved baseline scan: per MCU, one 8x8 block per
        component (4:4:4 — no subsampling), each component with its own
        DC predictor and (quant, DC table, AC table) triple. Returns
        (w, h, n_blocks, pixels, ac_nonzero, ac_abs): pixels is (h, w)
        for one component, (h, w, nc) raw component values for three
        (YCbCr->RGB conversion is the caller's separate, explicit
        step)."""
        h, w = dims
        nc = len(comps)
        bh, bw_ = -(-h // 8), -(-w // 8)
        reader = _BitReader(raw, start)
        out = np.zeros((bh * 8, bw_ * 8, nc), dtype=np.uint8)
        prev_dc = [0] * nc
        ac_nonzero = 0
        ac_abs = 0
        for by in range(bh):
            for bx in range(bw_):
                for ci, (quant, dc_tab, ac_tab) in enumerate(comps):
                    coef = np.zeros((8, 8), dtype=np.int64)
                    cat = _read_huffman(reader, dc_tab)
                    diff = _extend(reader.bits(cat), cat) if cat else 0
                    prev_dc[ci] += diff
                    coef[0, 0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        sym = _read_huffman(reader, ac_tab)
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        run, size = sym >> 4, sym & 0xF
                        k += run
                        if k > 63:
                            raise ValueError("AC index past block end")
                        v = _extend(reader.bits(size), size)
                        r, c = ZZ[k]
                        coef[r, c] = v
                        ac_nonzero += 1
                        ac_abs += abs(v)
                        k += 1
                    block = A.T @ (coef * quant).astype(np.float64) @ A
                    px = np.clip(np.rint(block) + 128, 0, 255).astype(
                        np.uint8
                    )
                    out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, ci] = px
        pixels = out[:h, :w, 0] if nc == 1 else out[:h, :w, :]
        return w, h, bh * bw_ * nc, pixels, ac_nonzero, ac_abs

    return encode_jpeg, decode_jpeg


#: Driver-side handles (tests use these directly); UDFs re-create the
#: pair inside the factory-produced closure below.
_encode_jpeg, _decode_jpeg = _make_jpeg_codec()


def _make_jpeg_fixture():
    """Factory for the shared per-document LUMA synthesis (one 8x8
    block per utf-8 text byte: constant level clamp(byte, 16, 239) plus
    a horizontal-frequency-4 stripe of amplitude byte % 3, laid out
    (doc_id % 4) + 2 blocks wide, zero-byte padded) — ONE definition
    for the grayscale (q132) and color (q134) fixtures, pickled by
    value into both generator closures."""
    import numpy as np

    stripe = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)

    def luma_image(doc_id: int, text: str):
        vals = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        bw_ = (int(doc_id) % 4) + 2
        nb = max(1, len(vals))
        bh = -(-nb // bw_)
        img = np.zeros((bh * 8, bw_ * 8), dtype=np.uint8)
        for k in range(bw_ * bh):
            byte = int(vals[k]) if k < len(vals) else 0
            v = min(239, max(16, byte))
            block = np.full((8, 8), v, dtype=np.int64)
            block += (byte % 3) * stripe[np.newaxis, :]
            by, bx = divmod(k, bw_)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block.astype(
                np.uint8
            )
        return img

    return luma_image


def jpeg_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize real baseline JPEGs from ``documents``: each utf-8
    byte of ``text`` becomes one 8x8 block — constant level
    ``clamp(byte, 16, 239)`` plus a horizontal-frequency-4 stripe of
    amplitude ``byte % 3`` (zero net pixel sum; drives the AC Huffman
    run/size path) — laid out ``(doc_id % 4) + 2`` blocks wide (last
    block row padded with byte 0 -> level 16, no stripe). The block
    structure makes every DCT coefficient integer-exact under the unit
    quant table, so the decode restates from the text rule (see the
    module-level exactness contract)."""
    codec_factory = _make_jpeg_codec
    fixture_factory = _make_jpeg_fixture

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        encode_jpeg, _ = codec_factory()
        luma_image = fixture_factory()
        for pdf in batches:
            payloads = [
                encode_jpeg(luma_image(doc_id, text))
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": payloads})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("media", BinaryType())]
    )
    return docs.select("doc_id", "text").mapInPandas(gen, schema)


def decode_jpeg(df: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, width, height, n_blocks, pix_sum, ac_nonzero,
    ac_abs_sum) per JPEG payload — a REAL entropy-coded DCT decode
    (markers, canonical Huffman with byte unstuffing, dequant, IDCT)
    with no external library, in the same Arrow-batched mapInPandas
    shape as ``decode_png``. ``ac_nonzero``/``ac_abs_sum`` count the AC
    coefficients the entropy decoder actually reconstructed, so the
    oracle can prove the run-length path ran; ``pix_sum`` is the exact
    int64 sum over the cropped image. Callers derive mean intensity
    JVM-side."""
    codec_factory = _make_jpeg_codec

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        _, decode_one = codec_factory()
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "n_bytes", "width", "height", "n_blocks",
                    "pix_sum", "ac_nonzero", "ac_abs_sum",
                )
            }
            for b in pdf["media"]:
                raw = bytes(b)
                w, h, nb, px, acn, aca = decode_one(raw)
                rows["n_bytes"].append(len(raw))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_blocks"].append(nb)
                rows["pix_sum"].append(int(px.sum(dtype="int64")))
                rows["ac_nonzero"].append(acn)
                rows["ac_abs_sum"].append(aca)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.Series(rows["n_bytes"], dtype="int32"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "n_blocks": pd.Series(rows["n_blocks"], dtype="int32"),
                    "pix_sum": pd.Series(rows["pix_sum"], dtype="int64"),
                    "ac_nonzero": pd.Series(rows["ac_nonzero"], dtype="int32"),
                    "ac_abs_sum": pd.Series(rows["ac_abs_sum"], dtype="int64"),
                }
            )

    return df.mapInPandas(decode, JPEG_SCHEMA)


def jpeg_color_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize 3-component 4:4:4 baseline JPEGs from ``documents``:
    the luma plane is exactly ``jpeg_from_documents``'s grayscale image
    (one structured block per text byte), and both chroma planes are
    constant 128 — whose level-shifted blocks are exactly zero under
    the DCT, so the color pipeline (interleaved MCUs, three DC
    predictor chains) stays integer-exact and the q134 oracle restates
    every statistic from the text rule with a +2*128 per-pixel chroma
    term."""
    codec_factory = _make_jpeg_codec
    fixture_factory = _make_jpeg_fixture

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        encode_jpeg, _ = codec_factory()
        luma_image = fixture_factory()
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                luma = luma_image(doc_id, text)
                img = np.stack(
                    [luma, np.full_like(luma, 128), np.full_like(luma, 128)],
                    axis=2,
                )
                payloads.append(encode_jpeg(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": payloads})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("media", BinaryType())]
    )
    return docs.select("doc_id", "text").mapInPandas(gen, schema)
