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
