"""Multimodal (image) payload kernels — north-rule input_hint shape
(image_id, bytes, w, h, fmt, caption, phash).

Codecs:
- fmt='png'  → REAL PNG (8-bit grayscale, colortype 0): standard
  signature, IHDR/IDAT/IEND chunks, CRC-32, zlib-compressed scanlines.
  Encode emits filter type 0; decode implements ALL five PNG scanline
  filters (None/Sub/Up/Average/Paeth), so externally-produced
  grayscale-8 PNGs decode too. Pure stdlib (zlib/struct) + numpy —
  no image library needed. Lossless: decoded pixels are bit-exact
  (PSNR = inf ≥ the 40 dB input_hint invariant).
- fmt='jpeg' → REAL baseline JFIF (functions/jpeg.py, pure numpy +
  stdlib): 8x8 DCT, quality-scaled Annex K quantization, standard
  huffman entropy coding, full marker stream. The decoder reads quant
  and huffman tables from the stream (DQT/DHT), so any standard
  baseline grayscale JPEG decodes; default quality 95
  (jpeg.DEFAULT_QUALITY — chosen so the worst case, the mod-256
  sawtooth corpus, stays ≥ 40 dB PSNR with margin; see the note in
  jpeg.py) keeps the decoded pixels ≥ 40 dB on the synthetic corpus
  (the input_hint lossy invariant, pinned in tests/test_jpeg.py). No external decoder
  exists in this container to cross-check against — the structural
  markers are asserted in tests and the table-from-stream design
  keeps the decoder general. Legacy round-1..3 stand-in payloads
  (SGIM container) still decode.

Everything Spark-side — binary column handling, Arrow batch shapes,
pandas-UDF signatures, per-entity phash-delta windows, PSNR
verification — is real and tested either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F, types as T
from pyspark.sql.functions import pandas_udf

try:  # real codecs if ever available — plumbing is codec-agnostic
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False

_MAGIC = b"SGIM"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# real PNG subset codec (grayscale 8-bit), stdlib-only
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray(pixels: np.ndarray) -> bytes:
    """Standard-conformant 8-bit grayscale PNG (filter 0 scanlines)."""
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, gray
    raw = b"".join(b"\x00" + pixels[i].tobytes() for i in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_gray(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG; supports all 5 scanline filters
    (so foreign encoders' output decodes, not just ours)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 0 or comp != 0 or filt != 0 or inter != 0:
                raise NotImplementedError(
                    f"PNG subset codec: only 8-bit grayscale, got depth={depth} colortype={ctype}"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    if len(raw) != h * (w + 1):
        raise ValueError(
            f"bad scanline payload size: {len(raw)} != {h}*({w}+1)"
        )
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(raw[i * (w + 1) + 1:(i + 1) * (w + 1)], dtype=np.uint8)
        ftype = raw[i * (w + 1)]
        if ftype == 0:  # None
            cur = row.copy()
        elif ftype == 2:  # Up
            cur = row + prev  # uint8 wraps mod 256, per spec
        elif ftype == 1:  # Sub
            cur = np.empty(w, dtype=np.uint8)
            left = 0
            for j in range(w):
                left = (int(row[j]) + left) & 0xFF
                cur[j] = left
        elif ftype == 3:  # Average
            cur = np.empty(w, dtype=np.uint8)
            left = 0
            for j in range(w):
                left = (int(row[j]) + ((left + int(prev[j])) >> 1)) & 0xFF
                cur[j] = left
        elif ftype == 4:  # Paeth
            cur = np.empty(w, dtype=np.uint8)
            left = upleft = 0
            for j in range(w):
                left = (int(row[j]) + _paeth(left, int(prev[j]), upleft)) & 0xFF
                upleft = int(prev[j])
                cur[j] = left
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[i] = cur
        prev = cur
    return out


# ---------------------------------------------------------------------------
# deterministic synthetic codec (pure numpy)
# ---------------------------------------------------------------------------

def synth_pixels(image_id: str, update_idx: int, w: int, h: int) -> np.ndarray:
    """Deterministic smooth gradient + per-entity offset; consecutive
    updates differ slightly (so phash deltas are nonzero but small)."""
    seed = (hash_str(image_id) + 7919 * update_idx) % 251
    y, x = np.mgrid[0:h, 0:w]
    img = (x * 3 + y * 5 + seed) % 256
    return img.astype(np.uint8)


def hash_str(s: str) -> int:
    """Stable non-negative 63-bit FNV-1a (NOT Python hash(), which is
    salted per process)."""
    acc = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        acc = ((acc ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return acc & 0x7FFFFFFFFFFFFFFF


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png_gray(pixels)  # REAL PNG (module docstring)
    if fmt == "jpeg":
        from cookieblock_consent_classifier_spark.functions import jpeg  # noqa: PLC0415

        return jpeg.encode_jpeg_gray(pixels)  # REAL baseline JFIF
    raise NotImplementedError(f"codec for fmt={fmt!r} not available in this container")


def encode_image_batch(pixels_list: list, fmts: list) -> list:
    """Arrow-batch encode path: all jpeg images in the batch encode in
    ONE vectorized pass (jpeg.encode_jpeg_gray_batch — one DCT matmul
    + one entropy-coder call across every block of every image;
    byte-identical to per-image encode_image). PNG and other formats
    stay per-image: their cost is zlib, not numpy dispatch. This is
    the call shape every encoding pandas UDF should use."""
    out: list = [None] * len(pixels_list)
    jpeg_idx = [i for i, f in enumerate(fmts) if f == "jpeg"]
    if jpeg_idx:
        from cookieblock_consent_classifier_spark.functions import jpeg  # noqa: PLC0415

        encs = jpeg.encode_jpeg_gray_batch([pixels_list[i] for i in jpeg_idx])
        for i, e in zip(jpeg_idx, encs):
            out[i] = e
    for i, (px, f) in enumerate(zip(pixels_list, fmts)):
        if out[i] is None:
            out[i] = encode_image(px, f)
    return out


def decode_image(payload: bytes) -> np.ndarray:
    if payload[:8] == _PNG_SIG:
        return decode_png_gray(payload)
    if payload[:2] == b"\xff\xd8":
        from cookieblock_consent_classifier_spark.functions import jpeg  # noqa: PLC0415

        return jpeg.decode_jpeg_gray(payload)
    if payload[:4] != _MAGIC:
        raise ValueError("not a PNG / JFIF / legacy-container payload")
    # legacy round-1..3 stand-in container (kept so old persisted
    # payloads still decode)
    w, h = struct.unpack("<II", payload[4:12])
    return np.frombuffer(payload[12:], dtype=np.uint8).reshape(h, w)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def average_phash(pixels: np.ndarray, grid: int = 8) -> int:
    """64-bit average hash: block-mean to grid×grid, bit=1 where block
    mean > global mean. Deterministic, pure numpy."""
    h, w = pixels.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    blocks = np.empty((grid, grid), dtype=np.float64)
    for i in range(grid):
        for j in range(grid):
            blk = pixels[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            blocks[i, j] = blk.mean()
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # keep in signed-int64 non-negative range for cross-engine parity
    return val & 0x7FFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# vectorized UDFs (Arrow batches; no per-row Python at the API surface)
# ---------------------------------------------------------------------------

@pandas_udf(T.LongType())
def phash_from_bytes(payload: pd.Series) -> pd.Series:
    """Decode + average-phash per image, vectorized over the Arrow
    batch (the per-image numpy work is the irreducible kernel)."""

    def one(b):
        return average_phash(decode_image(bytes(b)))

    return payload.map(one, na_action="ignore").astype("Int64")


@pandas_udf(T.DoubleType())
def decode_psnr(payload: pd.Series, ref_payload: pd.Series) -> pd.Series:
    """PSNR between decoded payload and a reference payload (the
    decoded-pixel invariant: PSNR ≥ 40 dB for lossy; inf for
    lossless)."""
    out = []
    for b, r in zip(payload, ref_payload):
        if b is None or r is None:
            out.append(None)
        else:
            out.append(psnr(decode_image(bytes(b)), decode_image(bytes(r))))
    return pd.Series(out, dtype="float64")


@pandas_udf(T.StructType([
    T.StructField("mean", T.DoubleType()),
    T.StructField("std", T.DoubleType()),
    T.StructField("p99", T.DoubleType()),
]))
def pixel_stats(payload: pd.Series) -> pd.DataFrame:
    """Per-image decoded-pixel summary stats (feature-extraction shape
    for downstream quality filters)."""
    rows = []
    for b in payload:
        if b is None:
            rows.append((None, None, None))
        else:
            px = decode_image(bytes(b)).astype(np.float64)
            rows.append((float(px.mean()), float(px.std()), float(np.percentile(px, 99))))
    return pd.DataFrame(rows, columns=["mean", "std", "p99"], index=payload.index)


def resize_pixels(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic block-mean resize (the stub codec's stand-in for
    a real resampler; swaps for PIL.Image.resize when available)."""
    h, w = pixels.shape
    ys = np.linspace(0, h, out_h + 1).astype(int)
    xs = np.linspace(0, w, out_w + 1).astype(int)
    out = np.empty((out_h, out_w), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            blk = pixels[ys[i]: max(ys[i + 1], ys[i] + 1), xs[j]: max(xs[j + 1], xs[j] + 1)]
            out[i, j] = int(blk.mean())
    return out


def resize_udf(out_w: int, out_h: int):
    """decode → resize → re-encode (lossless container), vectorized
    over Arrow batches; the standard normalize-resolution step of an
    image training-data pipeline."""

    @pandas_udf(T.BinaryType())
    def _udf(payload: pd.Series) -> pd.Series:
        def one(b):
            return encode_image(resize_pixels(decode_image(bytes(b)), out_w, out_h), "png")

        return payload.map(one, na_action="ignore")

    return _udf


def extract_image_features(df: DataFrame, bytes_col: str = "bytes"):
    """mapInPandas feature-extraction pass: decode once per image and
    emit the full per-image feature record (stats + phash) in a single
    Arrow batch iterator — the pattern for heavy multimodal kernels
    where one decode feeds many features (vs per-feature UDFs that
    would re-decode). Schema is explicit (mapInPandas contract).
    """
    import pyspark.sql.types as T_

    out_schema = T_.StructType(
        df.schema.fields
        + [
            T_.StructField("px_mean", T_.DoubleType()),
            T_.StructField("px_std", T_.DoubleType()),
            T_.StructField("phash_check", T_.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            means, stds, hashes = [], [], []
            for b in pdf[bytes_col]:
                if b is None:
                    means.append(None), stds.append(None), hashes.append(None)
                    continue
                px = decode_image(bytes(b)).astype(np.float64)
                means.append(float(px.mean()))
                stds.append(float(px.std()))
                hashes.append(average_phash(decode_image(bytes(b))))
            pdf = pdf.copy()
            pdf["px_mean"], pdf["px_std"], pdf["phash_check"] = means, stds, hashes
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


_VIDEO_MAGIC = b"SGVC"


def encode_video_frames(frames: list[np.ndarray]) -> bytes:
    """Multi-frame container: magic + frame count + length-prefixed
    REAL PNG frames. Stands in for a video file at the Spark-plumbing
    level (binary column → per-frame decode); compressed video codecs
    are not available in this container."""
    parts = [_VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for px in frames:
        payload = encode_png_gray(px)
        parts.append(struct.pack("<I", len(payload)))
        parts.append(payload)
    return b"".join(parts)


def decode_video_frames(payload: bytes) -> list[bytes]:
    """Split the container back into per-frame PNG payloads. A bare
    single-image payload (PNG or synthetic) is treated as one frame."""
    if payload[:4] != _VIDEO_MAGIC:
        return [bytes(payload)]
    (n,) = struct.unpack("<I", payload[4:8])
    pos = 8
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack("<I", payload[pos:pos + 4])
        frames.append(bytes(payload[pos + 4:pos + 4 + ln]))
        pos += 4 + ln
    return frames


def frame_sample_udf(every_n: int = 2):
    """Frame sampling for video-shaped payloads: parse the multi-frame
    container, keep every ``every_n``-th frame (0, n, 2n, …) as its
    own single-image payload — the standard video→training-frames
    step. Output shape: binary → array<binary>; bare single-image
    payloads pass through as one frame."""

    @pandas_udf(T.ArrayType(T.BinaryType()))
    def _udf(payload: pd.Series) -> pd.Series:
        def one(b):
            frames = decode_video_frames(bytes(b))
            return frames[::max(1, every_n)]

        return payload.map(one, na_action="ignore")

    return _udf


def hamming64(a: Column, b: Column) -> Column:
    """Bit-level hamming distance between two int64 hashes — native
    (bit_count(a XOR b)); this is the phash-delta feature."""
    return F.bit_count(a.bitwiseXOR(b))


def with_phash_delta(
    df: DataFrame, entity_col: str = "image_id", ts_col: str = "ts", phash_col: str = "phash"
) -> DataFrame:
    """Per-entity consecutive phash hamming delta (the image analogue
    of the reference's per-diff value-distance features,
    processor.py:1496-1503)."""
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    prev = F.lag(phash_col).over(w)
    return df.withColumn(
        "phash_delta",
        F.when(prev.isNotNull(), hamming64(F.col(phash_col), prev)).cast("integer"),
    )
