"""Baseline JFIF grayscale codec (functions/jpeg.py): the input_hint
lossy invariant (decoded pixels PSNR ≥ 40 dB), structural markers,
determinism, and edge cases. No external JPEG decoder exists in this
container, so cross-decoder verification is environment-blocked; the
decoder reads quant/huffman tables from the stream (not module
constants), and the marker structure is asserted here byte-level."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cookieblock_consent_classifier_spark.functions import jpeg
from cookieblock_consent_classifier_spark.functions.image import (
    decode_image,
    encode_image,
    psnr,
    synth_pixels,
)


@pytest.mark.parametrize("h,w", [(32, 32), (29, 37), (8, 8), (64, 48), (5, 3)])
def test_round_trip_psnr_at_least_40db(h, w):
    """The north-rule lossy invariant on the synthetic corpus class,
    including non-multiple-of-8 shapes (edge-replicate padding)."""
    px = synth_pixels("jpeg_rt", 1, w, h)
    dec = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(px))
    assert dec.shape == (h, w)
    assert psnr(px, dec) >= 40.0


def test_worst_case_noise_still_decodes_with_bounded_loss():
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    dec = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(noise, quality=75))
    assert psnr(noise, dec) >= 25.0  # uniform noise at sub-default quality
    # q95 recovers the 40 dB bar even on noise
    dec95 = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(noise, quality=95))
    assert psnr(noise, dec95) >= 40.0


def test_encode_is_deterministic_and_structurally_jfif():
    px = synth_pixels("jpeg_det", 2, 24, 16)
    a = jpeg.encode_jpeg_gray(px)
    assert a == jpeg.encode_jpeg_gray(px)
    assert a[:2] == b"\xff\xd8" and a[-2:] == b"\xff\xd9"  # SOI...EOI
    assert a[2:4] == b"\xff\xe0" and a[6:11] == b"JFIF\x00"  # APP0
    # SOF0 present with our dims, 8-bit, one component
    i = a.index(b"\xff\xc0")
    precision, hh, ww, ncomp = struct.unpack(">BHHB", a[i + 4:i + 10])
    assert (precision, hh, ww, ncomp) == (8, 16, 24, 1)
    # exactly two DHT segments (DC + AC), one DQT
    assert a.count(b"\xff\xc4") >= 2 and b"\xff\xdb" in a


def test_entropy_stream_is_byte_stuffed():
    """No raw 0xFF marker bytes inside the entropy-coded segment: every
    0xFF between SOS and EOI must be followed by 0x00 (stuffing)."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    a = jpeg.encode_jpeg_gray(px)
    sos = a.index(b"\xff\xda")
    scan = a[sos + 2 + struct.unpack(">H", a[sos + 2:sos + 4])[0]:-2]
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, f"unstuffed 0xFF at scan offset {i}"
            i += 2
        else:
            i += 1


def test_decoder_rejects_progressive_and_truncated():
    px = synth_pixels("jpeg_rej", 0, 16, 16)
    a = bytearray(jpeg.encode_jpeg_gray(px))
    i = a.index(b"\xff\xc0")
    a[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        jpeg.decode_jpeg_gray(bytes(a))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(px)[:40])
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg_gray(b"not a jpeg")


def test_quality_knob_trades_size_for_fidelity():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    lo, hi = jpeg.encode_jpeg_gray(px, 30), jpeg.encode_jpeg_gray(px, 95)
    assert len(lo) < len(hi)
    assert psnr(px, jpeg.decode_jpeg_gray(lo)) < psnr(px, jpeg.decode_jpeg_gray(hi))


def test_image_dispatch_routes_jpeg_and_legacy():
    """encode_image/decode_image dispatch: fmt='jpeg' emits real JFIF;
    PNG and the legacy SGIM stand-in container still decode."""
    px = synth_pixels("jpeg_disp", 3, 20, 12)
    enc = encode_image(px, "jpeg")
    assert enc[:2] == b"\xff\xd8"
    assert psnr(px, decode_image(enc)) >= 40.0
    legacy = b"SGIM" + struct.pack("<II", 4, 4) + bytes(range(16))
    assert decode_image(legacy).shape == (4, 4)


# -- property fuzz (hypothesis) ---------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    quality=st.integers(50, 100),
)
def test_fuzz_round_trip_never_crashes_and_bounds_error(h, w, seed, quality):
    """Any shape x any content x any sane quality: encode→decode never
    crashes, preserves shape, emits a well-formed stream (SOI..EOI),
    and error stays within a loose floor (tiny noise blocks at q50
    measure as low as ~14 dB — the TIGHT 40 dB bound lives in the
    default-quality corpus tests above). derandomize: fixed example
    set, no cross-run flake."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w)).astype(np.uint8)
    enc = jpeg.encode_jpeg_gray(px, quality=quality)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = jpeg.decode_jpeg_gray(enc)
    assert dec.shape == (h, w)
    assert psnr(px, dec) >= 10.0
