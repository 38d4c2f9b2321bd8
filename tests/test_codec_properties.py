"""Property tests: the pure-numpy media codecs are exact inverses on any
input in their domain (no Spark session needed — these run on bare numpy,
so hypothesis can afford hundreds of examples)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trino_iceberg_spark.operators.multimodal import (
    DecodeUnavailable,
    decode_image_bytes,
    decode_wav_bytes,
    encode_bmp,
    encode_ppm,
    encode_wav,
)

dims = st.integers(min_value=1, max_value=40)


@st.composite
def rgb_images(draw):
    h, w = draw(dims), draw(dims)
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=150, deadline=None)
@given(rgb_images())
def test_bmp_roundtrip_property(img):
    assert np.array_equal(decode_image_bytes(encode_bmp(img)), img)


@settings(max_examples=150, deadline=None)
@given(rgb_images())
def test_ppm_roundtrip_property(img):
    assert np.array_equal(decode_image_bytes(encode_ppm(img)), img)


@settings(max_examples=150, deadline=None)
@given(
    st.integers(1, 500),
    st.integers(1, 2),
    st.integers(1, 192_000),
    st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    samples = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, size=(n, ch))
        .astype(np.int16)
    )
    got_rate, got = decode_wav_bytes(encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(got, samples)


@settings(max_examples=80, deadline=None)
@given(rgb_images(), st.floats(0.0, 1.0))
def test_truncated_bmp_never_misdecodes(img, frac):
    """Truncation anywhere — mid-header or mid-pixel-data — must raise,
    never return wrong pixels."""
    raw = encode_bmp(img)
    cut = min(int(len(raw) * frac), len(raw) - 1)
    with pytest.raises(DecodeUnavailable):
        decode_image_bytes(raw[:cut])
