"""Progressive JPEG (SOF2) decode + fixture encoder.

Oracle: progressive coding reorganizes the SAME quantized
coefficients into multiple scans — so decode(progressive_encode(img))
must equal decode(baseline_encode(img)) EXACTLY, pixel for pixel,
given identical quantization tables.  That removes the usual lossy-
codec ambiguity: any deviation is an entropy-coding bug, not "noise".

Pure numpy/stdlib — no Spark session needed.
"""

from __future__ import annotations

import numpy as np
import pytest

from robosystems_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _rng_img(h, w, ch=3, seed=7, smooth=False):
    rng = np.random.default_rng(seed)
    if smooth:
        base = rng.integers(0, 256, (max(1, h // 8), max(1, w // 8), ch))
        img = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
        return img.astype(np.uint8)
    shape = (h, w, ch) if ch else (h, w)
    return rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8)


def test_progressive_stream_structure():
    img = _rng_img(16, 16)
    data = encode_jpeg_progressive(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in data  # SOF2
    assert data.count(b"\xff\xda") >= 6  # multiple scans


@pytest.mark.parametrize(
    "h,w", [(16, 16), (24, 17), (8, 8), (31, 23)]
)
def test_progressive_equals_baseline_rgb(h, w):
    img = _rng_img(h, w)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert prog.shape == base.shape
    np.testing.assert_array_equal(prog, base)


def test_progressive_equals_baseline_gray():
    img = np.asarray(_rng_img(21, 19, ch=None), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(prog, base)


@pytest.mark.parametrize("h,w", [(32, 32), (24, 24), (40, 26)])
def test_progressive_equals_baseline_420(h, w):
    """4:2:0 subsampling: interleaved DC scan over 2x2 luma MCUs,
    chroma AC scans on the half-resolution effective grid."""
    img = _rng_img(h, w, seed=11)
    base = decode_jpeg(encode_jpeg(img, subsample=True))
    prog = decode_jpeg(encode_jpeg_progressive(img, subsample=True))
    np.testing.assert_array_equal(prog, base)


def test_progressive_eobrun_path():
    """A smooth (blocky-constant) image has mostly-zero AC bands →
    long EOB runs across blocks; this drives the EOBn>0 decode path
    (batched end-of-band) in both first and refinement AC scans."""
    img = _rng_img(64, 64, smooth=True, seed=3)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    np.testing.assert_array_equal(prog, base)


def test_progressive_custom_scan_script():
    """Spectral selection split into many narrow bands, deeper
    successive approximation on luma."""
    img = _rng_img(24, 24, seed=5)
    scans = [
        ([0, 1, 2], 0, 0, 0, 2),
        ([0], 1, 2, 0, 1),
        ([0], 3, 9, 0, 1),
        ([0], 10, 63, 0, 1),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
        ([0, 1, 2], 0, 0, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([0], 1, 2, 1, 0),
        ([0], 3, 9, 1, 0),
        ([0], 10, 63, 1, 0),
    ]
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img, scans=scans))
    np.testing.assert_array_equal(prog, base)


def test_progressive_spectral_only_no_refinement():
    """Pure spectral selection (all Al=0): every scan final-pass."""
    img = _rng_img(17, 33, seed=9)
    scans = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img, scans=scans))
    np.testing.assert_array_equal(prog, base)


def test_progressive_constant_roundtrip_bound():
    """Error contract carried over from baseline: a constant block is
    DC-only, quantization error <= Q/2 → round-trip within +-1."""
    img = np.full((16, 16, 3), 137, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(img))
    assert int(np.abs(out.astype(int) - 137).max()) <= 1


def test_progressive_custom_quant_tables():
    q = np.arange(1, 65).reshape(8, 8).astype(np.int32)
    img = _rng_img(16, 24, seed=13)
    base = decode_jpeg(encode_jpeg(img, q_luma=q, q_chroma=q * 2))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, q_luma=q, q_chroma=q * 2)
    )
    np.testing.assert_array_equal(prog, base)


def test_decode_image_dispatches_progressive():
    from robosystems_spark.operators.multimodal import decode_image

    img = _rng_img(16, 16, seed=21)
    out = decode_image(encode_jpeg_progressive(img))
    assert out.shape == (16, 16, 3)


@pytest.mark.parametrize("interval", [1, 2, 5])
def test_progressive_restart_intervals(interval):
    """DRI + RSTn in progressive scans: the decoder must re-sync at
    byte boundaries, resetting DC predictors AND the EOB run, in
    every scan kind (DC first/refine, AC first, AC refinement)."""
    img = _rng_img(32, 24, seed=17)
    data = encode_jpeg_progressive(img, restart_interval=interval)
    assert b"\xff\xdd" in data  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    base = decode_jpeg(encode_jpeg(img))
    np.testing.assert_array_equal(decode_jpeg(data), base)


def test_progressive_restart_with_eobrun_and_420():
    """Smooth image (long EOB runs crossing would-be boundaries — the
    encoder must close the run before each RSTn) and 4:2:0 MCU
    geometry under restarts."""
    img = _rng_img(64, 48, smooth=True, seed=19)
    base = decode_jpeg(encode_jpeg(img))
    got = decode_jpeg(encode_jpeg_progressive(img, restart_interval=3))
    np.testing.assert_array_equal(got, base)

    img2 = _rng_img(48, 32, seed=23)
    base2 = decode_jpeg(encode_jpeg(img2, subsample=True))
    got2 = decode_jpeg(
        encode_jpeg_progressive(img2, subsample=True, restart_interval=2)
    )
    np.testing.assert_array_equal(got2, base2)


@pytest.mark.parametrize("h,w,sub", [(16, 16, False), (24, 17, False), (40, 26, True), (21, 19, None)])
def test_noninterleaved_baseline_equals_interleaved(h, w, sub):
    """Non-interleaved baseline (one SOS per component, Ns=1): same
    quantized coefficients as interleaved, so decode must match
    pixel for pixel — including 4:2:0 effective-grid geometry and
    grayscale (sub=None)."""
    from robosystems_spark.operators.jpeg import encode_jpeg_noninterleaved

    if sub is None:
        img = np.asarray(_rng_img(h, w, ch=None, seed=29), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img))
        got = decode_jpeg(encode_jpeg_noninterleaved(img))
    else:
        img = _rng_img(h, w, seed=29)
        base = decode_jpeg(encode_jpeg(img, subsample=sub))
        got = decode_jpeg(encode_jpeg_noninterleaved(img, subsample=sub))
    np.testing.assert_array_equal(got, base)
    data = (
        encode_jpeg_noninterleaved(img)
        if sub is None
        else encode_jpeg_noninterleaved(img, subsample=sub)
    )
    assert data.count(b"\xff\xda") == (1 if sub is None else 3)


# -- 12-bit multi-scan (r10 verdict item 9) -----------------------------------


def _px12(h=24, w=16):
    import numpy as np

    return (
        ((np.arange(h * w * 3) * 137 + 41) % 4096)
        .astype(np.uint16)
        .reshape(h, w, 3)
    )


def test_progressive_12bit_matches_extended_sequential():
    """12-bit SOF2 (extended DC categories, full-EOBn AC table, 2048
    level shift, 16-bit DQT) decodes to EXACTLY the 12-bit
    extended-sequential pixels — the composition that used to raise."""
    import numpy as np

    from robosystems_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    px = _px12()
    base = decode_jpeg(encode_jpeg(px, precision=12)).astype(int)
    for variant in (
        encode_jpeg_progressive(px, precision=12),
        encode_jpeg_progressive(px, precision=12, restart_interval=2),
        encode_jpeg_progressive(px, precision=12, subsample=True),
    ):
        got = decode_jpeg(variant).astype(int)
        ref = base
        if variant is not None and got.shape != base.shape:
            raise AssertionError("shape")
        # subsample variant compares against the subsampled baseline
        if variant == encode_jpeg_progressive(px, precision=12, subsample=True):
            ref = decode_jpeg(encode_jpeg(px, precision=12, subsample=True)).astype(int)
        assert np.abs(got - ref).max() == 0


def test_progressive_12bit_grayscale_and_stream_shape():
    import numpy as np

    from robosystems_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    g = (((np.arange(24 * 16) * 59 + 3) % 4096).astype(np.uint16)).reshape(
        24, 16
    )
    data = encode_jpeg_progressive(g, precision=12)
    # stream really is 12-bit SOF2 with Pq=1 DQT
    assert b"\xff\xc2" in data
    sof_at = data.index(b"\xff\xc2")
    assert data[sof_at + 4] == 12  # precision byte
    dqt_at = data.index(b"\xff\xdb")
    assert data[dqt_at + 4] & 0xF0 == 0x10  # Pq=1: 16-bit entries
    base = decode_jpeg(encode_jpeg(g, precision=12)).astype(int)
    assert np.abs(decode_jpeg(data).astype(int) - base).max() == 0


def test_baseline_422_and_411_subsampling():
    """r11: 4:2:2 (2x1) and 4:1:1 (4x1, sampling factor 4 — the
    DV/NTSC shape) round-trip through encode/decode; constants are
    chroma-exact; the stream carries the declared sampling factors."""
    import numpy as np

    from robosystems_spark.operators.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:24, 0:40]
    # truly smooth ramps (no modulo wrap = no high-frequency edges)
    px = np.stack(
        [yy * 3 + xx * 2 + 20, xx * 3 + 30, yy * 4 + 40], axis=2
    ).astype(np.uint8)
    for mode, samp in (("422", 0x21), ("411", 0x41)):
        data = encode_jpeg(px, subsample=mode)
        sof = data.index(b"\xff\xc0")
        assert data[sof + 11] == samp  # luma sampling byte
        out = decode_jpeg(data)
        assert out.shape == px.shape
        # smooth gradient: subsampling + quantization error stays small
        assert np.abs(out.astype(int) - px.astype(int)).max() < 96, mode
    c = np.full((16, 32, 3), 130, np.uint8)
    for mode in ("422", "411"):
        got = decode_jpeg(encode_jpeg(c, subsample=mode)).astype(int)
        assert np.abs(got - 130).max() <= 1, mode
    # restart intervals + 12-bit compose with the new factors
    out = decode_jpeg(encode_jpeg(px, subsample="411", restart_interval=2))
    assert out.shape == px.shape
    px12 = ((np.arange(16 * 32 * 3) * 97 + 5) % 4096).astype(
        np.uint16
    ).reshape(16, 32, 3)
    assert decode_jpeg(
        encode_jpeg(px12, precision=12, subsample="411")
    ).shape == (16, 32, 3)


def test_multiscan_encoders_all_subsamplings_match_baseline():
    """r12: progressive and non-interleaved encoders accept every
    implemented subsampling (420/422/411) and must decode to the
    interleaved baseline's exact pixels (identical quantized
    coefficients by construction); unknown modes still raise."""
    import numpy as np
    import pytest as _pytest

    from robosystems_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_noninterleaved,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (21, 45, 3)).astype(np.uint8)
    for mode in ("420", "422", "411"):
        base = decode_jpeg(encode_jpeg(px, subsample=mode))
        for fn in (encode_jpeg_progressive, encode_jpeg_noninterleaved):
            got = decode_jpeg(fn(px, subsample=mode))
            assert np.array_equal(got, base), (fn.__name__, mode)
    for fn in (encode_jpeg_progressive, encode_jpeg_noninterleaved):
        with _pytest.raises(ValueError):
            fn(px, subsample="440")
