"""Perceptual image dedup (operators/multimodal.py::dhash /
image_neardup_pairs): dHash determinism and gradient semantics on real
netpbm payloads, block-mean resize invariance, quarantine contract,
and the pigeonhole-banded near-dup join (exact copies, small
perturbations inside the Hamming bound, distinct images outside it).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goetl_spark.operators.multimodal import (
    attach_media_column,
    dhash,
    image_neardup_pairs,
)


def _p5(w: int, h: int, pixels: bytes) -> bytes:
    assert len(pixels) == w * h
    return b"P5\n%d %d\n255\n" % (w, h) + pixels


def _media_df(spark, rows):
    """rows: list of (media_id, payload_bytes_or_None, mime)."""
    df = spark.createDataFrame(
        [(i, bytearray(p) if p is not None else None, m)
         for i, p, m in rows],
        "media_id long, payload binary, mime_type string")
    return attach_media_column(df, "payload", mime=F.col("mime_type"),
                               id_col="media_id")


def _gradient_img(w=9, h=8, step=10, noise_at=None):
    px = bytearray((c * step) % 256 for r in range(h) for c in range(w))
    if noise_at is not None:
        px[noise_at] = 255
    return _p5(w, h, bytes(px))


def test_dhash_gradient_and_determinism(spark):
    img = _gradient_img()
    md = _media_df(spark, [(1, img, "image/x-portable-graymap"),
                           (2, img, "image/x-portable-graymap")])
    rows = {r["media_id"]: r for r in dhash(md).collect()}
    assert rows[1]["decode_ok"] and rows[1]["decoder"] == "netpbm"
    assert rows[1]["dhash"] == rows[2]["dhash"]  # identical → equal hash
    # monotonically increasing rows (step=10 < 256/9*?): px[c+1] > px[c]
    # everywhere → every gradient bit 0 → hash 0
    assert rows[1]["dhash"] == 0

    dec = _p5(9, 8, bytes(bytearray((80 - c * 10) % 256
                                    for r in range(8) for c in range(9))))
    md2 = _media_df(spark, [(3, dec, "image/x-portable-graymap")])
    h3 = dhash(md2).collect()[0]["dhash"]
    # strictly decreasing rows → all 64 gradient bits set → uint64 max
    assert h3 == -1  # 0xFFFFFFFFFFFFFFFF as signed long


def test_dhash_resize_invariance(spark):
    """A 2x upscale of the same scene block-means back to the same
    grid, so the hash survives resizing — the point of dHash."""
    small = _gradient_img(9, 8)
    big = _p5(18, 16, bytes(bytearray(
        ((c // 2) * 10) % 256 for r in range(16) for c in range(18))))
    md = _media_df(spark, [(1, small, "image/x-portable-graymap"),
                           (2, big, "image/x-portable-graymap")])
    rows = {r["media_id"]: r["dhash"] for r in dhash(md).collect()}
    assert rows[1] == rows[2]


def test_dhash_quarantine(spark):
    md = _media_df(spark, [
        (1, None, "image/x-portable-graymap"),
        (2, b"\x89PNGnotreally", "image/png"),
        (3, _p5(9, 8, b"A" * 72)[:-1], "image/x-portable-graymap"),
    ])
    rows = {r["media_id"]: r for r in dhash(md).collect()}
    assert not rows[1]["decode_ok"] and rows[1]["decoder"] == "none"
    assert not rows[2]["decode_ok"] and rows[2]["decoder"] == "missing-codec"
    assert not rows[3]["decode_ok"] and rows[3]["decoder"] == "netpbm-truncated"
    assert all(rows[i]["dhash"] is None for i in (1, 2, 3))


def test_image_neardup_pairs(spark):
    base = _gradient_img()
    near = _gradient_img(noise_at=40)     # one hot pixel → few bits flip
    # decreasing-luma RGB scene: its grid has 16 gradient bits set,
    # far outside the bound (an INCREASING scene would hash 0 like
    # base - dHash is a gradient-sign fingerprint)
    p6 = b"P6\n3 2\n255\n" + bytes(reversed(range(18)))
    far = _p5(9, 8, bytes(bytearray(255 if (r + c) % 2 else 0
                                    for r in range(8) for c in range(9))))
    md = _media_df(spark, [
        (1, base, "image/x-portable-graymap"),
        (2, base, "image/x-portable-graymap"),   # exact copy
        (3, near, "image/x-portable-graymap"),   # near dup
        (4, far, "image/x-portable-graymap"),    # different
        (5, p6, "image/x-portable-pixmap"),      # decodes, different
        (6, None, "image/x-portable-graymap"),   # quarantined, excluded
    ])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_neardup_pairs(md, max_hamming=4).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 4
    assert not any(4 in p or 5 in p or 6 in p for p in pairs)


def test_grid_validation(spark):
    md = _media_df(spark, [(1, _gradient_img(), "image/x-portable-graymap")])
    with pytest.raises(ValueError):
        dhash(md, grid=(10, 8))   # 8*9=72 bits > 64
    with pytest.raises(ValueError):
        image_neardup_pairs(md, max_hamming=64)


def test_dhash_small_grid(spark):
    """grid=(5,4): 16 bits; a decreasing 5x4 native image sets all of
    them (hash 0xFFFF), an increasing one none."""
    inc = _p5(5, 4, bytes(bytearray(c * 10 for r in range(4)
                                    for c in range(5))))
    dec = _p5(5, 4, bytes(bytearray(200 - c * 10 for r in range(4)
                                    for c in range(5))))
    md = _media_df(spark, [(1, inc, "image/x-portable-graymap"),
                           (2, dec, "image/x-portable-graymap")])
    rows = {r["media_id"]: r["dhash"]
            for r in dhash(md, grid=(5, 4)).collect()}
    assert rows[1] == 0 and rows[2] == 0xFFFF


def _noise_img(seed: int, n: int = 32, shift: int = 0) -> bytes:
    """Deterministic md5-noise n*n P5 image; pixels in [10+shift,
    89+shift] — no clipping, so a uniform shift is exact."""
    import hashlib

    px = bytearray()
    for i in range(n * n):
        d = hashlib.md5(f"{seed}:{i}".encode()).digest()
        px.append((d[0] + (d[1] << 8)) % 80 + 10 + shift)
    return _p5(n, n, bytes(px))


def test_phash_brightness_invariance_and_determinism(spark):
    """The mean-centered integer DCT makes pHash EXACTLY invariant to a
    uniform brightness shift (no clipping) — the global edit that flips
    many dHash gradient bits on smooth scenes."""
    from goetl_spark.operators.multimodal import dhash, phash

    base = _noise_img(7)
    bright = _noise_img(7, shift=30)
    other = _noise_img(8)
    md = _media_df(spark, [(1, base, "image/x-portable-graymap"),
                           (2, base, "image/x-portable-graymap"),
                           (3, bright, "image/x-portable-graymap"),
                           (4, other, "image/x-portable-graymap")])
    rows = {r["media_id"]: r for r in phash(md).collect()}
    assert all(rows[i]["decode_ok"] for i in (1, 2, 3, 4))
    assert rows[1]["phash"] == rows[2]["phash"]        # deterministic
    assert rows[1]["phash"] == rows[3]["phash"]        # shift-invariant
    h14 = bin((rows[1]["phash"] ^ rows[4]["phash"]) & ((1 << 64) - 1))
    assert h14.count("1") > 8                          # distinct scene far
    # 63-bit hash: bit 63 never set
    assert 0 <= rows[1]["phash"] < (1 << 63)


def test_phash_resize_invariance(spark):
    """A 2x nearest-neighbor upscale block-means back to the same 32x32
    grid, so the pHash survives resizing like dHash does."""
    from goetl_spark.operators.multimodal import phash

    import hashlib

    n = 32
    small_px = bytearray()
    for i in range(n * n):
        d = hashlib.md5(f"42:{i}".encode()).digest()
        small_px.append(d[0] % 80 + 10)
    big_px = bytearray()
    for r in range(2 * n):
        for c in range(2 * n):
            big_px.append(small_px[(r // 2) * n + (c // 2)])
    md = _media_df(spark, [
        (1, _p5(n, n, bytes(small_px)), "image/x-portable-graymap"),
        (2, _p5(2 * n, 2 * n, bytes(big_px)), "image/x-portable-graymap")])
    rows = {r["media_id"]: r["phash"] for r in phash(md).collect()}
    assert rows[1] == rows[2]


def test_phash_quarantine_and_guards(spark):
    from goetl_spark.operators.multimodal import (
        image_neardup_pairs_phash, phash)

    md = _media_df(spark, [
        (1, None, "image/x-portable-graymap"),
        (2, b"\x89PNGnotreally", "image/png"),
        (3, _noise_img(1)[:-1], "image/x-portable-graymap"),
    ])
    rows = {r["media_id"]: r for r in phash(md).collect()}
    assert not rows[1]["decode_ok"] and rows[1]["decoder"] == "none"
    assert not rows[2]["decode_ok"] and rows[2]["decoder"] == "missing-codec"
    assert not rows[3]["decode_ok"] and rows[3]["decoder"] == "netpbm-truncated"
    assert all(rows[i]["phash"] is None for i in (1, 2, 3))
    with pytest.raises(ValueError):
        phash(md, hash_grid=1)
    with pytest.raises(ValueError):
        phash(md, mean_grid=4, hash_grid=8)
    with pytest.raises(ValueError):
        phash(md, mean_grid=32, hash_grid=9)  # 80 bits > 64
    with pytest.raises(ValueError):
        image_neardup_pairs_phash(md, max_hamming=64)


def test_image_neardup_pairs_phash(spark):
    """Banded pHash pairs: exact copies and brightness-shifted copies
    pair at hamming 0; distinct noise scenes stay out; quarantined rows
    excluded. Also the headline over dHash: the shifted copy of a
    SMOOTH scene pairs under pHash but NOT under dHash with the same
    bound when the shift perturbs many gradient signs."""
    from goetl_spark.operators.multimodal import image_neardup_pairs_phash

    md = _media_df(spark, [
        (1, _noise_img(7), "image/x-portable-graymap"),
        (2, _noise_img(7), "image/x-portable-graymap"),
        (3, _noise_img(7, shift=25), "image/x-portable-graymap"),
        (4, _noise_img(9), "image/x-portable-graymap"),
        (5, None, "image/x-portable-graymap"),
    ])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_neardup_pairs_phash(md, max_hamming=4).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0 and pairs[(2, 3)] == 0
    assert not any(4 in p or 5 in p for p in pairs)


def _wav(samples_16, rate=8000):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples_16)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _envelope_wav(seed: int, gain: int = 1, n_frames: int = 65,
                  flen: int = 8) -> bytes:
    """Alternating-sign constant-magnitude frames; per-frame amplitude
    is md5 noise keyed by (seed, frame) — the energy-delta sign pattern
    is random per seed and exactly preserved under integer gain."""
    import hashlib

    samples = []
    for f in range(n_frames):
        d = hashlib.md5(f"{seed}:{f}".encode()).digest()
        a = ((d[0] + (d[1] << 8)) % 2000 + 100) * gain
        samples.extend(a if i % 2 == 0 else -a for i in range(flen))
    return _wav(samples)


def test_audio_dhash_gain_invariance(spark):
    """Volume changes scale every frame energy by g^2 — the envelope
    hash is identical; distinct envelopes are far apart."""
    from goetl_spark.operators.multimodal import audio_dhash

    md = _media_df(spark, [
        (1, _envelope_wav(7), "audio/wav"),
        (2, _envelope_wav(7, gain=4), "audio/wav"),
        (3, _envelope_wav(9), "audio/wav"),
    ])
    rows = {r["media_id"]: r for r in audio_dhash(md).collect()}
    assert all(rows[i]["decode_ok"] and rows[i]["decoder"] == "wav"
               for i in (1, 2, 3))
    assert rows[1]["ahash"] == rows[2]["ahash"]
    far = bin((rows[1]["ahash"] ^ rows[3]["ahash"]) & ((1 << 64) - 1))
    assert far.count("1") > 8


def test_audio_dhash_quarantine_and_guards(spark):
    from goetl_spark.operators.multimodal import (
        audio_dhash, audio_neardup_pairs)

    md = _media_df(spark, [
        (1, None, "audio/wav"),
        (2, b"\x00notriff", "audio/mp3"),
        (3, _wav([0] * 16)[:20], "audio/wav"),      # truncated chunks
        (4, _wav([5] * 8), "audio/wav"),            # 8 samples, 65 frames
    ])
    rows = {r["media_id"]: r for r in audio_dhash(md).collect()}
    assert rows[1]["decoder"] == "none"
    assert rows[2]["decoder"] == "missing-codec"
    assert rows[3]["decoder"] == "wav-corrupt"
    assert rows[4]["decoder"] == "too-short"
    assert all(not rows[i]["decode_ok"] and rows[i]["ahash"] is None
               for i in (1, 2, 3, 4))
    with pytest.raises(ValueError):
        audio_dhash(md, n_frames=66)
    with pytest.raises(ValueError):
        audio_neardup_pairs(md, max_hamming=64)


def test_audio_neardup_pairs(spark):
    """Gain-variant copies pair at hamming 0; distinct envelopes and
    quarantined rows stay out."""
    from goetl_spark.operators.multimodal import audio_neardup_pairs

    md = _media_df(spark, [
        (1, _envelope_wav(7), "audio/wav"),
        (2, _envelope_wav(7, gain=2), "audio/wav"),
        (3, _envelope_wav(7, gain=4), "audio/wav"),
        (4, _envelope_wav(9), "audio/wav"),
        (5, None, "audio/wav"),
    ])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in audio_neardup_pairs(md, max_hamming=4).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0 and pairs[(2, 3)] == 0
    assert not any(4 in p or 5 in p for p in pairs)


def test_banded_pairs_use_real_hash_width(spark):
    """Narrow hashes band over their REAL width: a 16-bit dHash with
    max_hamming=4 still finds the near pair (lossless pigeonhole over
    16 bits), and a too-tight width (more bands than bits) raises
    instead of silently degenerating to all-pairs on constant bands."""
    from goetl_spark.operators.multimodal import (
        audio_neardup_pairs, image_neardup_pairs)

    inc = _p5(5, 4, bytes(bytearray(c * 10 for r in range(4)
                                    for c in range(5))))
    inc2 = _p5(5, 4, bytes(bytearray(
        (c * 10 if (r, c) != (0, 0) else 45) for r in range(4)
        for c in range(5))))
    dec = _p5(5, 4, bytes(bytearray(200 - c * 10 for r in range(4)
                                    for c in range(5))))
    md = _media_df(spark, [(1, inc, "image/x-portable-graymap"),
                           (2, inc2, "image/x-portable-graymap"),
                           (3, dec, "image/x-portable-graymap")])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             image_neardup_pairs(md, max_hamming=4, grid=(5, 4)).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert not any(3 in p for p in pairs)          # 16 bits apart
    with pytest.raises(ValueError):
        audio_neardup_pairs(md, max_hamming=4, n_frames=5)  # 5 bands > 4 bits
