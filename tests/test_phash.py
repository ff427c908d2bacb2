"""Perceptual image hashing (operators/phash.py): integer pHash
properties, cross-codec re-encode invariance (the point of the
operator), lossy-JPEG robustness, Hamming-LSH banding losslessness, and
the WebP RGB-row normalization."""

import pytest

from pmp_analytics_spark.operators.phash import (
    DCT8X32,
    PHASH_BITS,
    decode_pixels_bgr,
    phash64_bgr,
    phash_pairs,
)


def _pixels(seed: int, n: int = 32):
    """Formula BGR rows with headroom (8..206) so shifts never clamp."""
    rows = []
    for i in range(n):
        row = bytearray()
        for j in range(n):
            r = 8 + ((i * (2 + seed % 3) + j * (3 + seed % 5)) % 160)
            g = 16 + ((i + j) * (1 + seed % 4)) % 150 + ((i * j) % 23)
            b = 24 + (i * i + 2 * j + seed * 11) % 140
            row += bytes((b, g, r))
        rows.append(bytes(row))
    return rows


def test_phash_reencode_invariance_png_bmp_webp():
    """The SAME pixels through PNG, BMP, and WebP-VP8L (all lossless)
    hash IDENTICALLY — including the WebP path, whose decoder returns
    RGB rows and must be normalized to BGR before grayscale."""
    from pmp_analytics_spark.multimodal import _bmp_encode, _png_encode
    from pmp_analytics_spark.webp import webp_encode

    for seed in (1, 7, 19):
        bgr = _pixels(seed)
        rgb = [
            bytes(ch for x in range(32) for ch in (r[3 * x + 2], r[3 * x + 1], r[3 * x]))
            for r in bgr
        ]
        hashes = set()
        for payload in (
            _png_encode(32, 32, bgr),
            _bmp_encode(32, 32, bgr),
            webp_encode(32, 32, rgb),
        ):
            w, h, rows = decode_pixels_bgr(payload)
            assert (w, h) == (32, 32)
            assert rows == bgr  # lossless AND channel-order-normalized
            hashes.add(phash64_bgr(w, h, rows))
        assert len(hashes) == 1, seed


def test_phash_jpeg_reencode_stays_near():
    """Lossy JPEG re-encode (quality 85) of the same image lands within
    the pairing threshold (Hamming <= 6) of the lossless hash — the
    robustness property that makes pHash a near-dup key rather than a
    checksum. 64x64 so the 8x8 JPEG blocks tile evenly."""
    from pmp_analytics_spark.jpeg import jpeg_decode, jpeg_encode

    for seed in (2, 11):
        bgr = _pixels(seed, n=64)
        base = phash64_bgr(64, 64, bgr)
        w, h, rows = jpeg_decode(jpeg_encode(64, 64, bgr, quality=85))
        assert (w, h) == (64, 64)
        jp = phash64_bgr(w, h, rows)
        assert bin(base ^ jp).count("1") <= 6, seed


def test_phash_brightness_invariance_exact():
    """Uniform brightness shift changes ONLY the (dropped) DC term:
    every non-DC row of the scaled cosine table sums to exactly 0 (the
    antisymmetric rounding cancels pairwise), so the hash is EXACTLY
    invariant — not approximately."""
    assert [sum(r) for r in DCT8X32[1:]] == [0] * 7
    bgr = _pixels(5)
    shifted = [bytes(min(255, c + 30) for c in row) for row in bgr]
    assert max(c for row in bgr for c in row) + 30 <= 255  # no clamp
    assert phash64_bgr(32, 32, bgr) == phash64_bgr(32, 32, shifted)


def test_phash_rejects_tiny_images():
    with pytest.raises(ValueError, match="needs >= 32x32"):
        phash64_bgr(16, 16, [b"\x00" * 48] * 16)


def test_phash_hash_is_nonnegative_63_bits():
    h = phash64_bgr(32, 32, _pixels(3))
    assert 0 <= h < (1 << PHASH_BITS)


def test_phash_pairs_banding_is_lossless(spark):
    """7 bands x 9 bits over 63 bits: any pair within Hamming 6 shares a
    clean band (pigeonhole), so phash_pairs equals the brute-force join
    — verified against an adversarial signature set that plants pairs at
    every distance 0..8 across ALL band positions."""
    import itertools

    from pmp_analytics_spark.sources.local import local_df

    base = 0x155555555555555  # alternating bits, 63-bit
    sigs = [(0, base)]
    nid = 1
    for d in range(9):  # plant a partner at each distance 0..8
        for offset in (0, 9, 27, 54):  # spread flips across bands
            flipped = base
            for k in range(d):
                flipped ^= 1 << ((offset + k * 7) % PHASH_BITS)
            sigs.append((nid, flipped))
            nid += 1
    df = local_df(spark, sigs, "doc_id long, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_pairs(df, max_hamming=6, bands=7).collect()
    }
    want = set()
    for (ia, ha), (ib, hb) in itertools.combinations(sigs, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 6:
            want.add((min(ia, ib), max(ia, ib), d))
    assert got == want


def test_phash_pairs_rejects_lossy_banding():
    with pytest.raises(ValueError, match="lossless banding"):
        phash_pairs(None, max_hamming=7, bands=7)


def test_phash_fixture_groups_collapse(spark):
    """The query fixture: within every group, the three lossless
    re-encodes (PNG/BMP/WebP) hash identically; the perturbed variant
    sits a small Hamming distance away (bounded — sparse +40 on ~1% of
    pixels moves low-freq coefficients only slightly)."""
    from pmp_analytics_spark.queries.analytic import _phash_fixture_payload

    for g in (0, 3, 17):
        hs = []
        for v in range(4):
            codec, n, payload = _phash_fixture_payload(4 * g + v)
            w, h, rows = decode_pixels_bgr(payload)
            hs.append(phash64_bgr(w, h, rows))
        assert hs[0] == hs[1] == hs[2], g
        assert bin(hs[0] ^ hs[3]).count("1") <= 10, g


def test_dhash_reencode_and_brightness_invariance():
    """dHash shares pHash's invariances by construction: identical for
    lossless re-encodes (same decoded pixels) and EXACTLY invariant to
    uniform brightness shifts (both compared cells move together)."""
    from pmp_analytics_spark.operators.phash import dhash63_bgr

    bgr = _pixels(9)
    h = dhash63_bgr(32, 32, bgr)
    assert 0 <= h < (1 << PHASH_BITS)
    shifted = [bytes(min(255, c + 30) for c in row) for row in bgr]
    assert dhash63_bgr(32, 32, shifted) == h
    with pytest.raises(ValueError, match="needs >="):
        dhash63_bgr(8, 8, [b"\x00" * 24] * 8)


def test_dhash_jpeg_reencode_stays_near():
    from pmp_analytics_spark.jpeg import jpeg_decode, jpeg_encode
    from pmp_analytics_spark.operators.phash import dhash63_bgr

    bgr = _pixels(4, n=64)
    base = dhash63_bgr(64, 64, bgr)
    w, h, rows = jpeg_decode(jpeg_encode(64, 64, bgr, quality=85))
    assert bin(base ^ dhash63_bgr(w, h, rows)).count("1") <= 6
