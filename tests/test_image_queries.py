"""x125 image-feature rollup (math-asserted) + markup-family query
properties beyond the oracle (x126 outlinks, x127 profile)."""

from __future__ import annotations

import numpy as np
import pytest

from server_spark.registry import queries

SF = "/root/testdata/sf0.001"


def test_x125_channel_means_match_closed_form(spark):
    """The decoded channel means must equal the synthetic pattern's
    math — proof the PIPELINE (mint → PNG/BMP encode → decode →
    stats) preserves pixels, not just shapes. synthetic_image: R is
    a pure x-gradient, G a pure y-gradient (id-independent), B is
    (x*y + 37*id) % 256."""
    rows = {
        r["leg"]: r for r in queries()["x125_image_features"](spark, SF).collect()
    }
    assert set(rows) == {"png", "bmp", "text"}

    h, w = 16, 24
    exp_r = np.mean([(x * 255) // (w - 1) for x in range(w)])
    exp_g = np.mean([(y * 255) // (h - 1) for y in range(h)])
    for leg in ("png", "bmp"):
        assert rows[leg]["n_failed"] == 0
        assert rows[leg]["avg_r"] == pytest.approx(exp_r, abs=1e-3)
        assert rows[leg]["avg_g"] == pytest.approx(exp_g, abs=1e-3)
        assert 0 < rows[leg]["avg_contrast"] < 128

    # the B channel varies per id: check the exact per-leg average
    def exp_b(mids):
        vals = []
        for m in mids:
            xy = np.outer(np.arange(h), np.arange(w))
            vals.append(((xy + 37 * m) % 256).mean())
        return float(np.mean(vals))

    png_ids = [i for i in range(500) if i % 3 == 0]
    assert rows["png"]["avg_b"] == pytest.approx(exp_b(png_ids), abs=1e-3)
    assert rows["png"]["n_images"] == len(png_ids)

    # undecodable leg: all quarantined, no stats
    assert rows["text"]["n_failed"] == rows["text"]["n_images"]
    assert rows["text"]["avg_r"] is None


def test_x126_outlink_degrees(spark):
    got = {
        r["href"]: r for r in queries()["x126_outlink_stats"](spark, SF).collect()
    }
    # fixed chrome links appear once per page
    for chrome in ("/", "/tags", "/login", "/privacy", "/terms",
                   "/contact", "#t", "#f", "#l"):
        assert got[chrome]["n_refs"] == 500
        assert got[chrome]["n_docs"] == 500
    # per-doc outlinks: 500 docs over 50 targets → 10 each
    assert got["/doc/0"]["n_refs"] == 10
    assert sum(
        r["n_refs"] for h, r in got.items() if h.startswith("/doc/")
    ) == 500


def test_x128_phash_finds_exactly_the_brightness_variants(spark):
    """Perceptual near-dup ground truth is fully known: doc i's image
    is base (i%20) under a per-doc brightness scale. The banded
    dHash pipeline must find EVERY within-base pair (recall 1.0 —
    brightness scaling preserves gradient signs up to rounding) and
    NO cross-base pair (precision 1.0 — random bases differ in ~32
    of 64 bits). Also pins the reason perceptual hashing exists:
    variant PAYLOAD bytes differ (sha-distinct) while the dHash
    matches within threshold."""
    rows = queries()["x128_image_phash_neardup"](spark, SF).collect()
    got = {(r["media_a"], r["media_b"]) for r in rows}
    want = {
        (a, b)
        for a in range(500)
        for b in range(a + 1, 500)
        if a % 20 == b % 20
    }
    assert got == want
    assert all(r["hamming"] <= 10 for r in rows)

    # byte-level hashing could NOT find these: same base, different
    # brightness scale → different payload bytes
    import numpy as np

    from server_spark.multimodal.image import encode_png

    def payload(mid):
        rng = np.random.RandomState(mid % 20)
        img = rng.randint(0, 256, size=(16, 24, 3), dtype=np.int32)
        img = ((img * (100 - 4 * (mid % 7))) // 100).clip(0, 255)
        return encode_png(img.astype(np.uint8))

    # same base (1 ≡ 21 mod 20), different brightness (1 ≢ 21 mod 7)
    assert payload(1) != payload(21)
    assert (1, 21) in got


def test_x129_audio_fingerprint_separates_bases(spark):
    """Acoustic near-dup ground truth is fully known: doc i's clip is
    AM-base (i%20) under a per-doc gain and a small per-doc noise
    floor. The envelope fingerprint must: (a) emit ZERO cross-base
    pairs (precision 1.0 — distinct modulation rates give ~random
    bit patterns); (b) find nearly every within-base pair (tiny
    banding miss rate is authentic LSH behavior, bounded here);
    (c) exhibit gain-invariance — many variant pairs at Hamming 0
    despite byte-distinct PCM payloads."""
    rows = queries()["x129_audio_fingerprint_neardup"](spark, SF).collect()
    got = {(r["media_a"], r["media_b"]) for r in rows}
    want = {
        (a, b)
        for a in range(500)
        for b in range(a + 1, 500)
        if a % 20 == b % 20
    }
    assert got <= want                      # precision 1.0
    assert len(got) >= 0.995 * len(want)    # recall (banding misses only)
    assert all(r["hamming"] <= 10 for r in rows)
    assert sum(1 for r in rows if r["hamming"] == 0) > 1000  # gain-invariant core


def test_x136_blockiness_separates_quality_classes(spark):
    """The no-reference blockiness score must separate the planted
    quality classes: every doc decodes (real baseline JPEG decode),
    and the over-compressed class scores strictly higher per class
    mean with a clear margin."""
    rows = queries()["x136_jpeg_blockiness"](spark, SF).collect()
    assert len(rows) == 500 and all(r["ok"] for r in rows)
    by_cls: dict[str, list[float]] = {}
    for r in rows:
        by_cls.setdefault(r["quality_class"], []).append(r["blockiness"])
    assert len(by_cls["light"]) == 250 and len(by_cls["crushed"]) == 250
    light = float(np.mean(by_cls["light"]))
    crushed = float(np.mean(by_cls["crushed"]))
    assert crushed > light * 1.2


def test_x127_profile_consistent_with_x124(spark):
    prof = queries()["x127_boilerplate_profile"](spark, SF).collect()
    per_doc = queries()["x124_markup_extract"](spark, SF)
    totals = per_doc.groupBy().sum("kept_words", "total_words").collect()[0]
    assert sum(r["n_docs"] for r in prof) == 500
    assert sum(r["kept_words"] for r in prof) == totals[0]
    assert sum(r["total_words"] for r in prof) == totals[1]
    for r in prof:
        assert 0.0 < r["boiler_word_share"] < 1.0
