"""Perceptual-hash invariances (operators/multimodal.py aHash)."""

from __future__ import annotations

import numpy as np

from text_sentiment_analysis_in_hadoop_and_spark_spark.operators.multimodal import (
    ahash_bits,
    decode_bmp_pixels,
    make_bmp,
    q_mm_ahash_dedup,
)


def _gradient(w=32, h=24, base=0):
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    return (base + x + y + np.zeros((h, w, 3))).astype(np.uint8)


def test_identical_images_collide():
    a = ahash_bits(_gradient())
    b = ahash_bits(_gradient())
    assert a == b


def test_brightness_shift_invariant():
    # +40 exposure: different bytes, same structure → same hash
    assert ahash_bits(_gradient(base=0)) == ahash_bits(_gradient(base=40))


def test_structural_change_separates():
    grad = _gradient()
    flipped = grad[::-1].copy()  # vertical mirror: structure differs
    checker = (
        ((np.indices((24, 32)).sum(axis=0) % 2) * 255)
        .astype(np.uint8)[:, :, None]
        .repeat(3, axis=2)
    )
    h = ahash_bits(grad)
    assert h != ahash_bits(checker)
    assert h != ahash_bits(flipped)


def test_small_noise_robust():
    # mild sensor noise (+2 on one pixel) cannot flip a block bit;
    # (a saturated 255 spike CAN flip a near-threshold block — aHash
    # robustness is statistical, which is why production systems
    # band-join on Hamming distance rather than exact equality)
    noisy = _gradient().astype(np.int64)
    noisy[5, 5] += 2
    assert ahash_bits(_gradient()) == ahash_bits(noisy.astype(np.uint8))


def test_sub_grid_image_shortcut_is_exact():
    # r12: images smaller than the 8×8 grid take the O(1) shortcut.
    # It must agree with the full block-mean path, whose empty
    # array_split blocks yield NaN means → NaN grid mean → every
    # `block > NaN` compare False → hash 0.  Pin both the shortcut
    # value and the full-path equivalence on the boundary shapes.
    import warnings

    def full_path(rgb):
        gray = rgb.astype(np.float64).mean(axis=2)
        blocks = np.array(
            [
                [b.mean() for b in np.array_split(row, 8, axis=1)]
                for row in np.array_split(gray, 8, axis=0)
            ]
        )
        bits = (blocks > blocks.mean()).ravel()
        out = 0
        for i, b in enumerate(bits):
            if b:
                out |= 1 << i
        return out

    rng = np.random.default_rng(7)
    for shape in [(3, 4), (6, 8), (7, 8), (8, 7), (7, 64), (64, 7)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # NaN-mean RuntimeWarning
            assert full_path(img) == 0
        assert ahash_bits(img) == 0
    # at-grid shapes must NOT shortcut: nonzero structure hashes
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    assert ahash_bits(img) == full_path(img)


def test_roundtrip_through_real_bmp_decoder():
    # the query path: make_bmp → decode_bmp_pixels → ahash; two docs
    # with identical (base, w, h, orientation) params collide
    a = ahash_bits(decode_bmp_pixels(make_bmp(1)))
    b = ahash_bits(decode_bmp_pixels(make_bmp(1)))
    assert a == b


def test_query_families_account_for_all_images(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": pa.array(["t"] * 40),
                "lang": pa.array(["en"] * 40),
                "source": pa.array(["s0"] * 40),
                "n_chars": pa.array([1] * 40, pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    rows = q_mm_ahash_dedup(spark, str(d)).collect()
    assert sum(r["n_images"] for r in rows) == 40
    # brightness-invariance: families absorb byte-distinct payloads
    assert any(r["n_distinct_payloads"] > 1 for r in rows)
