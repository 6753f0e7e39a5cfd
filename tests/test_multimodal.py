"""Multimodal plumbing tests: binary columns, Arrow-batched decode stubs,
frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.multimodal import (
    deterministic_fake,
    documents_as_media,
    extract_features,
    frame_sample,
)
from gisaid_pipeline_functions_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return documents_as_media(load_table(spark, sf_dir, "documents"))


def test_media_table_shape(media):
    row = media.first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["kind"] in ("image", "audio", "video")
    assert row["n_bytes"] == len(row["content"])


def test_extract_features_deterministic(media):
    out = extract_features(media).orderBy("media_id")
    rows = out.collect()
    assert len(rows) == media.count()
    r0 = rows[0]
    assert len(r0["features"]) == 16
    assert abs(sum(r0["features"]) - 1.0) < 1e-6  # histogram normalizes
    # cross-check one row against the pure-Python stub
    payload = media.filter(F.col("media_id") == r0["media_id"]).first()["content"]
    expected = deterministic_fake(bytes(payload))
    assert r0["width"] == expected["width"]
    assert [round(x, 5) for x in r0["features"]] == [
        round(x, 5) for x in expected["features"]
    ]


def test_decode_stub_raises_without_codec(media):
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(media, decode=None).collect()


def test_frame_sampling(media):
    frames = frame_sample(media, every_n_bytes=64)
    rows = frames.groupBy("media_id").count().collect()
    assert len(rows) > 0
    one = frames.first()
    assert len(one["frame_bytes"]) <= 64
    # every sampled media is a video
    kinds = frames.join(media, "media_id").select("kind").distinct().collect()
    assert [k["kind"] for k in kinds] == ["video"]


def test_gp_header_decode_roundtrip(spark):
    """media_with_header frames real binary headers natively; the non-stub
    decode branch must recover the exact dims via struct.unpack."""
    from gisaid_pipeline_functions_spark.operators.multimodal import (
        decode_gp_header,
        extract_features,
        media_with_header,
    )

    docs = spark.createDataFrame(
        [(i, "text for doc %d" % i) for i in (0, 1, 639, 640, 1000)],
        "doc_id long, text string",
    )
    media = media_with_header(docs)
    out = {
        r["media_id"]: (r["width"], r["height"], r["n_bytes"])
        for r in extract_features(media, decode=decode_gp_header).collect()
    }
    for i in (0, 1, 639, 640, 1000):
        w, h, n = out[i]
        assert w == i % 640 + 1 and h == i % 480 + 1
        assert n == 10 + len("text for doc %d" % i)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad GP magic"):
        decode_gp_header(b"XXsomething")


def test_resize_media_stride_and_hash(spark):
    import hashlib
    import math

    from gisaid_pipeline_functions_spark.operators.multimodal import (
        media_with_header,
        resize_media,
    )

    texts = {0: "abcdefghij", 3: "odd", 7: "x"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = {r["media_id"]: r for r in resize_media(media_with_header(docs), factor=2).collect()}
    for i, t in texts.items():
        body = t.encode()[::2]
        r = out[i]
        assert r["out_w"] == math.ceil((i % 640 + 1) / 2)
        assert r["out_h"] == math.ceil((i % 480 + 1) / 2)
        assert r["out_bytes"] == len(body)
        assert r["out_md5"] == hashlib.md5(body).hexdigest()


def test_phash_fingerprint_matches_python_reference(spark):
    from gisaid_pipeline_functions_spark.operators.multimodal import (
        media_with_header,
        phash_fingerprints,
    )

    texts = {
        0: "the quick brown fox jumps over the lazy dog " * 4,
        1: "completely different content with other words here " * 4,
        2: "zz" * 40,  # uniform bytes: all comparisons false -> phash 0
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = {
        r["media_id"]: r["phash"]
        for r in phash_fingerprints(
            media_with_header(docs), skip_header_bytes=10
        ).collect()
    }

    def ref_phash(t: str) -> int:
        b = t.encode()
        L = len(b) // 32
        cs = [sum(b[s * L : s * L + L]) for s in range(32)]
        return sum(
            (1 << (31 - j)) for j in range(1, 32) if cs[j - 1] > cs[j]
        )

    for i, t in texts.items():
        assert out[i] == ref_phash(t), i
    assert out[2] == 0


def test_phash_near_dups_finds_small_edit_not_distinct_docs(spark):
    from gisaid_pipeline_functions_spark.operators.multimodal import (
        media_with_header,
        phash_near_dups,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 8
    # one-char edit: block sums shift by one unit in one block — the
    # dHash gradient bits barely move (that's the point of pHash)
    near = base.replace("lazy", "hazy", 1)
    other = "entirely unrelated text about ships and harbors at dawn today " * 8
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, other)], "doc_id long, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dups(
            media_with_header(docs), skip_header_bytes=10, threshold=3
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert all(2 not in p for p in pairs)


def test_bmp_encode_parse_roundtrip_exhaustive_dims():
    """The real BMP writer/parser pair is the identity on the raster for
    every (width mod 4) padding class and bottom-up row count — covers
    all four stride-padding cases the spec's 4-byte row alignment
    creates."""
    from gisaid_pipeline_functions_spark.operators.multimodal import (
        encode_bmp_gray,
        parse_bmp_gray,
    )

    for w in range(1, 9):  # strides 3..24 → pads 1,2,3,0,...
        for h in (1, 2, 5):
            px = bytes((i * 37 + w * 11 + h) % 256 for i in range(w * h))
            bmp = encode_bmp_gray(w, h, px)
            # real-file invariants: magic, declared size, 54-byte offset
            assert bmp[:2] == b"BM"
            assert len(bmp) == 54 + ((w * 3 + (4 - w * 3 % 4) % 4)) * h
            pw, ph, out = parse_bmp_gray(bmp)
            assert (pw, ph, out) == (w, h, px)


def test_bmp_parser_rejects_non_bmp_and_unsupported():
    from gisaid_pipeline_functions_spark.operators.multimodal import (
        encode_bmp_gray,
        parse_bmp_gray,
    )

    with pytest.raises(ValueError, match="magic"):
        parse_bmp_gray(b"GP" + b"\x00" * 60)
    bad_bpp = bytearray(encode_bmp_gray(2, 2, bytes(4)))
    bad_bpp[28] = 32  # declare 32bpp
    with pytest.raises(ValueError, match="unsupported"):
        parse_bmp_gray(bytes(bad_bpp))


def test_bmp_decode_through_extract_features_injection(spark, sf_dir):
    """decode_bmp_features drops into the extract_features stub boundary:
    real dims and a pixel-value histogram from DECODED pixels."""
    from gisaid_pipeline_functions_spark.operators.multimodal import (
        _bmp_dims,
        decode_bmp_features,
        documents_as_bmp,
        extract_features,
    )

    media = documents_as_bmp(load_table(spark, sf_dir, "documents"))
    out = extract_features(media, decode=decode_bmp_features)
    rows = {r["media_id"]: r for r in out.collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert rows.keys() == docs.keys()
    for did, r in list(rows.items())[:25]:
        w, h = _bmp_dims(did)
        assert (r["width"], r["height"]) == (w, h)
        body = docs[did].encode()
        px = bytes(body[i % len(body)] for i in range(w * h))
        hist = [0] * 16
        for b in px:
            hist[b >> 4] += 1
        assert [round(v, 6) for v in r["features"]] == [
            round(c / len(px), 6) for c in hist
        ]


def test_bmp_dhash_matches_python_reference_and_finds_pixel_edit(spark):
    """The r8 pixel dHash (decode -> 8x8 NN thumbnail -> 56 gradient
    bits): bit-exact vs a from-scratch Python replay, robust to a
    single-pixel edit, and blind to header/padding differences by
    construction (it hashes DECODED pixels)."""
    from gisaid_pipeline_functions_spark.operators.multimodal import (
        bmp_dhash_fingerprints,
        bmp_phash_near_dups,
        encode_bmp_gray,
    )

    import random

    rng = random.Random(7)
    w, h = 23, 14  # stride class w%4==3, bigger than the 8x8 grid
    base_px = bytes(rng.randrange(256) for _ in range(w * h))
    near_px = bytearray(base_px)
    near_px[5] ^= 1  # one-pixel, one-unit edit
    other_px = bytes(rng.randrange(256) for _ in range(w * h))
    rows = [
        (0, encode_bmp_gray(w, h, base_px)),
        (1, encode_bmp_gray(w, h, bytes(near_px))),
        (2, encode_bmp_gray(w, h, other_px)),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")

    def ref_dhash(px: bytes) -> int:
        t = [
            px[(y * h // 8) * w + (x * w // 8)]
            for y in range(8)
            for x in range(8)
        ]
        ph = 0
        for y in range(8):
            for x in range(7):
                ph = ph * 2 + (1 if t[y * 8 + x] > t[y * 8 + x + 1] else 0)
        return ph

    out = {
        r["media_id"]: r["phash"]
        for r in bmp_dhash_fingerprints(media).collect()
    }
    assert out[0] == ref_dhash(base_px)
    assert out[1] == ref_dhash(bytes(near_px))
    assert out[2] == ref_dhash(other_px)

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in bmp_phash_near_dups(media, threshold=3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert all(2 not in p for p in pairs)

    # Configurations that void the pigeonhole recall guarantee are
    # rejected, not silently lossy (ADVICE r8): grid=5 leaves 4 of 20
    # bits in no band; threshold=7 equals the default band count.
    import pytest

    with pytest.raises(ValueError, match="recall guarantee"):
        bmp_phash_near_dups(media, threshold=3, grid=5)
    with pytest.raises(ValueError, match="recall guarantee"):
        bmp_phash_near_dups(media, threshold=7, grid=8)


def test_wav_encode_parse_roundtrip_and_stats():
    """The WAV writer/parser pair is the identity on the samples,
    including negative amplitudes and odd lengths."""
    from gisaid_pipeline_functions_spark.operators.multimodal import (
        encode_wav_pcm16,
        parse_wav_pcm16,
    )

    for samples in ([0], [-32768, 32767, 0, -1, 1], list(range(-50, 53))):
        rate, got = parse_wav_pcm16(encode_wav_pcm16(8000, samples))
        assert rate == 8000
        assert got == samples

    import pytest

    with pytest.raises(ValueError, match="magic"):
        parse_wav_pcm16(b"RIFX" + b"\x00" * 60)
    bad = bytearray(encode_wav_pcm16(8000, [0, 1]))
    bad[22] = 2  # stereo
    with pytest.raises(ValueError, match="unsupported"):
        parse_wav_pcm16(bytes(bad))
