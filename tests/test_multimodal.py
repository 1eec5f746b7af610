"""Multimodal column plumbing: binary payloads, Arrow-batched feature
extraction (stub codec), frame sampling row shape."""

import pyspark.sql.functions as F
import pytest

from venice_spark.multimodal import attach_media_columns, extract_features, sample_frames, _decode_image


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    bin_df = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return attach_media_columns(bin_df, "doc_id", "payload", "text/plain")


def test_metadata_columns(media):
    row = media.first()
    assert row["mime"] == "text/plain"
    assert row["payload_bytes"] == len(bytes(row["payload"]))


def test_feature_extraction_deterministic(media):
    f1 = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert f1 == f2
    dims = {len(v) for v in f1.values()}
    assert dims == {16}


def test_frame_sampling_shape(media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=3)
    rows = frames.filter(F.col("media_id") == frames.first()["media_id"]).collect()
    assert 1 <= len(rows) <= 3
    assert all(isinstance(bytes(r["frame"]), bytes) for r in rows)
    # frames reassemble a prefix of the payload in order
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(range(len(rows)))


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_pil(), reason="PIL installed: compressed decode is real")
def test_real_decode_is_stubbed():
    # JPEG has no native decode path (PNG now does — see the PNG tests);
    # without PIL it must fail loudly, never silently skip
    with pytest.raises(NotImplementedError):
        _decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


@pytest.mark.skipif(not _has_pil(), reason="PIL not installed in this container")
def test_compressed_decode_via_pil():
    """Where Pillow exists, JPEG/PNG payloads decode to the same (h, w, ch)
    uint8 contract as decode_ppm."""
    import io

    import numpy as np
    from PIL import Image

    arr = np.zeros((5, 7, 3), dtype=np.uint8)
    arr[:, :, 0] = 200
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    out = _decode_image(buf.getvalue())
    assert out.shape == (5, 7, 3) and out.dtype == np.uint8
    assert np.array_equal(out, arr)  # PNG is lossless
    # grayscale keeps the (h, w, 1) shape decode_ppm uses
    g = np.arange(35, dtype=np.uint8).reshape(5, 7)
    buf = io.BytesIO()
    Image.fromarray(g, mode="L").save(buf, format="PNG")
    assert _decode_image(buf.getvalue()).shape == (5, 7, 1)


# ---- real codec path: PPM/PGM in pure numpy ----


def _ppm(w, h, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    from venice_spark.multimodal import encode_ppm

    return arr, encode_ppm(arr)


def test_ppm_round_trip_and_comments():
    import numpy as np

    from venice_spark.multimodal import decode_ppm, encode_ppm

    arr, payload = _ppm(7, 5, seed=3)
    assert np.array_equal(decode_ppm(payload), arr)
    # header comments are legal PPM; decoder must skip them
    with_comment = b"P6\n# a comment\n7 5\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(with_comment), arr)
    # grayscale P5
    g = arr[:, :, :1].copy()
    assert np.array_equal(decode_ppm(encode_ppm(g)), g)


@pytest.mark.skipif(_has_pil(), reason="PIL installed: compressed decode is real")
def test_decode_rejects_unknown_format():
    from venice_spark.multimodal import _decode_image

    # JPEG: no native path → loud PIL config error
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    # a CORRUPT PNG is bad data (ValueError), NOT a missing-PIL config gap
    # — the distinction keeps one corrupt blob from aborting a no-PIL job
    # (code-review r5)
    with pytest.raises(ValueError):
        _decode_image(b"\x89PNG\r\n\x1a\nrest")


def test_resize_images_spark(spark):
    import numpy as np

    from venice_spark.multimodal import decode_ppm, resize_images

    arr, payload = _ppm(8, 8, seed=1)
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    out = resize_images(df, 4, 4).collect()[0]
    assert (out["width"], out["height"]) == (4, 4)
    dec = decode_ppm(bytes(out["payload"]))
    assert dec.shape == (4, 4, 3)
    # nearest-neighbor: output pixel (0,0) is input pixel (0,0); (3,3) maps to (6,6)
    assert np.array_equal(dec[0, 0], arr[0, 0])
    assert np.array_equal(dec[3, 3], arr[6, 6])


def test_real_feature_extraction_spark(spark):
    from venice_spark.multimodal import extract_features, image_features, decode_ppm

    arr, payload = _ppm(6, 6, seed=2)
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    row = extract_features(df, use_stub=False).collect()[0]
    feats = row["features"]
    assert len(feats) == 6 + 16  # 3ch mean/std + 4x4 luminance grid
    expected = image_features(decode_ppm(payload))
    assert all(abs(a - b) < 1e-6 for a, b in zip(feats, expected))
    # all features land in [0,1]
    assert all(0.0 <= f <= 1.0 for f in feats)


def test_split_ppm_stream_and_sample_frames(spark):
    """REAL frame extraction from a concatenated-PPM stream: every frame
    slices at its exact header-declared size and decodes back to the
    original pixels; sampling honors stride and cap; corrupt blobs yield
    zero rows."""
    import numpy as np

    from venice_spark import multimodal as MM

    frames = []
    for i in range(5):
        arr = np.full((4, 3, 3), i * 40, dtype=np.uint8)
        frames.append(MM.encode_ppm(arr))
    stream = b"".join(frames)

    parts = MM.split_ppm_stream(stream)
    assert len(parts) == 5
    for i, p in enumerate(parts):
        assert p == frames[i]
        assert MM.decode_ppm(p)[0, 0, 0] == i * 40

    df = spark.createDataFrame(
        [(1, bytearray(stream)), (2, bytearray(b"not ppm"))],
        "media_id long, payload binary",
    )
    out = MM.sample_ppm_frames(df, every_n=2, max_frames=2).collect()
    got = {(r["media_id"], r["frame_idx"]) for r in out}
    assert got == {(1, 0), (1, 2)}  # stride 2, capped at 2 frames; doc 2 empty
    by_idx = {r["frame_idx"]: bytes(r["frame"]) for r in out}
    assert MM.decode_ppm(by_idx[2])[0, 0, 0] == 80


def test_image_near_dup_via_feature_vectors(spark):
    """End-to-end multimodal dedup composition: decode real PPM payloads ->
    luminance-grid feature vectors (mapInPandas) -> blocked cosine near-dup
    pairs. A resized copy of an image is found near-duplicate; a distinct
    image is not."""
    import numpy as np
    import pyspark.sql.functions as F

    from venice_spark import multimodal as MM
    from venice_spark.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(3)
    base = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    resized = MM.resize_nearest(base, 8, 8)           # same content, smaller
    other = (rng.random((16, 16, 3)) * 255).astype(np.uint8)

    rows = [
        (1, bytearray(MM.encode_ppm(base))),
        (2, bytearray(MM.encode_ppm(resized))),
        (3, bytearray(MM.encode_ppm(other))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    feats = MM.extract_features(df, use_stub=False).select(
        "media_id", "features"
    ).withColumn("blk", F.lit(0))

    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(
            feats, "features", "media_id", "blk", threshold=0.97
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.97
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ahash_brightness_invariant_and_distinct():
    import numpy as np

    from venice_spark import multimodal as MM

    rng = np.random.default_rng(7)
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    h1 = MM.ahash(img)
    # mean-threshold hashing is invariant to affine brightness scaling
    dimmed = (img.astype(np.float64) * 0.5).astype(np.uint8)
    assert MM.ahash(dimmed) == h1
    # and to nearest-upscaling (the downsample recovers the same grid)
    up = np.kron(img, np.ones((2, 2, 1), dtype=np.uint8))
    assert MM.ahash(up) == h1
    # a genuinely different image hashes differently
    other = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    assert MM.ahash(other) != h1
    # fits signed 64-bit (LongType contract)
    assert -(1 << 63) <= h1 < (1 << 63)


def test_frame_ahash_spark(spark):
    import numpy as np

    from venice_spark import multimodal as MM

    rng = np.random.default_rng(11)
    a = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    b = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    stream1 = MM.encode_ppm(a) + MM.encode_ppm(b)
    stream2 = MM.encode_ppm(b) + MM.encode_ppm(a)  # same frames, reordered
    rows = [
        (1, bytearray(stream1)),
        (2, bytearray(stream2)),
        (3, bytearray(b"not a ppm stream")),
        # valid first frame followed by a truncated one: the good frame
        # must survive, the corrupt one must be skipped, the task must
        # not fail (corrupt-blob tolerance, per-frame)
        (4, bytearray(MM.encode_ppm(a) + b"P6\n4 4\n255\n" + b"\x00" * 10)),
        # zero-size frame: decodes to (0,0,3), hashing must not crash
        (5, bytearray(b"P6\n0 0\n255\n")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = MM.frame_ahash(df, "payload", "media_id")
    got = {(r["media_id"], r["frame_idx"]): r for r in out.collect()}
    # corrupt payloads/frames yield zero rows for the bad bytes only: the
    # two streams yield 2 frames each, stream 4 keeps its one good frame
    assert set(got) == {(1, 0), (1, 1), (2, 0), (2, 1), (4, 0)}
    got = {k: v for k, v in got.items() if k[0] < 3}
    assert all(r["width"] == 16 and r["height"] == 16 for r in got.values())
    # frame identity survives stream position: cross-stream dedup by hash
    assert got[(1, 0)]["ahash"] == got[(2, 1)]["ahash"]
    assert got[(1, 1)]["ahash"] == got[(2, 0)]["ahash"]
    assert got[(1, 0)]["ahash"] != got[(1, 1)]["ahash"]


def test_frame_near_dup_pairs_blocked_hamming(spark):
    import hashlib

    import numpy as np

    from venice_spark import multimodal as MM

    def pattern(tag):
        dig = hashlib.md5(tag.encode()).digest()
        bits = np.unpackbits(np.frombuffer(dig[:8], dtype=np.uint8)).reshape(8, 8)
        return bits

    base = pattern("base")
    near = base.copy()
    near[3, 5] ^= 1  # one flipped cell -> hamming 1 on the 64-bit hash
    far = pattern("unrelated")

    def img(bits):
        return np.kron((bits * 255).astype(np.uint8), np.ones((4, 4), dtype=np.uint8))[
            :, :, None
        ]

    rows = [
        (1, bytearray(MM.encode_ppm(img(base)) + MM.encode_ppm(img(far)))),
        (2, bytearray(MM.encode_ppm(img(near)))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in MM.frame_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert pairs == {("1:0", "2:0"): 1}


def test_hash_hamming_pairs_non_dividing_groups_keep_recall(spark):
    import pytest

    from venice_spark.dedup import hash_hamming_pairs

    # bits=64, groups=5: width 12, last group widens to bits 48..63 so every
    # bit stays covered — pairs differing ONLY in the remainder (top) bits
    # must still block together (they share groups 0..3 exactly)
    rows = [
        ("a", 0),
        ("b", -(1 << 63)),       # only bit 63 set (signed long): hamming 1,
                                 # the diff inside the widened last group
        ("c", (1 << 62) | 7),    # hamming 4 vs a -> over the radius, excluded
    ]
    df = spark.createDataFrame(rows, "id string, h long")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hash_hamming_pairs(
            df, "h", "id", bits=64, groups=5, max_hamming=2
        ).collect()
    }
    assert pairs == {("a", "b"): 1}

    with pytest.raises(ValueError, match="groups must be <= bits"):
        hash_hamming_pairs(df, "h", "id", bits=8, groups=9, max_hamming=2)


def test_resize_images_replaces_existing_geometry_columns(spark):
    """Input width/height describe pre-resize geometry; resize must REPLACE
    them, not append duplicate StructFields (which kills the Python worker
    with a column-count mismatch)."""
    import numpy as np

    from venice_spark import multimodal as MM

    img = (np.arange(8 * 8 * 3) % 251).astype(np.uint8).reshape(8, 8, 3)
    df = spark.createDataFrame(
        [(1, bytearray(MM.encode_ppm(img)), "image/x-portable-pixmap", 8, 8, None)],
        "media_id long, payload binary, mime string, width int, height int, duration_ms int",
    )
    out = MM.resize_images(df, 4, 2)
    assert out.columns.count("width") == 1 and out.columns.count("height") == 1
    row = out.first()
    assert (row["width"], row["height"]) == (4, 2)
    assert MM.decode_ppm(bytes(row["payload"])).shape == (2, 4, 3)


def test_encode_ppm_rejects_non_uint8(spark):
    import numpy as np
    import pytest

    from venice_spark import multimodal as MM

    wide = (np.ones((2, 2, 3)) * 300).astype(np.uint16)
    with pytest.raises(ValueError, match="uint8"):
        MM.encode_ppm(wide)


def test_audio_features_zero_frames_is_silence_not_corrupt(spark):
    import numpy as np

    from venice_spark import multimodal as MM

    feats = MM.audio_features(np.zeros((0, 1)), 16000)
    assert feats == [0.0] * len(feats)
    # and through the Arrow path: a valid 0-frame WAV gets real features
    wav = MM.encode_wav(np.zeros((0, 1)), 16000)
    df = spark.createDataFrame([(1, bytearray(wav))], "media_id long, payload binary")
    row = MM.extract_audio_features(df).first()
    assert row["features"] is not None


def test_split_ppm_stream_strict_vs_salvage(spark):
    import numpy as np
    import pytest

    from venice_spark import multimodal as MM

    img = (np.arange(4 * 4 * 3) % 251).astype(np.uint8).reshape(4, 4, 3)
    good = MM.encode_ppm(img)
    stream = good + good[: len(good) - 5]  # truncated tail
    with pytest.raises(ValueError, match="truncated"):
        MM.split_ppm_stream(stream)
    assert MM.split_ppm_stream(stream, strict=False) == [good]
    with pytest.raises(ValueError):
        MM.split_ppm_stream(good + b"garbage")
    assert MM.split_ppm_stream(good + good) == [good, good]


def test_frame_near_dup_pairs_excludes_null_media_ids(spark):
    import numpy as np

    from venice_spark import multimodal as MM

    img = (np.arange(32 * 32 * 3) % 251).astype(np.uint8).reshape(32, 32, 3)
    p = bytearray(MM.encode_ppm(img))
    df = spark.createDataFrame(
        [(None, p), (None, p), (7, p)], "media_id string, payload binary"
    )
    pairs = {(r.id_a, r.id_b) for r in MM.frame_near_dup_pairs(df).collect()}
    # the two null-id streams would otherwise collapse onto frame key '0'
    # and pair with media 7 under a pseudo-identity
    assert pairs == set()


# ---- native PNG codec (stdlib zlib + numpy; VERDICT r4 missing #4) ----


def _png_with_filters(img, filters):
    """Build a spec-exact PNG whose row y uses filter type filters[y], by
    FORWARD-filtering the reference image — exercises the decoder's
    reconstruction of every filter type, which encode_png (filter 0 only)
    cannot."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(img, dtype=np.int32)
    h, w, ch = a.shape
    flat = a.reshape(h, w * ch)
    out = bytearray()
    for y, ft in enumerate(filters):
        up = flat[y - 1] if y else np.zeros(w * ch, dtype=np.int32)
        row = flat[y]
        filt = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            left = row[x - ch] if x >= ch else 0
            ul = up[x - ch] if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up[x]
            elif ft == 3:
                pred = (left + up[x]) // 2
            else:  # Paeth
                p = left + up[x] - ul
                pa, pb, pc = abs(p - left), abs(p - up[x]), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up[x] if pb <= pc else ul)
            filt[x] = (row[x] - pred) & 0xFF
        out += bytes([ft]) + bytes(filt.astype(np.uint8))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ctype_code = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_code, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_round_trip(channels):
    import numpy as np

    from venice_spark.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(11, 7, channels), dtype=np.uint8)
    back = decode_png(encode_png(img))
    assert back.shape == img.shape and (back == img).all()


def test_png_all_filter_types_reconstruct():
    """Each scanline filter (None/Sub/Up/Average/Paeth) must reconstruct
    the planted image exactly — the decoder's filter math is the part a
    round-trip through our own filter-0 encoder cannot certify."""
    import numpy as np

    from venice_spark.multimodal import decode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    payload = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert (decode_png(payload) == img).all()


def test_png_crc_corruption_fails_loudly():
    import numpy as np
    import pytest as _pt

    from venice_spark.multimodal import decode_png, encode_png

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_png(img))
    payload[40] ^= 0xFF  # flip a byte inside a chunk
    with _pt.raises(ValueError, match="CRC|length|data"):
        decode_png(bytes(payload))


def test_png_decodes_through_decode_image_and_strips_alpha():
    import numpy as np

    from venice_spark.multimodal import encode_png

    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, size=(6, 5, 4), dtype=np.uint8)
    out = _decode_image(bytes(encode_png(rgba)))
    assert out.shape == (6, 5, 3) and (out == rgba[:, :, :3]).all()


@pytest.mark.skipif(not _has_pil(), reason="PIL not installed in this container")
def test_png_decode_matches_pil_encoded_file():
    """A PIL-written PNG (PIL picks real filters per row) must decode to
    the identical array via our native decoder — cross-implementation
    parity on genuinely filtered data."""
    import io

    import numpy as np
    from PIL import Image

    from venice_spark.multimodal import decode_png

    rng = np.random.default_rng(5)
    # smooth gradient + noise so PIL's adaptive filtering uses Sub/Up/Paeth
    base = np.add.outer(np.arange(32) * 4, np.arange(24) * 3)[:, :, None]
    img = (base + rng.integers(0, 8, size=(32, 24, 3))).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    assert (decode_png(buf.getvalue()) == img).all()


def test_png_palette_decode():
    """Color type 3: scanline indices look up PLTE entries; out-of-range
    indices refuse loudly."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pt

    from venice_spark.multimodal import decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    scan = b"".join(b"\x00" + row.tobytes() for row in idx)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == palette[idx]).all()

    bad_scan = b"\x00" + bytes([9, 0, 0]) + b"\x00" + bytes([0, 0, 0])
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(bad_scan))
        + chunk(b"IEND", b"")
    )
    with _pt.raises(ValueError, match="palette index"):
        decode_png(bad)


def _png_chunk(ctype, data):
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def test_png_trns_palette_decodes_native_rgba():
    """r7 (VERDICT r6 #8): palette tRNS decodes NATIVELY — the tRNS chunk
    holds alpha for the first len(tRNS) palette entries, the rest default
    opaque, and the palette expands to RGBA. The pre-r7 behavior (raise →
    PIL fallback) silently lost transparency on clusters without Pillow;
    the pre-ADVICE-r5 behavior decoded fully opaque. Both are wrong."""
    import struct
    import zlib

    import numpy as np

    from venice_spark.multimodal import decode_png

    palette = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx = np.array([[0, 1]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    scan = b"\x00" + idx[0].tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.tobytes())
        + _png_chunk(b"tRNS", bytes([0]))  # palette entry 0 fully transparent
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    arr = decode_png(png)
    assert arr.shape == (1, 2, 4)
    assert arr[0, 0].tolist() == [255, 0, 0, 0]      # transparent entry
    assert arr[0, 1].tolist() == [0, 255, 0, 255]    # opaque default


def test_png_trns_rgb_and_gray_key_becomes_alpha():
    """8-bit gray/RGB tRNS: the chunk names ONE fully-transparent sample
    value; matching pixels get alpha 0, everything else 255."""
    import struct
    import zlib

    import numpy as np

    from venice_spark.multimodal import decode_png, encode_png

    # RGB 2x2 with (1,2,3) as the transparent key
    rgb = np.array(
        [[[1, 2, 3], [9, 9, 9]], [[1, 2, 3], [1, 2, 4]]], dtype=np.uint8
    )
    base = encode_png(rgb)
    # splice a tRNS chunk after IHDR (8 sig + 25 IHDR chunk bytes)
    trns = _png_chunk(b"tRNS", struct.pack(">HHH", 1, 2, 3))
    png = base[:33] + trns + base[33:]
    arr = decode_png(png)
    assert arr.shape == (2, 2, 4)
    assert arr[:, :, 3].tolist() == [[0, 255], [0, 255]]
    assert arr[0, 1].tolist() == [9, 9, 9, 255]

    # grayscale with key 7
    gray = np.array([[[7], [8]]], dtype=np.uint8)
    base = encode_png(gray)
    png = base[:33] + _png_chunk(b"tRNS", struct.pack(">H", 7)) + base[33:]
    arr = decode_png(png)
    assert arr.shape == (1, 2, 2)
    assert arr[0, 0].tolist() == [7, 0] and arr[0, 1].tolist() == [8, 255]


def test_png_trns_validation_raises_loudly():
    """tRNS on alpha color types / oversized tRNS = corrupt (ValueError)."""
    import struct

    import numpy as np
    import pytest as _pt

    from venice_spark.multimodal import decode_png, encode_png

    rgba = np.zeros((1, 1, 4), dtype=np.uint8)
    base = encode_png(rgba)
    png = base[:33] + _png_chunk(b"tRNS", struct.pack(">HHH", 0, 0, 0)) + base[33:]
    with _pt.raises(ValueError, match="illegal for alpha"):
        decode_png(png)


def test_png_trns_16bit_key_matches_full_samples():
    """16-bit gray/RGB tRNS matches on the FULL 16-bit samples (r7): a
    pixel equal to the key only in its high byte must stay OPAQUE — the
    16->8 reduction would alias it transparent."""
    import struct
    import zlib

    from venice_spark.multimodal import decode_png

    # 16-bit RGB, 3 pixels: exact key / high-byte-only collision / other
    key = (0x1234, 0x0000, 0xFFFF)
    px_exact = struct.pack(">HHH", 0x1234, 0x0000, 0xFFFF)
    px_alias = struct.pack(">HHH", 0x1299, 0x0000, 0xFFFF)  # same high bytes
    px_other = struct.pack(">HHH", 0x9999, 0x0000, 0xFFFF)
    raw = b"\x00" + px_exact + px_alias + px_other
    ihdr = struct.pack(">IIBBBBB", 3, 1, 16, 2, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tRNS", struct.pack(">HHH", *key))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    arr = decode_png(png16)
    assert arr.shape == (1, 3, 4)
    assert arr[0, :, 3].tolist() == [0, 255, 255]
    # values reduce to their high bytes as before
    assert arr[0, 0, :3].tolist() == [0x12, 0x00, 0xFF]
    assert arr[0, 1, :3].tolist() == [0x12, 0x00, 0xFF]

    # 16-bit gray edition
    graw = b"\x00" + struct.pack(">HH", 0x0102, 0x0103)
    gihdr = struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)
    gpng = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", gihdr)
        + _png_chunk(b"tRNS", struct.pack(">H", 0x0102))
        + _png_chunk(b"IDAT", zlib.compress(graw))
        + _png_chunk(b"IEND", b"")
    )
    arr = decode_png(gpng)
    assert arr.shape == (1, 2, 2)
    assert arr[0, :, 1].tolist() == [0, 255]


def test_corrupt_png_yields_null_features_not_job_abort(spark):
    """code-review r5: a corrupt PNG (CRC flip, truncation, broken zlib)
    must null out under extract_features' corrupt-blob tolerance on ANY
    cluster — never surface as NotImplementedError (config gap) aborting
    the task. Valid PNGs in the same batch still extract."""
    import numpy as np

    from venice_spark.multimodal import encode_png, extract_features

    rng = np.random.default_rng(2)
    good = encode_png(rng.integers(0, 256, (6, 6, 3), dtype=np.uint8))
    crc_flip = bytearray(good); crc_flip[40] ^= 0xFF
    truncated = good[: len(good) // 2]
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, crc_flip), (3, bytearray(truncated))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r["features"] for r in extract_features(df, use_stub=False).collect()}
    assert out[1] is not None and len(out[1]) == 22
    assert out[2] is None and out[3] is None


def test_png_malformed_raises_valueerror_never_struct_or_zlib_error():
    """code-review r5: the ValueError contract must hold for every corrupt
    shape — truncation at the CRC, IHDR length lies, and a broken zlib
    stream previously leaked struct.error/zlib.error."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pt

    from venice_spark.multimodal import decode_png, encode_png

    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    # truncate exactly mid-CRC of the final chunk
    with _pt.raises(ValueError):
        decode_png(good[:-2])
    # zlib-corrupt IDAT with recomputed (valid) CRC
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\x00not-zlib") + chunk(b"IEND", b"")
    )
    with _pt.raises(ValueError, match="zlib"):
        decode_png(bad)


def test_encode_png_rejects_non_uint8():
    import numpy as np
    import pytest as _pt

    from venice_spark.multimodal import encode_png

    with _pt.raises(ValueError, match="uint8"):
        encode_png(np.zeros((2, 2, 3), dtype=np.float64))
    with _pt.raises(ValueError, match="uint8"):
        encode_png(np.array([[[300]]], dtype=np.int32))


def test_png_16bit_decodes_to_high_byte():
    """Depth-16 PNGs decode natively: big-endian u16 samples reconstruct
    through the byte-level filters and downsample to their high byte (the
    spec's 16->8 reduction)."""
    import struct
    import zlib

    import numpy as np

    from venice_spark.multimodal import decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(9)
    img16 = rng.integers(0, 65536, size=(4, 5, 3), dtype=np.uint16)
    ihdr = struct.pack(">IIBBBBB", 5, 4, 16, 2, 0, 0, 0)
    scan = b"".join(
        b"\x00" + img16[y].astype(">u2").tobytes() for y in range(4)
    )
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (4, 5, 3)
    assert (out == (img16 >> 8).astype(np.uint8)).all()


def _adam7_png(img, depth=8, palette=None):
    """Hand-build an Adam7-interlaced PNG (filter-0 scanlines): seven
    reduced images per the spec's pass grid, concatenated in one zlib
    stream. Independent construction — the decoder's scatter must invert
    it exactly."""
    import struct
    import zlib

    import numpy as np

    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    h, w, ch = img.shape
    if palette is not None:
        color_type = 3
        ch_file = 1
    else:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        ch_file = ch
    stream = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        if depth == 16:
            sub = sub.astype(">u2") * 257  # high byte == original sample
        for row in sub:
            stream += b"\x00" + row.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(stream))) + chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("shape", [(13, 11, 3), (5, 3, 1), (9, 7, 4), (1, 1, 3), (2, 9, 2)])
def test_png_adam7_interlaced_decodes_natively(shape):
    """VERDICT r5 'missing' #3: Adam7 de-interlacing is now native — odd
    sizes exercise ragged/empty passes; gray+alpha and RGBA keep alpha."""
    import numpy as np

    from venice_spark.multimodal import decode_png

    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert (decode_png(_adam7_png(img)) == img).all()


def test_png_adam7_16bit_and_palette():
    import numpy as np

    from venice_spark.multimodal import decode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert (decode_png(_adam7_png(img, depth=16)) == img).all()

    palette = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], np.uint8)
    idx = rng.integers(0, 4, (7, 4, 1), dtype=np.uint8)
    png = _adam7_png(idx, palette=palette)
    assert (decode_png(png) == palette[idx[:, :, 0]]).all()


def test_png_adam7_truncated_pass_is_corrupt_not_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest as _pt

    from venice_spark.multimodal import decode_png

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    good = _adam7_png(img)
    # rebuild with the zlib stream cut short: still a VALID container
    # (CRCs recomputed), but the pass data is truncated -> corrupt payload
    sig_ihdr = good[: 8 + 25]  # signature + IHDR chunk (13 + 12 bytes)
    full = zlib.decompress(good[8 + 25 + 8 : good.rindex(b"IEND") - 8])
    cut = zlib.compress(full[: len(full) // 2])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    bad = sig_ihdr + chunk(b"IDAT", cut) + chunk(b"IEND", b"")
    with _pt.raises(ValueError, match="truncated|length mismatch"):
        decode_png(bad)


def _mk_png(w, h, depth, ctype, scan_rows, extra_chunks=(), interlace=0):
    """Hand-assemble a PNG from pre-filtered scanline byte rows."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    raw = b"".join(b"\x00" + r for r in scan_rows)
    parts = [b"\x89PNG\r\n\x1a\n", _png_chunk(b"IHDR", ihdr)]
    parts += list(extra_chunks)
    parts += [_png_chunk(b"IDAT", zlib.compress(raw)), _png_chunk(b"IEND", b"")]
    return b"".join(parts)


def test_png_sub_byte_gray_depths_expand_exactly():
    """1/2/4-bit grayscale decodes natively: bits unpack MSB-first and
    samples expand by the spec's exact factors (255, 85, 17)."""
    from venice_spark.multimodal import decode_png

    # depth 1, 10 pixels wide (2 scan bytes, 6 padding bits ignored)
    row = bytes([0b10110010, 0b01000000])
    arr = decode_png(_mk_png(10, 1, 1, 0, [row]))
    assert arr.shape == (1, 10, 1)
    assert arr[0, :, 0].tolist() == [
        255, 0, 255, 255, 0, 0, 255, 0, 0, 255
    ]

    # depth 2, 5 pixels (values 0..3 scale by 85)
    row = bytes([0b00011011, 0b10000000])  # 0,1,2,3,2
    arr = decode_png(_mk_png(5, 1, 2, 0, [row]))
    assert arr[0, :, 0].tolist() == [0, 85, 170, 255, 170]

    # depth 4, 3 pixels (values scale by 17)
    row = bytes([0x1F, 0x70])  # 1, 15, 7
    arr = decode_png(_mk_png(3, 1, 4, 0, [row]))
    assert arr[0, :, 0].tolist() == [17, 255, 119]


def test_png_sub_byte_palette_with_trns():
    """2-bit palette PNG (the common tiny-icon shape) decodes natively,
    including palette tRNS alpha."""
    import numpy as np

    from venice_spark.multimodal import decode_png

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    plte = _png_chunk(b"PLTE", palette.tobytes())
    row = bytes([0b00011011])  # indices 0,1,2,3
    arr = decode_png(_mk_png(4, 1, 2, 3, [row], extra_chunks=[plte]))
    assert arr.shape == (1, 4, 3)
    assert arr[0].tolist() == palette.tolist()

    trns = _png_chunk(b"tRNS", bytes([0, 128]))  # entry0 clear, entry1 half
    arr = decode_png(
        _mk_png(4, 1, 2, 3, [row], extra_chunks=[plte, trns])
    )
    assert arr.shape == (1, 4, 4)
    assert arr[0, :, 3].tolist() == [0, 128, 255, 255]


def test_png_sub_byte_gray_trns_key_matches_expanded():
    from venice_spark.multimodal import decode_png

    import struct

    trns = _png_chunk(b"tRNS", struct.pack(">H", 1))  # raw value 1 at depth 1
    row = bytes([0b10000000])  # pixels 1, 0
    arr = decode_png(_mk_png(2, 1, 1, 0, [row], extra_chunks=[trns]))
    assert arr.shape == (1, 2, 2)
    assert arr[0, 0].tolist() == [255, 0]   # value 1 -> 255, transparent
    assert arr[0, 1].tolist() == [0, 255]


def test_png_sub_byte_multirow_filters_and_illegal_combos():
    """Sub-byte scanlines filter on BYTE units (bpp=1): an Up-filtered
    second row reconstructs against the first row's bytes. Illegal
    depth/color-type combos are corrupt, not unsupported."""
    import pytest as _pt

    from venice_spark.multimodal import decode_png

    # depth 4, 2x2: row0 = [1, 2]; row1 Up-filtered with delta 0x11 per
    # byte -> [2, 3]
    raw_rows = [bytes([0x12])]
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    raw = b"\x00" + bytes([0x12]) + b"\x02" + bytes([0x11])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    arr = decode_png(png)
    assert arr[0, :, 0].tolist() == [17, 34]
    assert arr[1, :, 0].tolist() == [34, 51]

    # RGB at depth 2 is illegal per the spec -> corrupt, plain ValueError
    with _pt.raises(ValueError, match="illegal bit depth"):
        decode_png(_mk_png(1, 1, 2, 2, [bytes([0])]))


def test_png_sub_byte_adam7_interlaced_palette():
    """Adam7 + 1-bit palette: per-pass strides are ceil(pw*depth/8) with
    per-pass filters; the scatter must land every pixel."""
    import numpy as np

    from venice_spark.multimodal import decode_png, encode_png

    # build an 8x8 1-bit image via a known reference: encode an 8-bit
    # checkerboard, then hand-interlace the equivalent 1-bit payload
    from venice_spark.multimodal import _ADAM7_PASSES

    full = (np.indices((8, 8)).sum(axis=0) % 2).astype(np.uint8)  # checker
    passes = []
    for x0, y0, dx, dy in _ADAM7_PASSES:
        sub = full[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        rows = []
        for r in sub:
            bits = np.zeros(((len(r) + 7) // 8) * 8, dtype=np.uint8)
            bits[: len(r)] = r
            rows.append(np.packbits(bits).tobytes())
        passes.append(b"".join(b"\x00" + row for row in rows))
    import struct
    import zlib

    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 8, 8, 1, 3, 0, 0, 1)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(b"".join(passes)))
        + _png_chunk(b"IEND", b"")
    )
    arr = decode_png(png)
    assert arr.shape == (8, 8, 3)
    expect = palette[full]
    assert (arr == expect).all()


def test_split_png_stream_and_mixed_image_stream():
    """Concatenated-PNG streams split at exact IEND boundaries; mixed
    PPM/PNG streams dispatch per frame on the magic; a corrupt tail
    salvages the valid prefix (strict=False) or raises (strict=True)."""
    import numpy as np
    import pytest as _pt

    from venice_spark import multimodal as MM

    pngs = [MM.encode_png(np.full((3, 2, 3), i * 30, dtype=np.uint8)) for i in range(3)]
    stream = b"".join(pngs)
    parts = MM.split_png_stream(stream)
    assert parts == pngs
    for i, p in enumerate(parts):
        assert MM.decode_png(p)[0, 0, 0] == i * 30

    ppm = MM.encode_ppm(np.full((3, 2, 3), 99, dtype=np.uint8))
    mixed = pngs[0] + ppm + pngs[1]
    parts = MM.split_image_stream(mixed)
    assert parts == [pngs[0], ppm, pngs[1]]

    with _pt.raises(ValueError):
        MM.split_image_stream(mixed + b"garbage", strict=True)
    assert MM.split_image_stream(mixed + b"garbage", strict=False) == parts
    # truncated final PNG: salvage keeps the complete prefix
    assert MM.split_png_stream(stream[:-4], strict=False) == pngs[:2]


def test_png_stream_split_is_one_linear_pass(monkeypatch):
    """ADVICE r7 regression: split_image_stream used to re-run the full
    split_png_stream on the entire remaining payload per PNG frame and
    keep only frame [0] — O(F^2) chunk walks and O(F*S) bytes copied on
    the frame_ahash hot path. Both splitters must now walk each frame's
    chunks exactly once: count _png_frame_end invocations."""
    import numpy as np

    from venice_spark import multimodal as MM

    pngs = [
        MM.encode_png(np.full((2, 2, 3), (i * 7) % 256, dtype=np.uint8))
        for i in range(50)
    ]
    stream = b"".join(pngs)

    calls = []
    real = MM._png_frame_end

    def counting(payload, i):
        calls.append(i)
        return real(payload, i)

    monkeypatch.setattr(MM, "_png_frame_end", counting)
    assert MM.split_image_stream(stream) == pngs
    assert len(calls) == 50, f"expected 50 single-frame walks, got {len(calls)}"
    # offsets are the true frame starts — each frame parsed in place,
    # never via a payload[i:] copy re-anchored at 0
    assert calls == [sum(len(p) for p in pngs[:k]) for k in range(50)]

    calls.clear()
    assert MM.split_png_stream(stream) == pngs
    assert len(calls) == 50


def test_frame_ahash_png_stream_matches_ppm_stream(spark):
    """The frame-dedup map stage is format-independent: the same pixel
    frames hashed from a PNG stream and a PPM stream produce identical
    aHashes (PNG is lossless), so cross-format re-encodes pair up as
    exact perceptual dups."""
    import numpy as np

    from venice_spark import multimodal as MM

    rng = np.random.default_rng(5)
    frames = [(rng.random((8, 8, 3)) * 255).astype(np.uint8) for _ in range(3)]
    ppm_stream = b"".join(MM.encode_ppm(f) for f in frames)
    png_stream = b"".join(MM.encode_png(f) for f in frames)
    df = spark.createDataFrame(
        [(1, bytearray(ppm_stream)), (2, bytearray(png_stream))],
        "media_id long, payload binary",
    )
    rows = MM.frame_ahash(df, "payload", "media_id").collect()
    by = {}
    for r in rows:
        by.setdefault(r["media_id"], {})[r["frame_idx"]] = r["ahash"]
    assert len(by[1]) == len(by[2]) == 3
    assert by[1] == by[2], "PNG frames hashed differently from identical PPM frames"
    # and the pair stage finds the cross-format duplicates
    pairs = MM.frame_near_dup_pairs(df, max_hamming=0).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("1:0", "2:0") in got and ("1:2", "2:2") in got
