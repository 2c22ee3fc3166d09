"""Multimodal plumbing: schemas, mapInPandas batch shapes, determinism,
codec stub behavior."""

from __future__ import annotations

import hashlib

import pytest

from sample_data_pipeline_project_spark.multimodal.ops import (
    decode_image,
    have_image_codec,
    image_features,
    resize_image,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthesize_media(spark, n_images=6, n_videos=2, w=16, h=12)
    df.cache().count()
    return df


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,"
        "meta:struct<width:int,height:int,channels:int,sample_rate:int,n_frames:int>>"
    )
    assert media.count() == 8


def test_synthesis_deterministic(spark, media):
    again = synthesize_media(spark, n_images=6, n_videos=2, w=16, h=12)
    a = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in again.collect()}
    assert a == b


def test_image_features_match_numpy(media):
    import numpy as np

    feats = {r["media_id"]: r for r in image_features(media).collect()}
    for r in media.collect():
        raster = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        f = feats[r["media_id"]]
        assert f["n_bytes"] == len(raster)
        assert f["mean_intensity"] == pytest.approx(float(raster.mean()))
        assert f["min_intensity"] == int(raster.min())


def test_resize_shape_and_determinism(media):
    out = {r["media_id"]: r for r in resize_image(media, 8, 6).collect()}
    assert len(out) == 6  # images only
    for r in out.values():
        assert r["width"] == 8 and r["height"] == 6
        assert len(bytes(r["payload"])) == 8 * 6
    # idempotent on re-run
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_image(media, 8, 6).collect()}
    assert again == {k: bytes(v["payload"]) for k, v in out.items()}


def test_frame_sampling(media):
    frames = sample_frames(media, every_n=2).collect()
    by_vid: dict = {}
    for r in frames:
        by_vid.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(by_vid) == {1000, 1001}
    for idxs in by_vid.values():
        assert sorted(idxs) == [0, 2, 4]  # every 2nd of 6 frames
    frame_len = (16 * 12 * 6) // 6
    assert all(len(bytes(r["frame"])) == frame_len for r in frames)


def _encode_png(arr, ctype: int, filters=None) -> bytes:
    """Minimal stdlib PNG encoder for test fixtures: 8-bit depth,
    grayscale (ctype 0) or RGB (ctype 2), one chosen filter byte per
    scanline (cycling all five by default, so decoding exercises every
    unfilter branch)."""
    import struct
    import zlib

    import numpy as np

    h = arr.shape[0]
    channels = 1 if arr.ndim == 2 else arr.shape[2]
    w = arr.shape[1]
    flat = arr.reshape(h, w * channels).astype(np.int32)
    if filters is None:
        filters = [y % 5 for y in range(h)]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        cur = flat[y]
        raw.append(f)
        for x in range(w * channels):
            a = int(cur[x - channels]) if x >= channels else 0
            b = int(prev[x])
            c = int(prev[x - channels]) if x >= channels else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - a
            elif f == 2:
                v = cur[x] - b
            elif f == 3:
                v = cur[x] - ((a + b) >> 1)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = cur[x] - pred
            raw.append(v & 0xFF)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_non_png_payload_raises(media):
    """Without PIL, a non-PNG payload must fail loudly (ValueError from
    the stdlib decoder), not decode to garbage. The `media` fixture's
    payloads are raw fake rasters, not PNG files."""
    if have_image_codec():
        pytest.skip("codec installed; stdlib dispatch not reachable")
    with pytest.raises(Exception, match="not a PNG"):
        decode_image(media).collect()


def test_decode_png_stdlib_all_filters_grayscale():
    """The stdlib decoder reproduces a known grayscale raster through a
    PNG encoded with every filter type (0..4 cycling per scanline)."""
    import numpy as np

    from sample_data_pipeline_project_spark.multimodal.ops import (
        _decode_png_stdlib,
    )

    w, h = 16, 12
    raster = (np.arange(w * h, dtype=np.uint64) * 37 % 251).astype(np.uint8)
    png = _encode_png(raster.reshape(h, w), ctype=0)
    gw, gh, got = _decode_png_stdlib(png)
    assert (gw, gh) == (w, h)
    assert got == raster.tobytes()


def test_decode_png_stdlib_rgb_luma_matches_pil_formula():
    """RGB PNGs decode to grayscale via PIL's exact fixed-point ITU-R
    601-2 luma, pinned here against the formula itself."""
    import numpy as np

    from sample_data_pipeline_project_spark.multimodal.ops import (
        _decode_png_stdlib,
    )

    rng = np.arange(5 * 4 * 3, dtype=np.uint64)
    rgb = ((rng * 97 + 13) % 256).astype(np.uint8).reshape(4, 5, 3)
    png = _encode_png(rgb, ctype=2)
    gw, gh, got = _decode_png_stdlib(png)
    r, g, b = (rgb[..., i].astype(np.uint32) for i in range(3))
    expect = ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        np.uint8
    )
    assert (gw, gh) == (5, 4)
    assert got == expect.tobytes()


def test_decode_png_stdlib_rejects_interlace_and_bad_sig():
    import struct

    import numpy as np

    from sample_data_pipeline_project_spark.multimodal.ops import (
        _decode_png_stdlib,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        _decode_png_stdlib(b"GIF89a....")
    # flip the interlace byte of a valid PNG
    png = bytearray(_encode_png(np.zeros((2, 2), dtype=np.uint8), ctype=0))
    assert png[8 + 8 + 12] == 0  # interlace byte inside IHDR
    png[8 + 8 + 12] = 1
    ihdr = bytes(png[8 + 8 : 8 + 8 + 13])
    import zlib as _z

    png[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(
        ">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError, match="Adam7"):
        _decode_png_stdlib(bytes(png))


def test_audio_window_energy_known_waveform(spark):
    """Constant and square waveforms have closed-form window features."""
    from sample_data_pipeline_project_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        audio_window_energy,
    )

    flat = bytes([128] * 8)            # centered silence: rms 0, peak 0
    square = bytes([108, 148] * 4)     # +-20 square wave: rms 20, 7 crossings
    rows = [
        (1, "audio", bytearray(flat), (None, None, None, 8000, None)),
        (2, "audio", bytearray(square), (None, None, None, 8000, None)),
        (3, "image", bytearray(flat), (8, 1, 1, None, None)),  # filtered out
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r for r in audio_window_energy(df, window_samples=8).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["rms"] == 0.0 and got[1]["peak"] == 0 and got[1]["crossings"] == 0
    assert got[2]["rms"] == 20.0 and got[2]["peak"] == 20
    assert got[2]["crossings"] == 7
    assert got[2]["n_samples"] == 8


def test_audio_window_energy_tail_window(spark):
    from sample_data_pipeline_project_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        audio_window_energy,
    )

    df = spark.createDataFrame(
        [(9, "audio", bytearray(bytes([128] * 10)), (None, None, None, 8000, None))],
        MEDIA_SCHEMA,
    )
    rows = sorted(
        audio_window_energy(df, window_samples=4).collect(),
        key=lambda r: r["window_idx"],
    )
    assert [r["n_samples"] for r in rows] == [4, 4, 2]


def test_decode_image_png_roundtrip(spark):
    """A PNG-encoded known raster decodes back to the identical bytes
    through the Arrow-batched decode operator — via PIL when installed,
    via the stdlib PNG decoder otherwise (both paths are byte-identical
    for PNG, so this test runs everywhere with no skip)."""
    import numpy as np

    from sample_data_pipeline_project_spark.multimodal.ops import MEDIA_SCHEMA

    w, h = 16, 12
    raster = (np.arange(w * h, dtype=np.uint64) * 37 % 251).astype(np.uint8)
    if have_image_codec():
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(raster.reshape(h, w), mode="L").save(buf, format="PNG")
        png = buf.getvalue()
    else:
        png = _encode_png(raster.reshape(h, w), ctype=0)
    media = spark.createDataFrame(
        [(7, "image", bytearray(png), (w, h, 1, None, None))],
        MEDIA_SCHEMA,
    )
    out = decode_image(media).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["width"], row["height"], row["channels"]) == (w, h, 1)
    assert bytes(row["raster"]) == raster.tobytes()


def test_content_dhash_known_bytes(spark):
    from sample_data_pipeline_project_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        content_dhash,
    )

    rows = [
        # ascending bytes: no adjacent descent -> all bits 0
        (1, "image", bytearray(range(40)), (8, 5, 1, None, None)),
        # descending bytes: every adjacent pair descends -> all 32 bits set
        (2, "image", bytearray(reversed(range(40))), (8, 5, 1, None, None)),
        # shorter than 33 bytes: pads with 0, so byte 2 (=5) > pad only at
        # the boundary bit (index 1: b2=5 > b3=0)
        (3, "image", bytearray([9, 5]), (2, 1, 1, None, None)),
        # empty payload -> fingerprint 0
        (4, "image", bytearray(), (0, 0, 1, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["dhash"] for r in content_dhash(df).collect()}
    assert got[1] == 0
    assert got[2] == (1 << 32) - 1
    assert got[3] == 0b11  # 9>5 (bit 0) and 5>0 (bit 1)
    assert got[4] == 0


def test_dhash_banded_pairs_equal_quadratic(spark):
    from sample_data_pipeline_project_spark.multimodal.ops import (
        DHASH_BITS,
        content_dhash,
        synthesize_media,
    )
    from sample_data_pipeline_project_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    media = synthesize_media(spark, n_images=12, n_videos=0)
    sig = content_dhash(media)
    banded = {
        (r["a"], r["b"], r["hamming"])
        for r in banded_hamming_pairs(
            sig, DHASH_BITS, max_hamming=3, id_col="media_id", fp_col="dhash"
        ).collect()
    }
    fps = {r["media_id"]: r["dhash"] for r in sig.collect()}
    quad = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert banded == quad


def test_patch_token_stats_known_bytes(spark):
    """4-wide raster, 2x2 patches: patch sums/counts have closed forms,
    and every byte lands in exactly one patch (partition invariant)."""
    from sample_data_pipeline_project_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        patch_token_stats,
    )

    # 4x3 raster (12 bytes, width 4): rows [0,1,2,3],[10,11,12,13],[20,21,22,23]
    payload = bytes([0, 1, 2, 3, 10, 11, 12, 13, 20, 21, 22, 23])
    rows = [(1, "image", bytearray(payload), (4, 3, 1, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r["patch_row"], r["patch_col"]): r
        for r in patch_token_stats(df, patch_w=2, patch_h=2).collect()
    }
    # patch_h=2: rows 0-1 -> patch_row 0 (full 2x2 patches),
    # row 2 -> patch_row 1 (partial, 2 bytes per column pair)
    assert set(got) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert got[(0, 0)]["n_bytes"] == 4 and got[(0, 0)]["byte_sum"] == 0 + 1 + 10 + 11
    assert got[(0, 1)]["n_bytes"] == 4 and got[(0, 1)]["byte_sum"] == 2 + 3 + 12 + 13
    assert got[(1, 0)]["n_bytes"] == 2 and got[(1, 0)]["byte_sum"] == 20 + 21
    assert got[(1, 1)]["n_bytes"] == 2 and got[(1, 1)]["byte_sum"] == 22 + 23
    # totality: byte counts and sums partition the payload exactly
    assert sum(r["n_bytes"] for r in got.values()) == len(payload)
    assert sum(r["byte_sum"] for r in got.values()) == sum(payload)
    assert got[(1, 0)]["byte_mean"] == 20.5


def test_patch_token_stats_empty_payload_skipped(spark):
    from sample_data_pipeline_project_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        patch_token_stats,
    )

    rows = [(7, "image", bytearray(b""), (4, 0, 1, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    assert patch_token_stats(df).count() == 0


# ---------------------------------------------------------------------------
# audio_waveform_stats (PCM16 parse, exact-int features)
# ---------------------------------------------------------------------------
def _audio_row(spark, payload: bytes):
    from sample_data_pipeline_project_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        audio_waveform_stats,
    )

    rows = [(1, "audio", bytearray(payload), (0, 0, 1, 16000, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return audio_waveform_stats(df).collect()[0]


def test_audio_waveform_known_samples(spark):
    import struct

    # samples [-3, 7, 0, -1]: signs n,p,p,n -> 2 zero crossings
    payload = struct.pack("<4h", -3, 7, 0, -1)
    r = _audio_row(spark, payload)
    assert r["n_samples"] == 4
    assert r["peak_abs"] == 7
    assert r["sum_sq"] == 9 + 49 + 0 + 1
    assert r["zero_crossings"] == 2


def test_audio_waveform_odd_trailing_byte_ignored(spark):
    import struct

    payload = struct.pack("<2h", 100, -100) + b"\x7f"
    r = _audio_row(spark, payload)
    assert r["n_samples"] == 2
    assert r["peak_abs"] == 100
    assert r["sum_sq"] == 20000
    assert r["zero_crossings"] == 1


def test_audio_waveform_int16_extremes_exact(spark):
    import struct

    payload = struct.pack("<2h", -32768, 32767)
    r = _audio_row(spark, payload)
    assert r["peak_abs"] == 32768
    assert r["sum_sq"] == 32768**2 + 32767**2
    assert r["zero_crossings"] == 1
