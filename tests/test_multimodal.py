import numpy as np
import pytest
import ray.data

from asterixdb_analytics_ray.pipelines.multimodal import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
    synthetic_media,
)


def test_feature_extract_shapes_and_determinism(ray_session):
    media = ray.data.from_arrow(synthetic_media(30))
    out = extract_features(media, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 30
    assert set(out.columns) == {"item_id", "width", "height", "features"}
    feats = np.stack(out.sort_values("item_id")["features"].to_numpy())
    assert feats.shape == (30, FEATURE_DIM)
    assert ((feats >= 0) & (feats < 1)).all()
    # deterministic across runs / parallelism
    out2 = extract_features(media, concurrency=2, batch_size=4).to_pandas()
    feats2 = np.stack(out2.sort_values("item_id")["features"].to_numpy())
    np.testing.assert_array_equal(feats, feats2)


def test_frame_sampling(ray_session):
    media = ray.data.from_arrow(synthetic_media(12))
    frames = sample_frames(media, every=4).to_pandas()
    # items 0,3,6,9 are "video" with 8 frames → 2 sampled frames each
    assert sorted(frames["item_id"].unique()) == [0, 3, 6, 9]
    assert sorted(frames["frame_idx"].unique()) == [0, 4]
    assert (frames["payload"].str.len() > 0).all()


def test_real_codec_path_png(ray_session):
    """REAL-codec path, runnable in this codec-less container: a genuine
    PNG payload (stdlib encoder) decodes through the stdlib zlib+unfilter
    decoder into mean-pooled grayscale features — no PIL needed."""
    import json

    import pyarrow as pa

    from asterixdb_analytics_ray.pipelines.multimodal import png_encode_gray

    img = np.arange(128, dtype=np.uint8).reshape(8, 16)
    media = ray.data.from_arrow(
        pa.table(
            {
                "item_id": pa.array([0], pa.int64()),
                "media_type": pa.array(["image"]),
                "payload": pa.array([png_encode_gray(img)], pa.binary()),
                "meta": pa.array(
                    [json.dumps({"width": 16, "height": 8, "codec": "png"})]
                ),
            }
        )
    )
    out = extract_features(media, concurrency=1, batch_size=1).to_pandas()
    feats = np.stack(out["features"].to_numpy())[0]
    # 128 pixels mean-pooled into FEATURE_DIM buckets of 4 consecutive
    want = (np.arange(128) / 255.0).reshape(FEATURE_DIM, -1).mean(axis=1)
    np.testing.assert_allclose(feats, want, atol=1e-12)


def test_png_decoder_all_filters_and_color():
    """png_decode_gray reconstructs every PNG filter type and collapses
    RGB(A) with PIL's exact integer luma transform. The encoded bytes are
    hand-built per filter so the unfilter math is exercised directly."""
    import struct
    import zlib

    from asterixdb_analytics_ray.pipelines.multimodal import (
        _PNG_SIG,
        png_decode_gray,
        png_encode_gray,
    )

    # 1) encoder round-trip (filter 0)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode_gray(png_encode_gray(img)), img)

    # 2) hand-filtered grayscale: rows using Sub/Up/Average/Paeth
    img = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    raws = [b"\x00" + img[0].tobytes()]
    for y, f in zip(range(1, 5), (1, 2, 3, 4)):
        row = img[y].astype(np.int64)
        prev = img[y - 1].astype(np.int64)
        filt = np.empty(9, dtype=np.int64)
        for x in range(9):
            a = row[x - 1] if x >= 1 else 0
            b = prev[x]
            c = prev[x - 1] if x >= 1 else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else c)
            filt[x] = (row[x] - pred) & 0xFF
        raws.append(bytes([f]) + filt.astype(np.uint8).tobytes())

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    payload = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 5, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(png_decode_gray(payload), img)

    # 3) RGB: PIL's integer luma transform
    rgb = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(4))
    payload = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    px = rgb.astype(np.int64)
    want = (
        (19595 * px[:, :, 0] + 38470 * px[:, :, 1] + 7471 * px[:, :, 2] + 0x8000)
        >> 16
    ).astype(np.uint8)
    np.testing.assert_array_equal(png_decode_gray(payload), want)


def test_png_decoder_all_filters_multichannel():
    """The vectorized lane unfilter reconstructs Sub/Up/Average/Paeth rows
    bit-exactly on multi-channel (RGBA, ch=4) data, where the left neighbor
    is ch bytes back — hand-filtered with the per-byte spec reference."""
    import struct
    import zlib

    from asterixdb_analytics_ray.pipelines.multimodal import (
        _PNG_SIG,
        png_decode_gray,
    )

    rng = np.random.default_rng(17)
    h, w, ch = 6, 7, 4
    rgba = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4, 1]
    raws = []
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        row = rgba[y].astype(np.int64)
        f = filters[y]
        filt = np.empty(w * ch, dtype=np.int64)
        for x in range(w * ch):  # per-BYTE spec reference implementation
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else c)
            filt[x] = (row[x] - pred) & 0xFF
        raws.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    payload = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + chunk(b"IEND", b"")
    )
    px = rgba.reshape(h, w, ch).astype(np.int64)
    want = (
        (19595 * px[:, :, 0] + 38470 * px[:, :, 1] + 7471 * px[:, :, 2] + 0x8000)
        >> 16
    ).astype(np.uint8)
    np.testing.assert_array_equal(png_decode_gray(payload), want)


def test_pil_round_trip_if_present(ray_session):
    """Where PIL exists, its PNG output decodes identically through the
    stdlib path (and vice versa)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    from asterixdb_analytics_ray.pipelines.multimodal import png_decode_gray

    img = PIL.new("L", (16, 8))
    img.putdata(list(range(128)))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    np.testing.assert_array_equal(
        png_decode_gray(buf.getvalue()),
        np.arange(128, dtype=np.uint8).reshape(8, 16),
    )


def test_non_png_codec_without_pil_raises(ray_session):
    """Without PIL, a jpeg-marked row must fail loudly (NotImplementedError
    seam), never fall back silently to the fake features."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; the loud-failure path is for PIL-less hosts")
    except ImportError:
        pass
    from asterixdb_analytics_ray.pipelines.multimodal import _decode_payload

    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_payload(b"\xff\xd8 fake jpeg", {"codec": "jpeg"})


def test_resize_images_stdlib_png(ray_session):
    """Real decode->resize->encode round trip through the stdlib PNG codec:
    output pixels equal the exact integer nearest-neighbor gather, across
    up- and down-scaling, and re-decode through the same codec."""
    import json

    import pyarrow as pa

    from asterixdb_analytics_ray.pipelines.multimodal import (
        png_decode_gray,
        png_encode_gray,
        resize_images,
    )

    rng = np.random.default_rng(4)
    imgs = [
        rng.integers(0, 256, size=(12, 20), dtype=np.uint8),
        rng.integers(0, 256, size=(5, 7), dtype=np.uint8),
    ]
    media = ray.data.from_arrow(
        pa.table(
            {
                "item_id": pa.array([0, 1], pa.int64()),
                "media_type": pa.array(["image", "image"]),
                "payload": pa.array(
                    [png_encode_gray(im) for im in imgs], pa.binary()
                ),
                "meta": pa.array(
                    [
                        json.dumps(
                            {"width": im.shape[1], "height": im.shape[0],
                             "codec": "png"}
                        )
                        for im in imgs
                    ]
                ),
            }
        )
    )
    out = resize_images(media, width=8, height=6, concurrency=1).to_pandas()
    out = out.sort_values("item_id").reset_index(drop=True)
    # output stays a valid media table: meta carries the new dims + codec
    assert list(out.columns) == ["item_id", "media_type", "payload", "meta"]
    metas = [json.loads(m) for m in out["meta"]]
    assert all(m["width"] == 8 and m["height"] == 6 and m["codec"] == "png"
               for m in metas)
    for i, im in enumerate(imgs):
        ih, iw = im.shape
        ys = (np.arange(6) * ih) // 6
        xs = (np.arange(8) * iw) // 8
        np.testing.assert_array_equal(
            png_decode_gray(out["payload"][i]), im[np.ix_(ys, xs)]
        )


def test_resize_images_passthrough_and_chain(ray_session):
    """Non-image rows pass through untouched (never hitting the codec seam)
    and the resized table chains straight into extract_features."""
    import json

    import pyarrow as pa

    from asterixdb_analytics_ray.pipelines.multimodal import (
        FEATURE_DIM,
        extract_features,
        png_encode_gray,
        resize_images,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 10), dtype=np.uint8)
    audio_payload = b"\x00\x01fake-audio"
    audio_meta = json.dumps({"codec": "wav", "rate": 16000})
    media = ray.data.from_arrow(
        pa.table(
            {
                "item_id": pa.array([0, 1], pa.int64()),
                "media_type": pa.array(["image", "audio"]),
                "payload": pa.array(
                    [png_encode_gray(img), audio_payload], pa.binary()
                ),
                "meta": pa.array(
                    [json.dumps({"width": 10, "height": 10, "codec": "png"}),
                     audio_meta]
                ),
            }
        )
    )
    resized = resize_images(media, width=4, height=4, concurrency=1)
    df = resized.to_pandas().sort_values("item_id").reset_index(drop=True)
    # the audio row is byte-identical in and out
    assert bytes(df["payload"][1]) == audio_payload
    assert df["meta"][1] == audio_meta
    # the image row chains into extract_features via its rewritten meta
    feats = (
        extract_features(resized.filter(lambda r: r["media_type"] == "image"),
                         concurrency=1)
        .to_pandas()
    )
    assert len(feats) == 1
    assert len(feats["features"][0]) == FEATURE_DIM
    assert feats["width"][0] == 4 and feats["height"][0] == 4


def test_resize_non_png_without_pil_raises(ray_session):
    """Without PIL, resizing a jpeg-marked row fails loudly through the
    same codec seam as decode."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; the loud-failure path is for PIL-less hosts")
    except ImportError:
        pass
    from asterixdb_analytics_ray.pipelines.multimodal import ResizeImages

    import pyarrow as pa

    t = pa.table(
        {
            "item_id": pa.array([0], pa.int64()),
            "media_type": pa.array(["image"]),
            "payload": pa.array([b"\xff\xd8 fake jpeg"], pa.binary()),
            "meta": pa.array(['{"codec": "jpeg"}']),
        }
    )
    with pytest.raises(NotImplementedError, match="PIL"):
        ResizeImages(4, 4)(t)
