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


def test_real_codec_path_with_pil(ray_session):
    """Real-codec seam: rows whose meta names an image codec decode through
    PIL (mean-pooled grayscale features). Skips where PIL is absent (this
    container); activates unchanged wherever it exists."""
    PIL = pytest.importorskip("PIL.Image")
    import io
    import json

    import pyarrow as pa

    img = PIL.new("L", (16, 8))
    img.putdata(list(range(128)))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    media = ray.data.from_arrow(
        pa.table(
            {
                "item_id": pa.array([0], pa.int64()),
                "media_type": pa.array(["image"]),
                "payload": pa.array([buf.getvalue()], pa.binary()),
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


def test_codec_row_without_pil_raises(ray_session):
    """Without PIL, a codec-marked row must fail loudly (NotImplementedError
    seam), never fall back silently to the fake features."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; the loud-failure path is for PIL-less hosts")
    except ImportError:
        pass
    import json

    from asterixdb_analytics_ray.pipelines.multimodal import _decode_payload

    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_payload(b"\x89PNG fake", {"codec": "png"})
