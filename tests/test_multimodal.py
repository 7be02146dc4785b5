import numpy as np
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
