"""Native C++ data plane (libecodata) vs the Python pipeline."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eco_tpu.data import TransformConfig, VideoDataConfig

try:
    from eco_tpu.data.native import NativeVideoPipeline, build_native

    build_native()
    HAVE_NATIVE = True
except Exception as e:  # pragma: no cover
    HAVE_NATIVE = False
    REASON = str(e)

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE, reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nvideos")
    lines = []
    for v in range(5):
        d = root / f"vid{v}"
        d.mkdir()
        for f in range(32):
            img = np.full((64, 80, 3), (v * 32 + f) % 251, np.uint8)
            cv2.imwrite(str(d / ("img_%04d.jpg" % (f + 1))), img)
        lines.append(f"{d} 32 {v % 3}")
    lst = root / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    return str(lst)


def _cfg(lst, **kw):
    defaults = dict(
        source=lst, batch_size=3, num_segments=4, shuffle=False,
        transform=TransformConfig(
            crop_size=48, multi_scale=False, mirror=False, fix_crop=False,
            mean_values=(104.0, 117.0, 123.0),
        ),
    )
    defaults.update(kw)
    return VideoDataConfig(**defaults)


def test_native_batch_shape_and_values(video_root):
    pipe = NativeVideoPipeline(_cfg(video_root), train=False, seed=0)
    try:
        assert pipe.num_videos == 5
        b = pipe.next_batch()
        assert b["data"].shape == (3, 4, 48, 48, 3)
        assert b["data"].dtype == np.float32
        np.testing.assert_array_equal(b["label"], [0, 1, 2])
        # test phase, constant frames: values are frame_value - mean exactly.
        # video 0, segment 0 center offset = (8-1+1)/2 + 0 = 4 -> value 4
        np.testing.assert_allclose(b["data"][0, 0, :, :, 0], 4 - 104.0)
        # segment 1 center offset = 4 + 8 = 12 -> value 12
        np.testing.assert_allclose(b["data"][0, 1, :, :, 1], 12 - 117.0)
        # video 1 starts at frame value 32
        np.testing.assert_allclose(b["data"][1, 0, :, :, 2], 32 + 4 - 123.0)
    finally:
        pipe.close()


def test_native_matches_python_test_phase(video_root):
    from eco_tpu.data import VideoPipeline

    cfg = _cfg(video_root)
    native = NativeVideoPipeline(cfg, train=False, seed=0)
    py = VideoPipeline(cfg, train=False, seed=0, num_workers=1)
    try:
        nb = native.next_batch()
        pb = py.next_batch()
        # deterministic test path: identical bytes
        np.testing.assert_array_equal(nb["label"], pb["label"])
        np.testing.assert_allclose(nb["data"], pb["data"], atol=1e-5)
    finally:
        native.close()
        py.close()


def test_native_train_mode_augmentation(video_root):
    cfg = _cfg(
        video_root,
        transform=TransformConfig(
            crop_size=48, multi_scale=True, mirror=True, fix_crop=True,
            more_fix_crop=True, mean_values=(104.0, 117.0, 123.0),
        ),
    )
    pipe = NativeVideoPipeline(cfg, train=True, seed=0)
    try:
        b1 = pipe.next_batch()
        b2 = pipe.next_batch()
        assert b1["data"].shape == (3, 4, 48, 48, 3)
        assert np.isfinite(b1["data"]).all()
    finally:
        pipe.close()


def test_native_rank_sharding(video_root):
    labels = {}
    for rank in (0, 1):
        cfg = _cfg(video_root, batch_size=2)
        pipe = NativeVideoPipeline(cfg, train=False, rank=rank, world=2)
        try:
            labels[rank] = list(pipe.next_batch()["label"])
        finally:
            pipe.close()
    assert labels[0] == [0, 1]
    assert labels[1] == [2, 0]  # videos 2, 3 -> labels 2, 0


def test_native_throughput_smoke(video_root):
    import time

    cfg = _cfg(video_root, batch_size=8)
    pipe = NativeVideoPipeline(cfg, train=True, num_workers=8)
    try:
        pipe.next_batch()
        t0 = time.perf_counter()
        for _ in range(10):
            pipe.next_batch()
        dt = time.perf_counter() - t0
        assert dt < 10.0  # 80 videos x 4 frames in <10s is a loose floor
    finally:
        pipe.close()


def test_native_raw_mode_contract(video_root):
    """C++ raw mode: uint8 frames + augment decisions, matching the Python
    VideoPipeline(raw=True) batch contract (data/h_off/w_off/mirror/label)."""
    S, crop = 4, 32
    cfg = VideoDataConfig(
        source=video_root, batch_size=3, num_segments=S, new_height=48,
        new_width=56, raw=True,
        transform=TransformConfig(crop_size=crop, mirror=True,
                                  more_fix_crop=True, multi_scale=False),
    )
    pipe = NativeVideoPipeline(cfg, train=True, seed=7, num_workers=2)
    try:
        b = pipe.next_batch()
    finally:
        pipe.close()
    assert b["data"].dtype == np.uint8
    assert b["data"].shape == (3, S, 48, 56, 3)
    assert b["h_off"].shape == (3,) and b["w_off"].shape == (3,)
    assert b["mirror"].dtype == bool
    assert (b["h_off"] >= 0).all() and (b["h_off"] <= 48 - crop).all()
    assert (b["w_off"] >= 0).all() and (b["w_off"] <= 56 - crop).all()
    # frames are verbatim uint8 pixels (constant-valued synthetic frames)
    assert b["data"].max() > 0
    v = b["data"][0, 0]
    assert int(v.max()) - int(v.min()) <= 25  # one near-constant jpeg frame

    # test phase: center crop offsets, no mirror
    pipe = NativeVideoPipeline(cfg, train=False, seed=7, num_workers=2)
    try:
        b2 = pipe.next_batch()
    finally:
        pipe.close()
    assert (b2["h_off"] == (48 - crop) // 2).all()
    assert (b2["w_off"] == (56 - crop) // 2).all()
    assert not b2["mirror"].any()


def test_raw_mode_multi_scale_contract(video_root):
    """Raw + train + multi_scale: BOTH pipelines ship per-video
    (crop_h, crop_w) columns for the on-device crop+resize (ops/resize.py),
    with windows that stay inside the decoded frame."""
    from eco_tpu.data import VideoPipeline

    cfg = VideoDataConfig(
        source=video_root, batch_size=2, num_segments=2, new_height=48,
        new_width=56, raw=True,
        transform=TransformConfig(crop_size=32, multi_scale=True),
    )
    for cls in (VideoPipeline, NativeVideoPipeline):
        kw = {"num_workers": 2}
        pipe = cls(cfg, train=True, seed=0, **kw)
        try:
            seen_scaled = False
            for _ in range(4):
                b = pipe.next_batch()
                assert b["data"].dtype == np.uint8
                assert set(b) >= {"crop_h", "crop_w", "h_off", "w_off",
                                  "mirror"}
                assert (b["crop_h"] <= 48).all() and (b["crop_h"] >= 31).all()
                assert (b["h_off"] + b["crop_h"] <= 48).all()
                assert (b["w_off"] + b["crop_w"] <= 56).all()
                seen_scaled |= bool((b["crop_h"] != 32).any()
                                    or (b["crop_w"] != 32).any())
            assert seen_scaled, f"{cls.__name__} never sampled a non-1.0 scale"
        finally:
            pipe.close()
    # eval mode keeps the fixed center-crop contract (no crop_h/crop_w keys)
    pipe = NativeVideoPipeline(cfg, train=False, seed=0, num_workers=2)
    try:
        b = pipe.next_batch()
        assert "crop_h" not in b
    finally:
        pipe.close()
    # eval mode (center crop) is fine
    NativeVideoPipeline(cfg, train=False, seed=0).close()


def test_raw_mode_random_offsets_when_fix_crop_off(video_root):
    """fix_crop=False must give uniform-random offsets (not the fixed grid)
    in raw mode, in both loaders."""
    from eco_tpu.data import VideoPipeline
    from eco_tpu.data.transform import fill_fix_offsets

    cfg = VideoDataConfig(
        source=video_root, batch_size=4, num_segments=2, new_height=48,
        new_width=56, raw=True, shuffle=False,
        transform=TransformConfig(crop_size=32, multi_scale=False,
                                  fix_crop=False, mirror=False),
    )
    grid = set(fill_fix_offsets(48, 56, 32, 32, True))
    seen = set()
    for cls, kw in ((VideoPipeline, {}), (NativeVideoPipeline, {"num_workers": 2})):
        pipe = cls(cfg, train=True, seed=11, **kw)
        try:
            for _ in range(6):
                b = pipe.next_batch()
                for ho, wo in zip(b["h_off"], b["w_off"]):
                    assert 0 <= ho <= 16 and 0 <= wo <= 24
                    seen.add((int(ho), int(wo)))
        finally:
            pipe.close()
    # uniform sampling over 17x25 positions must leave the 13-point grid
    assert not seen.issubset(grid), seen
