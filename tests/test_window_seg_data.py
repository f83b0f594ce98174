"""WindowData / SegData source parity tests.

Reference semantics: src/caffe/layers/window_data_layer.cpp (window-file
parsing, fg/bg pools, context-pad crop geometry, zero padding, batch
composition) and src/caffe/layers/seg_data_layer.cpp +
data_transformer.cpp:330-460 (joint image/label transform).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eco_tpu.data.window import WindowSource, crop_window, parse_window_file
from eco_tpu.data.seg import SegSource, transform_seg
from eco_tpu.data.window import Window


def _write_window_file(tmp_path, img_path, windows, chw=(3, 32, 48)):
    lines = ["# 0", str(img_path), *map(str, chw), str(len(windows))]
    for label, overlap, x1, y1, x2, y2 in windows:
        lines.append(f"{label} {overlap} {x1} {y1} {x2} {y2}")
    p = tmp_path / "windows.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.fixture
def img_file(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 48, 3), np.uint8)
    path = tmp_path / "img.png"
    assert cv2.imwrite(str(path), img)
    return str(path), cv2.imread(str(path), cv2.IMREAD_COLOR)


class TestWindowFile:
    def test_fg_bg_split(self, tmp_path, img_file):
        path, _ = img_file
        src = _write_window_file(
            tmp_path,
            path,
            [
                (3, 0.9, 0, 0, 9, 9),     # fg (overlap >= 0.5)
                (2, 0.3, 10, 0, 19, 9),   # bg (overlap < 0.4): label forced 0
                (1, 0.45, 0, 10, 9, 19),  # middle band: discarded
            ],
        )
        ds = parse_window_file(src, fg_threshold=0.5, bg_threshold=0.4)
        assert len(ds.fg) == 1 and ds.fg[0].label == 3
        assert len(ds.bg) == 1 and ds.bg[0].label == 0 and ds.bg[0].overlap == 0
        assert len(ds.images) == 1

    def test_fg_label_must_be_positive(self, tmp_path, img_file):
        path, _ = img_file
        src = _write_window_file(tmp_path, path, [(0, 0.9, 0, 0, 9, 9)])
        with pytest.raises(ValueError, match="label > 0"):
            parse_window_file(src)


class TestCropWindow:
    def test_plain_warp_matches_cv2(self, img_file):
        _, img = img_file
        w = Window(0, 1, 1.0, 4, 2, 23, 17)
        out = crop_window(img, w, crop_size=16)
        ref = cv2.resize(
            img[2:18, 4:24], (16, 16), interpolation=cv2.INTER_LINEAR
        ).astype(np.float32)
        np.testing.assert_allclose(out, ref)
        assert out.shape == (16, 16, 3)

    def test_mean_and_scale(self, img_file):
        _, img = img_file
        w = Window(0, 1, 1.0, 4, 2, 23, 17)
        base = crop_window(img, w, crop_size=16)
        out = crop_window(
            img, w, crop_size=16, mean_values=[104, 117, 123], scale=0.5
        )
        np.testing.assert_allclose(
            out, (base - np.asarray([104, 117, 123], np.float32)) * 0.5,
            atol=1e-4,
        )

    def test_context_pad_interior_window(self, img_file):
        """context_pad on an interior window leaves no zero padding: the
        expanded region still fits in the image (window_data_layer.cpp:
        316-343 with all pad_* = 0)."""
        _, img = img_file
        w = Window(0, 1, 1.0, 16, 12, 27, 21)
        out = crop_window(img, w, crop_size=16, context_pad=2)
        # expanded region, computed with the reference arithmetic
        ctx = 16 / (16 - 4)
        hh, hw = (21 - 12 + 1) / 2, (27 - 16 + 1) / 2
        cx, cy = 16 + hw, 12 + hh
        x1 = round(cx - hw * ctx); x2 = round(cx + hw * ctx)
        y1 = round(cy - hh * ctx); y2 = round(cy + hh * ctx)
        ref = cv2.resize(
            img[y1 : y2 + 1, x1 : x2 + 1], (16, 16),
            interpolation=cv2.INTER_LINEAR,
        ).astype(np.float32)
        np.testing.assert_allclose(out, ref)

    def test_context_pad_corner_zero_pads(self, img_file):
        """A window at the top-left corner: the expanded region exits the
        image, so the warped crop gets zero padding at top/left (or right
        when mirrored -- the mirrored-padding quirk at :366-371)."""
        _, img = img_file
        w = Window(0, 1, 1.0, 0, 0, 9, 9)
        out = crop_window(img, w, crop_size=16, context_pad=4)
        assert np.all(out[0, :] == 0) and np.all(out[:, 0] == 0)
        assert np.any(out[:, -1] != 0)
        mir = crop_window(img, w, crop_size=16, context_pad=4, do_mirror=True)
        assert np.all(mir[:, -1] == 0) and np.any(mir[:, 1] != 0)

    def test_square_mode_expands_short_side(self, img_file):
        _, img = img_file
        w = Window(0, 1, 1.0, 20, 14, 27, 15)  # 8 wide x 2 tall
        out = crop_window(img, w, crop_size=8, context_pad=0, use_square=True)
        # square mode: half_height := half_width = 4; centers are x=24, y=15
        # -> x in [round(20), round(28)] = 20..28, y in 11..19 (inclusive),
        # a 9x9 region warped to 8x8 (reference round() arithmetic).
        ref = cv2.resize(
            img[11:20, 20:29], (8, 8), interpolation=cv2.INTER_LINEAR
        ).astype(np.float32)
        np.testing.assert_allclose(out, ref)


class TestWindowSource:
    def test_batch_composition(self, tmp_path, img_file):
        path, _ = img_file
        src = _write_window_file(
            tmp_path,
            path,
            [(3, 0.9, 0, 0, 9, 9), (5, 0.8, 10, 10, 29, 25),
             (0, 0.1, 4, 4, 19, 19), (0, 0.2, 20, 2, 43, 17)],
        )
        ws = WindowSource(src, batch_size=8, crop_size=12, fg_fraction=0.25,
                          mirror=True, seed=1)
        data, labels = ws.next_batch()
        assert data.shape == (8, 12, 12, 3) and data.dtype == np.float32
        assert labels.shape == (8,)
        # bg first (6 = 8 - int(8*0.25)), then fg (window_data_layer.cpp:263)
        assert np.all(labels[:6] == 0)
        assert np.all(np.isin(labels[6:], [3, 5]))

    def test_requires_both_pools(self, tmp_path, img_file):
        path, _ = img_file
        src = _write_window_file(tmp_path, path, [(3, 0.9, 0, 0, 9, 9)])
        with pytest.raises(ValueError, match="foreground and background"):
            WindowSource(src, batch_size=4, crop_size=12)


class TestSegTransform:
    def _sample(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (40, 60, 3), np.uint8)
        lab = np.zeros((40, 60), np.uint8)
        lab[:, 30:] = 7
        lab[:10, :10] = 255  # ignore-style region survives nearest resize
        return img, lab

    def test_identity_scale_no_crop(self):
        img, lab = self._sample()
        data, label = transform_seg(
            img, lab, rng=np.random.default_rng(0), stride=1
        )
        assert data.shape == (40, 60, 3) and label.shape == (40, 60)
        np.testing.assert_allclose(data, img.astype(np.float32))
        np.testing.assert_array_equal(label, lab)

    def test_stride_floors_crop_dims(self):
        img, lab = self._sample()
        data, label = transform_seg(
            img, lab, rng=np.random.default_rng(0), stride=16
        )
        assert data.shape == (32, 48, 3) and label.shape == (32, 48)
        assert set(np.unique(label)) <= {0, 7, 255}

    def test_mirror_keeps_img_label_aligned(self):
        img, lab = self._sample()
        # force mirror by trying seeds until one mirrors; alignment must hold
        for seed in range(8):
            rng = np.random.default_rng(seed)
            data, label = transform_seg(
                img, lab, rng=rng, stride=1, mirror=True,
                mean_values=[0, 0, 0],
            )
            # use a row below the 255-patch: label is 0|7 there.  If the
            # label got mirrored (7s first) the image columns must be
            # mirrored identically.
            if label[20, 0] == 7:
                assert label[20, -1] == 0
                np.testing.assert_array_equal(
                    data[20, :, :], img[20, ::-1, :].astype(np.float32)
                )
                return
        pytest.skip("mirror never sampled (rng)")

    def test_upper_size_clips(self):
        img, lab = self._sample()
        data, label = transform_seg(
            img, lab, rng=np.random.default_rng(0), stride=1, upper_size=24
        )
        assert data.shape == (24, 24, 3) and label.shape == (24, 24)

    def test_scale_ratio_sampling_bounds(self):
        img, lab = self._sample()
        for seed in range(5):
            data, _ = transform_seg(
                img, lab, rng=np.random.default_rng(seed), stride=1,
                scale_ratios=[0.5, 1.5],
            )
            assert 16 <= data.shape[0] <= 61 and 26 <= data.shape[1] <= 91


class TestSegSource:
    def test_cycle_and_shapes(self, tmp_path):
        rng = np.random.default_rng(5)
        pairs = []
        for i in range(2):
            img = rng.integers(0, 255, (24, 24, 3), np.uint8)
            lab = (rng.integers(0, 2, (24, 24), np.uint8) * 7).astype(np.uint8)
            ip, lp = tmp_path / f"i{i}.png", tmp_path / f"l{i}.png"
            cv2.imwrite(str(ip), img)
            cv2.imwrite(str(lp), lab)
            pairs.append(f"i{i}.png l{i}.png")
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(pairs) + "\n")
        src = SegSource(
            str(lst), root_dir=str(tmp_path), stride=8,
            mean_values=[104, 117, 123], balance=True,
        )
        for _ in range(3):  # cycles past the end and wraps
            data, label = src.next_sample()
            assert data.shape == (1, 24, 24, 3)
            assert label.shape == (1, 24, 24)
            assert label.dtype == np.int32


def test_crop_window_rejects_out_of_bounds_plain(img_file):
    """Plain-warp path must reject unclipped proposals instead of wrapping
    via negative indexing (the reference's cv::Rect would abort)."""
    _, img = img_file
    for w in (Window(0, 1, 1.0, -3, 2, 23, 17),
              Window(0, 1, 1.0, 4, 2, 60, 17),
              Window(0, 1, 1.0, 4, -1, 23, 17)):
        with pytest.raises(ValueError, match="out of bounds"):
            crop_window(img, w, crop_size=16)
