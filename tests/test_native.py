"""Native runtime (C++ codecs / prefetcher / writers) tests."""

import os

import numpy as np
import pytest

from emfusion_tpu import native
from emfusion_tpu.io.writers import read_volume_bin

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime unavailable")


@pytest.fixture
def depth_img(rng):
    return (1.0 + rng.rand(48, 64) * 3.0).astype(np.float32)


class TestExr:
    @pytest.mark.parametrize("compression", [0, 3])
    def test_float_roundtrip(self, tmp_path, depth_img, compression):
        p = str(tmp_path / "d.exr")
        assert native.write_exr(p, depth_img, compression=compression)
        out = native.read_exr(p)
        assert out is not None and out.shape == depth_img.shape
        np.testing.assert_array_equal(out, depth_img)

    def test_half_roundtrip(self, tmp_path, depth_img):
        p = str(tmp_path / "d.exr")
        assert native.write_exr(p, depth_img, compression=3, as_half=True)
        out = native.read_exr(p)
        # half has 10 mantissa bits -> rel err <= 2^-11
        np.testing.assert_allclose(out, depth_img, rtol=1e-3)

    def test_zip_multiblock(self, tmp_path, rng):
        # >16 scanlines exercises multi-chunk ZIP path
        img = rng.rand(100, 128).astype(np.float32)
        p = str(tmp_path / "big.exr")
        assert native.write_exr(p, img, compression=3)
        np.testing.assert_array_equal(native.read_exr(p), img)

    def test_missing_file(self, tmp_path):
        assert native.read_exr(str(tmp_path / "nope.exr")) is None


class TestPng:
    def test_rgb8_roundtrip(self, tmp_path, rng):
        img = (rng.rand(40, 50, 3) * 255).astype(np.uint8)
        p = str(tmp_path / "c.png")
        assert native.write_png_rgb(p, img)
        np.testing.assert_array_equal(native.read_png_rgb(p), img)

    def test_gray16_roundtrip(self, tmp_path, rng):
        img = (rng.rand(40, 50) * 65535).astype(np.uint16)
        p = str(tmp_path / "d.png")
        assert native.write_png_gray16(p, img)
        np.testing.assert_array_equal(native.read_png_gray16(p), img)

    def test_cross_check_cv2(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        img = (rng.rand(32, 40) * 65535).astype(np.uint16)
        p = str(tmp_path / "d.png")
        cv2.imwrite(p, img)
        np.testing.assert_array_equal(native.read_png_gray16(p), img)
        img8 = (rng.rand(32, 40, 3) * 255).astype(np.uint8)
        p2 = str(tmp_path / "c.png")
        cv2.imwrite(p2, img8[..., ::-1])  # cv2 writes BGR
        np.testing.assert_array_equal(native.read_png_rgb(p2), img8)


class TestPrefetcher:
    def _make_seq(self, tmp_path, rng, n=8, exr=False):
        rgbs, depths = [], []
        truth = []
        for i in range(n):
            rgb = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
            depth = (1.0 + rng.rand(24, 32)).astype(np.float32)
            rp = str(tmp_path / f"Color{i:04d}.png")
            native.write_png_rgb(rp, rgb)
            if exr:
                dp = str(tmp_path / f"Depth{i:04d}.exr")
                native.write_exr(dp, depth)
            else:
                dp = str(tmp_path / f"Depth{i:04d}.png")
                native.write_png_gray16(
                    dp, (depth * 5000).round().astype(np.uint16))
                depth = (depth * 5000).round().astype(np.uint16) \
                    .astype(np.float32) / 5000.0
            rgbs.append(rp)
            depths.append(dp)
            truth.append((rgb, depth))
        return rgbs, depths, truth

    @pytest.mark.parametrize("exr", [False, True])
    def test_in_order_delivery(self, tmp_path, rng, exr):
        rgbs, depths, truth = self._make_seq(tmp_path, rng, n=8, exr=exr)
        scale = 1.0 if exr else 1.0 / 5000.0
        pf = native.NativePrefetcher(rgbs, depths, n_workers=3, capacity=3,
                                     depth_scale=scale)
        assert (pf.width, pf.height, pf.num_frames) == (32, 24, 8)
        for i in range(8):
            rgb, depth, idx = pf.next()
            assert idx == i
            np.testing.assert_array_equal(rgb, truth[i][0])
            np.testing.assert_allclose(depth, truth[i][1], atol=1e-6)
        assert pf.next() is None
        pf.close()

    def test_depth_clamp(self, tmp_path, rng):
        depth = np.full((16, 16), 250.0, np.float32)  # > 100 m
        dp = str(tmp_path / "Depth0000.exr")
        native.write_exr(dp, depth)
        pf = native.NativePrefetcher([None], [dp], depth_clamp=100.0)
        _, d, _ = pf.next()
        assert np.all(d == 0.0)
        pf.close()


class TestAsyncWriter:
    def test_volume_and_ply(self, tmp_path, rng):
        w = native.AsyncWriter()
        vol = rng.rand(4, 5, 6).astype(np.float32)
        vp = str(tmp_path / "v.bin")
        w.submit_volume(vp, vol, 0.01)
        verts = rng.rand(7, 3).astype(np.float32)
        norms = rng.rand(7, 3).astype(np.float32)
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        pp = str(tmp_path / "m.ply")
        w.submit_ply(pp, verts, norms, tris)
        assert w.wait() == 0
        w.close()

        data, res, vs = read_volume_bin(vp)
        assert res == (6, 5, 4) and abs(vs - 0.01) < 1e-7
        np.testing.assert_allclose(data, vol, rtol=1e-6)

        txt = open(pp).read()
        assert "element vertex 7" in txt and "element face 2" in txt

    def test_png_writers(self, tmp_path, rng):
        w = native.AsyncWriter()
        img16 = (rng.rand(10, 12) * 65535).astype(np.uint16)
        img8 = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
        w.submit_png16(str(tmp_path / "a.png"), img16)
        w.submit_png8(str(tmp_path / "b.png"), img8)
        assert w.wait() == 0
        w.close()
        np.testing.assert_array_equal(
            native.read_png_gray16(str(tmp_path / "a.png")), img16)
        np.testing.assert_array_equal(
            native.read_png_rgb(str(tmp_path / "b.png")), img8)
