"""Native C++ loader tests: decoders vs PIL gold, readahead ordering."""

import numpy as np
import pytest

from gslam_tpu.datasets import native_loader


pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native lib not built")


def write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


class TestDecoders:
    def test_png_gray8(self, tmp_path, rng):
        arr = rng.integers(0, 255, (37, 53), np.uint8)
        p = str(tmp_path / "g.png")
        write_png(p, arr)
        out = native_loader.decode_gray_f32(p)
        np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0,
                                   atol=1e-6)

    def test_png_rgb8(self, tmp_path, rng):
        arr = rng.integers(0, 255, (24, 31, 3), np.uint8)
        p = str(tmp_path / "c.png")
        write_png(p, arr)
        out = native_loader.decode_gray_f32(p)
        gold = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                + 0.114 * arr[..., 2]).astype(np.float32) / 255.0
        np.testing.assert_allclose(out, gold, atol=2e-3)

    def test_png_gray16(self, tmp_path, rng):
        arr = rng.integers(0, 65535, (16, 20), np.uint16)
        p = str(tmp_path / "d.png")
        write_png(p, arr)
        out = native_loader.decode_gray_f32(p)
        np.testing.assert_allclose(out, arr.astype(np.float32) / 65535.0,
                                   atol=1e-6)

    def test_pgm(self, tmp_path, rng):
        arr = rng.integers(0, 255, (12, 17), np.uint8)
        p = str(tmp_path / "x.pgm")
        with open(p, "wb") as f:
            f.write(b"P5\n# comment\n17 12\n255\n" + arr.tobytes())
        out = native_loader.decode_gray_f32(p)
        np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0,
                                   atol=1e-6)

    def test_bmp(self, tmp_path, rng):
        from PIL import Image

        arr = rng.integers(0, 255, (10, 14, 3), np.uint8)
        p = str(tmp_path / "b.bmp")
        Image.fromarray(arr).save(p)
        out = native_loader.decode_gray_f32(p)
        gold = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                + 0.114 * arr[..., 2]).astype(np.float32) / 255.0
        np.testing.assert_allclose(out, gold, atol=2e-3)

    def test_missing_file(self):
        assert native_loader.decode_gray_f32("/nonexistent.png") is None


class TestLoader:
    def test_ordered_readahead(self, tmp_path, rng):
        paths = []
        golds = []
        for i in range(12):
            arr = rng.integers(0, 255, (20, 30), np.uint8)
            p = str(tmp_path / f"{i:03d}.png")
            write_png(p, arr)
            paths.append(p)
            golds.append(arr.astype(np.float32) / 255.0)
        ld = native_loader.NativeLoader(paths, n_threads=3, ring=4)
        for i in range(12):
            fr = ld.next()
            np.testing.assert_allclose(fr, golds[i], atol=1e-6)
        assert ld.next() is None
        ld.close()

    @pytest.mark.timeout_s(120)
    def test_slow_inorder_frame_no_deadlock(self, tmp_path, rng):
        """Regression: ring starvation deadlock (round-3 verdict weak 7).

        With a purely global queue cap, fast workers could fill the
        ring with indices AHEAD of a slow worker's in-order frame;
        then every worker waited for room while the consumer waited
        for that frame (all threads futex_wait — reproduced under
        full-suite CPU contention and diagnosed via the watchdog).
        Shape it deterministically: frame 0 decodes ~1000x slower than
        the rest (large PNG vs 8x8), ring=1 + 2 threads gives the
        smallest cap, so the flood fills the queue long before frame 0
        lands.  Without the in-order admission fix in
        native/gslam_native.cpp::Loader::worker this test hangs; the
        conftest watchdog turns that into a dumped failure."""
        paths, golds = [], []
        big = rng.integers(0, 255, (1600, 1200), np.uint8)
        p0 = str(tmp_path / "000.png")
        write_png(p0, big)
        paths.append(p0)
        golds.append(big.astype(np.float32) / 255.0)
        for i in range(1, 9):
            arr = rng.integers(0, 255, (8, 8), np.uint8)
            p = str(tmp_path / f"{i:03d}.png")
            write_png(p, arr)
            paths.append(p)
            golds.append(arr.astype(np.float32) / 255.0)
        ld = native_loader.NativeLoader(paths, n_threads=2, ring=1)
        for i in range(9):
            fr = ld.next()
            np.testing.assert_allclose(fr, golds[i], atol=1e-6)
        assert ld.next() is None
        ld.close()


class TestJpeg:
    """Baseline JPEG decoder vs PIL gold (lossy: compare against PIL's
    decode of the same file, tolerance covers IDCT/upsampling variance
    between implementations)."""

    def _gold(self, path):
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"), np.uint8)

    def _make(self, tmp_path, rng, shape, name, **save_kw):
        from PIL import Image

        # smooth image: JPEG reconstruction differences stay small
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
        base = (128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
                + rng.normal(0, 4, shape[:2]))
        if len(shape) == 3:
            arr = np.stack([base, np.roll(base, 3, 0),
                            np.roll(base, 5, 1)], -1)
        else:
            arr = base
        arr = arr.clip(0, 255).astype(np.uint8)
        p = str(tmp_path / name)
        Image.fromarray(arr).save(p, **save_kw)
        return p

    def test_gray(self, tmp_path, rng):
        p = self._make(tmp_path, rng, (40, 56), "g.jpg", quality=92)
        out = native_loader.decode_gray_f32(p)
        gold = self._gold(p)
        gold_g = (0.299 * gold[..., 0] + 0.587 * gold[..., 1]
                  + 0.114 * gold[..., 2]).astype(np.float32) / 255.0
        assert out.shape == gold_g.shape
        assert np.abs(out - gold_g).mean() < 0.01

    def test_rgb_420(self, tmp_path, rng):
        p = self._make(tmp_path, rng, (48, 64, 3), "c.jpg", quality=90,
                       subsampling=2)  # 4:2:0
        out = native_loader.decode_gray_f32(p)
        gold = self._gold(p)
        gold_g = (0.299 * gold[..., 0] + 0.587 * gold[..., 1]
                  + 0.114 * gold[..., 2]).astype(np.float32) / 255.0
        assert out.shape == gold_g.shape
        assert np.abs(out - gold_g).mean() < 0.02

    def test_rgb_444_odd_size(self, tmp_path, rng):
        p = self._make(tmp_path, rng, (41, 53, 3), "o.jpg", quality=95,
                       subsampling=0)  # 4:4:4, non-multiple-of-8 dims
        out = native_loader.decode_gray_f32(p)
        gold = self._gold(p)
        gold_g = (0.299 * gold[..., 0] + 0.587 * gold[..., 1]
                  + 0.114 * gold[..., 2]).astype(np.float32) / 255.0
        assert out.shape == gold_g.shape
        assert np.abs(out - gold_g).mean() < 0.01

    def test_restart_markers(self, tmp_path, rng):
        from PIL import Image

        p = self._make(tmp_path, rng, (32, 48, 3), "r.jpg", quality=90,
                       restart_marker_rows=1)
        out = native_loader.decode_gray_f32(p)
        gold = self._gold(p)
        gold_g = (0.299 * gold[..., 0] + 0.587 * gold[..., 1]
                  + 0.114 * gold[..., 2]).astype(np.float32) / 255.0
        assert out.shape == gold_g.shape
        assert np.abs(out - gold_g).mean() < 0.02
