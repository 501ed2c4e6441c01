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
