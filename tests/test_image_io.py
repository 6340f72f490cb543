import numpy as np

from rtmm_tpu.io import image as image_io


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    path = str(tmp_path / "x.png")
    image_io.write_png(path, img)
    back = image_io.read_png(path)
    np.testing.assert_array_equal(img, back)


def test_png_float_input(tmp_path):
    img = np.linspace(0, 1, 4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3)
    path = str(tmp_path / "f.png")
    image_io.write_png(path, img)
    back = image_io.read_png(path)
    expect = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(back, expect)


def test_bmp_writes(tmp_path):
    img = np.zeros((5, 7, 3), np.uint8)
    img[..., 0] = 255
    path = str(tmp_path / "x.bmp")
    image_io.write_bmp(path, img)
    data = open(path, "rb").read()
    assert data[:2] == b"BM"
    assert len(data) == 54 + 5 * (7 * 3 + 3)
