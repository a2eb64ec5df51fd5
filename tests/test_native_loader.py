"""Native C++ loader vs the PIL reference pipeline (geometry parity)."""

import os

import numpy as np
import pytest
from PIL import Image

from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.native import NativeLoader, build_error, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason=f"native loader unavailable: {build_error()}")


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (w, h) in enumerate([(64, 48), (48, 64), (100, 40), (57, 57),
                                (33, 47), (200, 80)]):
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        p_png = str(root / f"im{i}.png")
        Image.fromarray(arr).save(p_png)
        paths.append(p_png)
    # one jpeg (lossy; decoded pixels may differ from PIL's decoder slightly)
    arr = rng.randint(0, 256, (50, 70, 3), dtype=np.uint8)
    p_jpg = str(root / "im_j.jpg")
    Image.fromarray(arr).save(p_jpg, quality=95)
    return paths, p_jpg


@pytest.mark.parametrize("kind", ["clip", "squarepad", "targetpad"])
def test_parity_with_pil_pipeline(image_files, kind):
    paths, _ = image_files
    dim = 32
    tf = ImageTransform(kind, dim)
    loader = NativeLoader(kind, dim, num_threads=2)
    got = loader.decode_batch(paths)
    want = np.stack([tf(Image.open(p)) for p in paths])
    assert got.shape == want.shape
    # bicubic implementations agree to within a couple of 8-bit steps
    scale = 1.0 / min(tf.std)
    tol = 2.5 / 255.0 * scale
    diff = np.abs(got - want)
    assert diff.max() < tol, (kind, float(diff.max()))
    # the overwhelming majority of pixels match to 1 bit
    close = (diff < (1.5 / 255.0 * scale)).mean()
    assert close > 0.99, (kind, float(close))


def test_jpeg_decodes(image_files):
    _, p_jpg = image_files
    loader = NativeLoader("clip", 32, num_threads=1)
    out = loader.decode_batch([p_jpg])
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()
    # compare against PIL's pipeline loosely (different JPEG decoders)
    tf = ImageTransform("clip", 32)
    want = tf(Image.open(p_jpg))
    assert np.abs(out[0] - want).mean() < 0.1


def test_missing_file_raises(image_files):
    loader = NativeLoader("clip", 32, num_threads=1)
    with pytest.raises(IOError):
        loader.decode_batch(["/nonexistent/nope.png"])


def test_threaded_determinism(image_files):
    paths, _ = image_files
    loader = NativeLoader("targetpad", 32, num_threads=4)
    a = loader.decode_batch(paths * 4)
    b = loader.decode_batch(paths * 4)
    np.testing.assert_array_equal(a, b)


def test_palette_png_falls_back_to_pil(tmp_path):
    """Palette-mode PNGs diverge from PIL in any RGB-first decoder (Pillow
    resizes mode-P with NEAREST and pads with palette[0]); the native loader
    must route them through the Python fallback for exact parity."""
    from spn4cir_tpu.native import NativeLoader, native_available

    if not native_available():
        pytest.skip("no native toolchain")
    import numpy as np
    from PIL import Image

    from spn4cir_tpu.data.transforms import ImageTransform

    rng = np.random.RandomState(0)
    # non-square palette image so resize/pad paths actually differ
    arr = rng.randint(0, 8, (40, 70), dtype=np.uint8)
    pal_img = Image.fromarray(arr, mode="P")
    palette = list(rng.randint(0, 256, 8 * 3))
    pal_img.putpalette(palette)
    p_path = str(tmp_path / "pal.png")
    pal_img.save(p_path)
    # plus a normal RGB image in the same batch
    rgb = Image.fromarray(rng.randint(0, 256, (40, 70, 3), dtype=np.uint8))
    r_path = str(tmp_path / "rgb.png")
    rgb.save(r_path)

    tf = ImageTransform("targetpad", 32)
    loader = NativeLoader("targetpad", 32, fallback=lambda p: tf(Image.open(p)))
    out = loader.decode_batch([p_path, r_path])
    want_pal = tf(Image.open(p_path))
    want_rgb = tf(Image.open(r_path))
    np.testing.assert_allclose(out[0], want_pal, atol=1e-5)
    np.testing.assert_allclose(out[1], want_rgb, atol=2e-2)  # bicubic tol

    # without a fallback the batch must fail loudly, not silently diverge
    bare = NativeLoader("targetpad", 32)
    with pytest.raises(IOError):
        bare.decode_batch([p_path])


# ---------------------------------------------------------------------------
# Raw staging (decode-only, for the on-device fused preprocess)
# ---------------------------------------------------------------------------

def test_stage_raw_batch_matches_python_staging(image_files):
    from spn4cir_tpu.data.transforms import stage_raw_image
    from spn4cir_tpu.native import NativeRawStager

    paths, _ = image_files
    canvas = 96  # (200, 80) targetpads to 200x160 -> exercises pre-downscale
    for kind in ["clip", "squarepad", "targetpad"]:
        stager = NativeRawStager(kind, canvas, num_threads=2)
        got, ext = stager.stage_batch(paths)
        for i, p in enumerate(paths):
            arr = np.asarray(Image.open(p).convert("RGB"), np.uint8)
            want, (ph, pw) = stage_raw_image(arr, canvas, kind)
            assert (ext[i, 0], ext[i, 1]) == (ph, pw), (kind, p)
            if max(arr.shape[:2]) * 2 > canvas:  # pre-downscale: bicubic impls
                diff = np.abs(got[i].astype(int) - want.astype(int))
                assert diff.max() <= 2, (kind, p, diff.max())
            else:  # pure paste: bit-exact
                np.testing.assert_array_equal(got[i], want, err_msg=f"{kind} {p}")


def test_stage_raw_batch_into_preallocated(image_files):
    from spn4cir_tpu.native import NativeRawStager

    paths, _ = image_files
    stager = NativeRawStager("targetpad", 64, num_threads=1)
    out = np.zeros((8, 64, 64, 3), np.uint8)
    ext = np.zeros((8, 2), np.int32)
    got, gext = stager.stage_batch(paths[:3], out[:3], ext[:3])
    assert got.base is out and gext.base is ext  # staged in place
    assert out[:3].any() and (ext[:3] > 0).all()
    assert not out[3:].any()
