"""Native (C++) clip decoder: bit-parity with the PIL path + fallbacks.

The native layer (unigeo_tpu/native/io.cc) must be a pure drop-in: every
array it emits is compared against the stock per-frame PIL readers on the
same files, and the ClipDataset wiring must produce identical samples with
the library enabled or disabled (UNIGEO_NATIVE_IO=0).
"""

import numpy as np
import pytest
from PIL import Image

from unigeo_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native io library not buildable here"
)


@pytest.fixture
def media(tmp_path):
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (40, 56, 3), np.uint8)
    depth = rng.integers(0, 60000, (40, 56), np.uint16)
    normal = rng.integers(0, 256, (40, 56, 3), np.uint8)
    normal[:6, :9] = 0  # invalid-pixel region (all-zero encoding)
    paths = {}
    for ext in ("png", "jpg", "webp"):
        p = str(tmp_path / f"rgb.{ext}")
        Image.fromarray(rgb).save(p)
        paths[ext] = p
    paths["depth"] = str(tmp_path / "depth.png")
    Image.fromarray(depth).save(paths["depth"])
    paths["depth8"] = str(tmp_path / "depth8.png")
    Image.fromarray((depth // 256).astype(np.uint8)).save(paths["depth8"])
    paths["normal"] = str(tmp_path / "normal.png")
    Image.fromarray(normal).save(paths["normal"])
    return paths


def _pil_rgb_chw(path):
    return np.asarray(Image.open(path).convert("RGB"), np.float32).transpose(2, 0, 1)


@pytest.mark.parametrize("ext", ["png", "jpg", "webp"])
def test_rgb_parity(media, ext):
    out = native.decode_clip_rgb([media[ext]] * 3)
    ref = _pil_rgb_chw(media[ext])
    assert out.shape == (3, 3, 40, 56) and out.dtype == np.float32
    # png/webp must be exact; jpeg decoded by the same system libjpeg —
    # allow ±1 code in case Pillow ships its own libjpeg build
    atol = 1.0 if ext == "jpg" else 0.0
    for f in range(3):
        np.testing.assert_allclose(out[f], ref, atol=atol)


def test_depth_parity(media):
    out = native.decode_clip_depth([media["depth"]] * 2, 5000.0)
    ref = np.asarray(Image.open(media["depth"]), np.float32) / 5000.0
    assert out.shape == (2, 40, 56)
    np.testing.assert_array_equal(out[0], ref)
    np.testing.assert_array_equal(out[1], ref)
    # 8-bit grayscale depth also decodes raw
    out8 = native.decode_clip_depth([media["depth8"]], 1000.0)
    ref8 = np.asarray(Image.open(media["depth8"]), np.float32) / 1000.0
    np.testing.assert_array_equal(out8[0], ref8)


def test_normal_parity(media):
    out = native.decode_clip_normal([media["normal"]])
    raw = np.asarray(Image.open(media["normal"]), np.float32)
    ref = raw / 255.0 * 2.0 - 1.0
    ref[np.all(raw < 1e-3, axis=2)] = 0  # reference scannetpp.py:115-122
    np.testing.assert_allclose(out[0], ref.transpose(2, 0, 1), atol=1e-6)


def test_image_info(media):
    assert native.image_info(media["png"])[:2] == (40, 56)
    h, w, kind = native.image_info(media["depth"])
    assert (h, w) == (40, 56)


def test_errors(media, tmp_path):
    with pytest.raises(native.NativeIOError):
        native.decode_clip_rgb([str(tmp_path / "missing.png")])
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not an image at all")
    with pytest.raises(native.NativeIOError):
        native.decode_clip_rgb([bad])
    # depth decode refuses RGB files (wrong colortype), rgb refuses .dpt-like
    with pytest.raises(native.NativeIOError):
        native.decode_clip_depth([media["png"]], 1000.0)


def test_dataset_wiring_parity(tmp_path, monkeypatch):
    """ClipDataset output is identical with the native path on and off."""
    from fixtures_loaders import build_scannetpp  # webp rgb+normal, png depth

    ds = build_scannetpp(str(tmp_path / "root"), str(tmp_path / "cache"))
    assert ds._native_clip(
        "rgb", [ds._abs(ds._scene("02455b3d20").rgb_paths[0])]
    ) is not None, "native path unexpectedly inactive for stock readers"
    native_sample = ds[0]

    monkeypatch.setenv("UNIGEO_NATIVE_IO", "0")
    monkeypatch.setattr(native, "_lib", None)
    pil_sample = ds[0]
    monkeypatch.undo()
    native._lib = None  # re-load lazily next use

    for key in ("images", "cam_coord", "cam_normal", "world_coord", "mask"):
        np.testing.assert_array_equal(
            np.asarray(native_sample[key]), np.asarray(pil_sample[key]),
            err_msg=f"native vs PIL mismatch in {key}",
        )


def test_override_fallback(tmp_path):
    """Subclasses with custom per-frame readers must bypass the native path
    (Sintel .dpt / InteriorNet euclidean-depth correctness depends on it)."""
    from fixtures_loaders import build_interiornet, build_sintel

    ds = build_sintel(str(tmp_path / "sintel"), str(tmp_path / "cache1"))
    scene = ds._scene("alley_1")
    assert ds._native_clip("depth", [ds._abs(scene.depth_paths[0])]) is None
    ds2 = build_interiornet(str(tmp_path / "inet"), str(tmp_path / "cache2"))
    scene2 = ds2._scene("3FO4IDEI1LAV_Dining_room")
    assert ds2._native_clip("depth", [ds2._abs(scene2.depth_paths[0])]) is None


# ---------------------------------------------------------------------------
# review-fix regressions
# ---------------------------------------------------------------------------

def _write_adam7_gray16_png(path, img):
    """Minimal Adam7-interlaced 16-bit grayscale PNG writer (filter 0).
    Pillow cannot write interlaced PNGs, so the regression crafts one by
    hand: 7 passes, each scanline prefixed with filter byte 0, samples
    big-endian, zlib-compressed into one IDAT."""
    import struct
    import zlib

    h, w = img.shape
    passes = [  # (x0, y0, dx, dy) per Adam7 pass
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)  # filter type 0
            raw += row.astype(">u2").tobytes()

    def chunk(tag, payload):
        data = tag + payload
        return (
            struct.pack(">I", len(payload)) + data
            + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 1)  # interlace=1
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(bytes(raw))))
        f.write(chunk(b"IEND", b""))


def test_interlaced_depth_png(tmp_path):
    """Adam7-interlaced depth PNGs must decode correctly (regression: a
    single-pass png_read_row loop returned pass-1 garbage with rc=0)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 60000, (21, 13), np.uint16)  # odd dims hit all passes
    p = str(tmp_path / "ilace.png")
    _write_adam7_gray16_png(p, img)
    ref = np.asarray(Image.open(p))  # PIL handles interlace
    np.testing.assert_array_equal(ref, img)  # writer sanity
    out = native.decode_clip_depth([p], 1000.0)
    np.testing.assert_array_equal(out[0], img.astype(np.float32) / 1000.0)


def test_image_info_is_header_only(media, tmp_path):
    """info must succeed from the header even when the file body is
    truncated (proves no full decode / full read is needed)."""
    for key, kind in (("png", 0), ("jpg", 1), ("webp", 2), ("depth", 3)):
        with open(media[key], "rb") as f:
            head = f.read()
        # keep enough for headers (jpeg SOF sits past the huffman tables in
        # tiny files, so keep half) but strip the tail
        p = str(tmp_path / f"trunc_{key}")
        with open(p, "wb") as f:
            f.write(head[: max(len(head) // 2, 256)])
        h, w, k = native.image_info(p)
        assert (h, w) == (40, 56), key
        assert k == kind, key


def test_associate_empty_ref():
    from unigeo_tpu.data.trajectories import associate_timestamps

    qi, ri = associate_timestamps(np.array([1.0, 2.0]), np.array([]))
    assert len(qi) == 0 and len(ri) == 0
    qi, ri = associate_timestamps(np.array([]), np.array([1.0]))
    assert len(qi) == 0 and len(ri) == 0


# ---------------------------------------------------------------------------
# native EXR codec (unigeo_tpu/data/exr.py) — MatrixCity depth path


def test_exr_roundtrip_all_modes(tmp_path, rng):
    from unigeo_tpu.data.exr import read_exr, write_exr

    a = (rng.random((37, 53)) * 50).astype(np.float32)
    for comp in ("NONE", "ZIPS", "ZIP"):
        p = str(tmp_path / f"{comp}.exr")
        write_exr(p, a, compression=comp)
        np.testing.assert_array_equal(read_exr(p), a)
    # HALF quantizes on write; constant image stresses the zip predictor
    p = str(tmp_path / "half.exr")
    write_exr(p, a, pixel_type="HALF", compression="ZIP")
    np.testing.assert_allclose(read_exr(p), a.astype(np.float16), atol=0)
    c = np.full((40, 64), 7.25, np.float32)  # 40 rows: a partial ZIP chunk
    write_exr(str(tmp_path / "c.exr"), c, compression="ZIP")
    np.testing.assert_array_equal(read_exr(str(tmp_path / "c.exr")), c)


def test_exr_multichannel_and_named_read(tmp_path, rng):
    from unigeo_tpu.data.exr import read_exr, write_exr

    chans = {
        "R": rng.random((16, 16)).astype(np.float32),
        "Z": rng.random((16, 16)).astype(np.float32),
    }
    p = str(tmp_path / "mc.exr")
    write_exr(p, chans, compression="ZIP")
    out = read_exr(p)
    assert set(out) == {"R", "Z"}
    np.testing.assert_array_equal(read_exr(p, channel="Z"), chans["Z"])
    with pytest.raises(KeyError):
        read_exr(p, channel="Y")
