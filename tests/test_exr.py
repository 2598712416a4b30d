"""EXR reader tests against self-generated files (NONE and ZIP scanline,
HALF and FLOAT channels)."""

import struct
import zlib

import numpy as np

from craytracer_tpu.io.exr import read_exr


def _attr(name: bytes, atype: bytes, data: bytes) -> bytes:
    return name + b"\0" + atype + b"\0" + struct.pack("<i", len(data)) + data


def _channels_fixed(ptype: int) -> bytes:
    out = b""
    for name in (b"B", b"G", b"R"):
        out += name + b"\0" + struct.pack("<i", ptype)
        out += b"\0" * 4  # pLinear + reserved[3]
        out += struct.pack("<ii", 1, 1)  # x/y sampling
    return out + b"\0"


def _write_exr(path, img: np.ndarray, ptype: int, compression: int):
    """Minimal single-part scanline EXR writer (testing only)."""
    h, w, _ = img.shape
    dtype = np.float16 if ptype == 1 else np.float32
    lines_per_block = 16 if compression == 3 else 1
    header = struct.pack("<ii", 20000630, 2)
    header += _attr(b"channels", b"chlist", _channels_fixed(ptype))
    header += _attr(b"compression", b"compression", bytes([compression]))
    header += _attr(b"dataWindow", b"box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr(b"displayWindow", b"box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr(b"lineOrder", b"lineOrder", b"\0")
    header += _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    header += _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\0"

    blocks = []
    num_blocks = (h + lines_per_block - 1) // lines_per_block
    for bi in range(num_blocks):
        y0 = bi * lines_per_block
        nlines = min(lines_per_block, h - y0)
        raw = b""
        for li in range(nlines):
            for ci, ch in enumerate((2, 1, 0)):  # B, G, R planes
                raw += img[y0 + li, :, ch].astype(dtype).tobytes()
        if compression == 0:
            data = raw
        else:
            # EXR zip: interleave-split then delta then deflate
            arr = np.frombuffer(raw, np.uint8).astype(np.int64)
            n = len(arr)
            half = (n + 1) // 2
            t = np.empty(n, np.int64)
            t[:half] = arr[0::2]
            t[half:] = arr[1::2]
            d = np.empty(n, np.int64)
            d[0] = t[0]
            d[1:] = (t[1:] - t[:-1] + 128) & 0xFF
            data = zlib.compress(d.astype(np.uint8).tobytes())
            if len(data) >= len(raw):
                data = raw  # stored raw when zip doesn't help (EXR rule)
        blocks.append((y0, data))

    # offset table
    out = header
    table_pos = len(out) + 8 * num_blocks
    offsets = []
    pos = table_pos
    for y0, data in blocks:
        offsets.append(pos)
        pos += 8 + len(data)
    for off in offsets:
        out += struct.pack("<q", off)
    for y0, data in blocks:
        out += struct.pack("<ii", y0, len(data))
        out += data
    with open(path, "wb") as f:
        f.write(out)


def _ramp(h, w):
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = np.linspace(0, 4, w)[None, :]
    img[..., 1] = np.linspace(0, 2, h)[:, None]
    img[..., 2] = 0.25
    return img


def test_exr_none_float(tmp_path):
    img = _ramp(8, 16)
    p = str(tmp_path / "t.exr")
    _write_exr(p, img, ptype=2, compression=0)
    out = read_exr(p)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_exr_none_half(tmp_path):
    img = _ramp(6, 10)
    p = str(tmp_path / "t.exr")
    _write_exr(p, img, ptype=1, compression=0)
    out = read_exr(p)
    np.testing.assert_allclose(out, img, atol=2e-3)


def test_exr_zip(tmp_path):
    img = _ramp(20, 12)  # spans two 16-line ZIP blocks
    p = str(tmp_path / "t.exr")
    _write_exr(p, img, ptype=2, compression=3)
    out = read_exr(p)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_exr_zips_half(tmp_path):
    img = _ramp(5, 8)
    p = str(tmp_path / "t.exr")
    _write_exr(p, img, ptype=1, compression=2)
    out = read_exr(p)
    np.testing.assert_allclose(out, img, atol=2e-3)


def test_write_exr_roundtrip(tmp_path):
    """write_exr (ZIP, FLOAT RGB) round-trips bit-exactly through
    read_exr, including HDR values and odd dimensions. (No external EXR
    backend exists in this environment; the reader itself is validated
    against reference-generated files elsewhere in this suite.)"""
    import numpy as np

    from craytracer_tpu.io.exr import read_exr, write_exr

    rng = np.random.default_rng(3)
    for shape in ((16, 16, 3), (37, 53, 3), (1, 5, 3), (17, 1, 3)):
        img = (rng.random(shape) * 1e4).astype(np.float32)
        p = str(tmp_path / "t.exr")
        write_exr(p, img)
        np.testing.assert_array_equal(read_exr(p), img)
    # incompressible data falls back to raw block storage
    img = rng.integers(0, 2**32, (20, 20, 3)).astype(np.float32)
    p = str(tmp_path / "raw.exr")
    write_exr(p, img)
    np.testing.assert_array_equal(read_exr(p), img)
