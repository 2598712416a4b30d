"""Minimal pure-python OpenEXR reader for environment maps.

Stands in for the reference's OpenEXR dependency (readRgba1,
imagefile.h:11-34). Supports single-part scanline images with NONE, ZIPS
(1 line/block) or ZIP (16 lines/block) compression and HALF/FLOAT channels —
which covers standard lat-long HDR env maps. Returns [H, W, 3] float32 (R,G,B).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630
_PIXEL_DTYPES = {0: np.uint32, 1: np.float16, 2: np.float32}  # UINT, HALF, FLOAT


def _read_null_str(buf, pos):
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("latin-1"), end + 1


def _unzip_block(data: bytes) -> bytes:
    raw = zlib.decompress(data)
    # The EXR predictor: t[i] = t[i-1] + d[i] - 128 with t[0] = d[0].
    d = np.frombuffer(raw, np.uint8).astype(np.int64)
    d[1:] = d[1:] - 128
    t = np.cumsum(d) & 0xFF
    # un-interleave: first half -> even positions, second half -> odd
    n = len(t)
    out = np.empty(n, np.uint8)
    half = (n + 1) // 2
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


def read_exr(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x200:
        raise ValueError("multi-part EXR not supported")
    pos = 8

    channels = []  # (name, dtype_code)
    compression = 0
    data_window = None
    while True:
        if buf[pos] == 0:
            pos += 1
            break
        name, pos = _read_null_str(buf, pos)
        atype, pos = _read_null_str(buf, pos)
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        val = buf[pos : pos + size]
        pos += size
        if name == "channels":
            cpos = 0
            while val[cpos] != 0:
                cname_end = val.index(b"\x00", cpos)
                cname = val[cpos:cname_end].decode("latin-1")
                cpos = cname_end + 1
                (ptype,) = struct.unpack_from("<i", val, cpos)
                cpos += 16  # pixel type + pLinear + reserved + x/y sampling
                channels.append((cname, ptype))
        elif name == "compression":
            compression = val[0]
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", val)

    if compression not in (0, 2, 3):  # NONE, ZIPS, ZIP
        raise ValueError(f"unsupported EXR compression {compression}")
    x_min, y_min, x_max, y_max = data_window
    width = x_max - x_min + 1
    height = y_max - y_min + 1
    lines_per_block = {0: 1, 2: 1, 3: 16}[compression]
    num_blocks = (height + lines_per_block - 1) // lines_per_block

    # channels are stored sorted by name; build per-line layout
    ch_sorted = sorted(channels, key=lambda c: c[0])
    dtypes = [_PIXEL_DTYPES[c[1]] for c in ch_sorted]
    line_bytes = sum(np.dtype(d).itemsize for d in dtypes) * width

    pos += 8 * num_blocks  # skip the offset table; blocks follow in order
    planes = {name: np.zeros((height, width), np.float32) for name, _ in ch_sorted}
    for _ in range(num_blocks):
        y, nbytes = struct.unpack_from("<ii", buf, pos)
        pos += 8
        data = buf[pos : pos + nbytes]
        pos += nbytes
        y0 = y - y_min
        nlines = min(lines_per_block, height - y0)
        expect = line_bytes * nlines
        if compression == 0 or nbytes >= expect:
            raw = data[:expect]
        else:
            raw = _unzip_block(data)[:expect]
        off = 0
        for li in range(nlines):
            for (name, _), dt in zip(ch_sorted, dtypes):
                nb = np.dtype(dt).itemsize * width
                row = np.frombuffer(raw, dt, count=width, offset=off)
                planes[name][y0 + li] = row.astype(np.float32)
                off += nb

    def get(name):
        return planes.get(name, np.zeros((height, width), np.float32))

    return np.stack([get("R"), get("G"), get("B")], axis=-1)


def _zip_block(raw: bytes) -> bytes:
    """Inverse of _unzip_block: interleave-split + delta-encode + zlib."""
    t = np.frombuffer(raw, np.uint8)
    n = len(t)
    half = (n + 1) // 2
    re = np.empty(n, np.uint8)
    re[:half] = t[0::2]
    re[half:] = t[1::2]
    d = re.astype(np.int64)
    d[1:] = (d[1:] - d[:-1] + 128) & 0xFF
    return zlib.compress(d.astype(np.uint8).tobytes())


def write_exr(path: str, img: np.ndarray):
    """Scanline EXR writer: FLOAT R/G/B channels, ZIP (16-line blocks) —
    the HDR output counterpart of the reader above (the reference only
    READS EXR env maps, texture.cpp/envmap; writing is a quality-of-life
    addition so renders keep radiance precision instead of 8-bit PPM).
    Round-trips bit-exactly through read_exr."""
    img = np.asarray(img, np.float32)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("write_exr expects [H, W, 3]")
    height, width = img.shape[:2]

    def attr(name: bytes, atype: bytes, val: bytes) -> bytes:
        return name + b"\x00" + atype + b"\x00" + struct.pack("<i", len(val)) + val

    def chan(name: bytes) -> bytes:
        # pixel type FLOAT=2, pLinear 0, reserved, x/y sampling 1
        return name + b"\x00" + struct.pack("<iBBBBii", 2, 0, 0, 0, 0, 1, 1)

    channels_val = chan(b"B") + chan(b"G") + chan(b"R") + b"\x00"
    dw = struct.pack("<iiii", 0, 0, width - 1, height - 1)
    header = b"".join([
        attr(b"channels", b"chlist", channels_val),
        attr(b"compression", b"compression", bytes([3])),  # ZIP
        attr(b"dataWindow", b"box2i", dw),
        attr(b"displayWindow", b"box2i", dw),
        attr(b"lineOrder", b"lineOrder", bytes([0])),  # increasing y
        attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0)),
        attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0)),
        attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0)),
        b"\x00",
    ])

    lines_per_block = 16
    num_blocks = (height + lines_per_block - 1) // lines_per_block
    blocks = []
    for b in range(num_blocks):
        y0 = b * lines_per_block
        nlines = min(lines_per_block, height - y0)
        raw = bytearray()
        for li in range(y0, y0 + nlines):
            # channels sorted by name: B, G, R
            for c in (2, 1, 0):
                raw += img[li, :, c].tobytes()
        comp = _zip_block(bytes(raw))
        if len(comp) >= len(raw):  # spec: store raw when zip does not help
            comp = bytes(raw)
        blocks.append((y0, comp))

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, 2))
        f.write(header)
        offset_table_pos = f.tell()
        data_pos = offset_table_pos + 8 * num_blocks
        offsets = []
        cur = data_pos
        for y0, comp in blocks:
            offsets.append(cur)
            cur += 8 + len(comp)
        f.write(b"".join(struct.pack("<Q", o) for o in offsets))
        for y0, comp in blocks:
            f.write(struct.pack("<ii", y0, len(comp)))
            f.write(comp)
