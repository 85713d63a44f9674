"""Minimal pure-Python baseline-TIFF codec (SURVEY.md S9 un-gating).

The reference's raster sources are GeoTIFF files read with a native
geo stack (queue/msr_check.py:43-45, queue/request_tools.py:454-476).
rasterio isn't bundled in this container, so this module implements
the subset of TIFF 6.0 the engine needs from the public spec:

- classic (non-Big) TIFF, both byte orders ('II' and 'MM');
- uncompressed single-band strips OR tiles;
- 8/16/32-bit signed/unsigned integer and 32/64-bit float samples;
- the GDAL_NODATA ASCII tag (42113) for nodata → null mapping.

Crucially ``read_tiff`` takes a pixel ``window`` and decodes ONLY the
strips/tiles that intersect it — the same access pattern rasterio's
windowed reads give — so the mapInPandas tiling in
``sources/raster.py`` stays scale-correct (a task never materializes
more than its tile, whichever decoder serves it).

``write_tiff`` is a matching strip/tile writer used by tests and
fixtures; files it produces are ordinary TIFFs readable by any
conforming reader.
"""

from __future__ import annotations

import mmap
import struct

import numpy as np

# TIFF field types → struct codes / byte sizes
_TYPE_FMT = {1: "B", 2: "c", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i",
             11: "f", 12: "d"}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_TILE_WIDTH = 322
_TAG_TILE_HEIGHT = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_GDAL_NODATA = 42113

_DTYPES = {
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
    (3, 32): "f4", (3, 64): "f8",
}


def _parse_ifd(buf, bo: str) -> dict[int, list]:
    """First IFD of the file → {tag: [values...]}."""
    magic = struct.unpack(bo + "H", buf[2:4])[0]
    if magic != 42:
        raise ValueError(f"not a classic TIFF (magic={magic})")
    (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
    (n_entries,) = struct.unpack(bo + "H", buf[ifd_off:ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, ftype, count = struct.unpack(bo + "HHI", buf[off:off + 8])
        # skip field types we can't DECODE, not just ones we can't
        # size — type 7 (UNDEFINED) is legal TIFF 6.0, has a size, but
        # no struct format; it used to fall through to a KeyError
        # (ADVICE r02)
        if ftype not in _TYPE_SIZE or (
            ftype not in _TYPE_FMT and ftype not in (2, 5, 10)
        ):
            continue
        size = _TYPE_SIZE[ftype] * count
        if size <= 4:
            val_buf = buf[off + 8:off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", buf[off + 8:off + 12])
            val_buf = buf[voff:voff + size]
        if ftype == 2:  # ASCII, NUL-terminated
            tags[tag] = [bytes(val_buf).split(b"\x00")[0].decode("ascii")]
        elif ftype in (5, 10):  # RATIONAL: pairs of (u)int32
            base = "I" if ftype == 5 else "i"
            nums = struct.unpack(bo + base * (2 * count), val_buf)
            tags[tag] = [nums[2 * j] / (nums[2 * j + 1] or 1)
                         for j in range(count)]
        else:
            fmt = _TYPE_FMT[ftype]
            tags[tag] = list(struct.unpack(bo + fmt * count, val_buf))
    return tags


def tiff_info(path: str) -> dict:
    """Header metadata without decoding pixels: width, height, dtype,
    nodata, tiling layout."""
    with open(path, "rb") as f:
        head = f.read(8)
        bo = {b"II": "<", b"MM": ">"}.get(head[:2])
        if bo is None:
            raise ValueError("not a TIFF: bad byte-order mark")
        # mmap, NOT f.read(): the IFD parse touches a few hundred
        # bytes of directory entries, and a full read() would
        # materialize the whole raster in RAM on EVERY header probe —
        # defeating read_tiff's windowed contract (raster.py probes
        # dims once per tile task; an 80 GB GeoTIFF must not be
        # slurped 2400 times). mmap slices fault in only the pages
        # actually touched.
        with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as buf:
            tags = _parse_ifd(buf, bo)
    if tags.get(_TAG_COMPRESSION, [1])[0] != 1:
        raise NotImplementedError("only uncompressed TIFF supported")
    if tags.get(_TAG_SPP, [1])[0] != 1:
        raise NotImplementedError("only single-band TIFF supported")
    fmt = tags.get(_TAG_SAMPLE_FORMAT, [1])[0]
    bps = tags.get(_TAG_BPS, [8])[0]
    dtype = _DTYPES.get((fmt, bps))
    if dtype is None:
        raise NotImplementedError(f"unsupported sample type {fmt}/{bps}")
    nodata = None
    if _TAG_GDAL_NODATA in tags:
        nodata = float(tags[_TAG_GDAL_NODATA][0])
    return {
        "width": tags[_TAG_WIDTH][0],
        "height": tags[_TAG_HEIGHT][0],
        "dtype": bo + dtype,
        "nodata": nodata,
        "tiled": _TAG_TILE_OFFSETS in tags,
        "tags": tags,
        "byte_order": bo,
    }


def read_tiff(path: str, window: tuple[int, int, int, int] | None = None):
    """Decode ``path`` (optionally only the ``(x0, y0, w, h)`` pixel
    window) → (np.ndarray, nodata). Only strips/tiles intersecting the
    window are touched — the file is mmapped, so a small window on a
    huge raster reads a bounded byte range."""
    info = tiff_info(path)
    tags = info["tags"]
    width, height = info["width"], info["height"]
    dt = np.dtype(info["dtype"])
    x0, y0, w, h = window or (0, 0, width, height)
    if x0 < 0 or y0 < 0 or x0 + w > width or y0 + h > height:
        raise ValueError("window outside raster bounds")
    out = np.zeros((h, w), dtype=dt.newbyteorder("="))

    with open(path, "rb") as f, mmap.mmap(
        f.fileno(), 0, access=mmap.ACCESS_READ
    ) as mm:
        if info["tiled"]:
            tw = tags[_TAG_TILE_WIDTH][0]
            th = tags[_TAG_TILE_HEIGHT][0]
            offsets = tags[_TAG_TILE_OFFSETS]
            tiles_per_row = -(-width // tw)
            for ty in range(y0 // th, -(-(y0 + h) // th)):
                for tx in range(x0 // tw, -(-(x0 + w) // tw)):
                    t = ty * tiles_per_row + tx
                    raw = mm[offsets[t]:offsets[t] + tw * th * dt.itemsize]
                    tile = np.frombuffer(raw, dtype=dt).reshape(th, tw)
                    # tile extent in image coords (edge tiles padded)
                    iy0, ix0 = ty * th, tx * tw
                    sy0 = max(y0, iy0); sx0 = max(x0, ix0)
                    sy1 = min(y0 + h, iy0 + th, height)
                    sx1 = min(x0 + w, ix0 + tw, width)
                    out[sy0 - y0:sy1 - y0, sx0 - x0:sx1 - x0] = tile[
                        sy0 - iy0:sy1 - iy0, sx0 - ix0:sx1 - ix0
                    ]
        else:
            rps = tags.get(_TAG_ROWS_PER_STRIP, [height])[0]
            offsets = tags[_TAG_STRIP_OFFSETS]
            for s in range(y0 // rps, -(-(y0 + h) // rps)):
                rows = min(rps, height - s * rps)
                raw = mm[offsets[s]:offsets[s] + rows * width * dt.itemsize]
                strip = np.frombuffer(raw, dtype=dt).reshape(rows, width)
                iy0 = s * rps
                sy0 = max(y0, iy0)
                sy1 = min(y0 + h, iy0 + rows)
                out[sy0 - y0:sy1 - y0, :] = strip[
                    sy0 - iy0:sy1 - iy0, x0:x0 + w
                ]
    return out, info["nodata"]


def _np_sample_format(dtype: np.dtype) -> tuple[int, int]:
    kind = {"u": 1, "i": 2, "f": 3}[dtype.kind]
    return kind, dtype.itemsize * 8


def write_tiff(
    path: str,
    array,
    nodata: float | None = None,
    rows_per_strip: int | None = None,
    tile: tuple[int, int] | None = None,
    byte_order: str = "<",
) -> None:
    """Write a single-band uncompressed TIFF. ``tile=(tw, th)`` emits
    a tiled layout (dimensions must be multiples of 16 per the spec),
    otherwise strips of ``rows_per_strip`` rows (default: whole image
    as one strip)."""
    arr = np.asarray(array)
    if arr.ndim != 2:
        raise ValueError("expected a 2-D single-band array")
    height, width = arr.shape
    arr = arr.astype(arr.dtype.newbyteorder(byte_order))
    fmt_kind, bps = _np_sample_format(arr.dtype)
    bo = byte_order

    chunks: list[bytes] = []
    if tile:
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("tile dims must be multiples of 16")
        for ty in range(0, height, th):
            for tx in range(0, width, tw):
                block = np.zeros((th, tw), dtype=arr.dtype)
                sub = arr[ty:ty + th, tx:tx + tw]
                block[: sub.shape[0], : sub.shape[1]] = sub
                chunks.append(block.tobytes())
    else:
        rps = rows_per_strip or height
        for y in range(0, height, rps):
            chunks.append(arr[y:y + rps, :].tobytes())

    data_start = 8
    offsets, counts, pos = [], [], data_start
    for c in chunks:
        offsets.append(pos)
        counts.append(len(c))
        pos += len(c)
    ifd_off = pos

    # tag -> (type, values); external values appended after the IFD
    entries: list[tuple[int, int, list]] = [
        (_TAG_WIDTH, 4, [width]),
        (_TAG_HEIGHT, 4, [height]),
        (_TAG_BPS, 3, [bps]),
        (_TAG_COMPRESSION, 3, [1]),
        (_TAG_PHOTOMETRIC, 3, [1]),
        (_TAG_SPP, 3, [1]),
        (_TAG_SAMPLE_FORMAT, 3, [fmt_kind]),
    ]
    if tile:
        entries += [
            (_TAG_TILE_WIDTH, 4, [tile[0]]),
            (_TAG_TILE_HEIGHT, 4, [tile[1]]),
            (_TAG_TILE_OFFSETS, 4, offsets),
            (_TAG_TILE_COUNTS, 4, counts),
        ]
    else:
        entries += [
            (_TAG_STRIP_OFFSETS, 4, offsets),
            (_TAG_ROWS_PER_STRIP, 4, [rows_per_strip or height]),
            (_TAG_STRIP_COUNTS, 4, counts),
        ]
    if nodata is not None:
        nd = (f"{int(nodata)}" if float(nodata).is_integer()
              else repr(float(nodata)))
        entries.append((_TAG_GDAL_NODATA, 2, [nd.encode("ascii") + b"\x00"]))
    entries.sort(key=lambda e: e[0])

    ext_off = ifd_off + 2 + 12 * len(entries) + 4
    ifd = struct.pack(bo + "H", len(entries))
    ext = b""
    for tag, ftype, values in entries:
        if ftype == 2:
            payload = values[0]
            count = len(payload)
        else:
            payload = struct.pack(bo + _TYPE_FMT[ftype] * len(values), *values)
            count = len(values)
        if len(payload) <= 4:
            val_field = payload.ljust(4, b"\x00")
        else:
            val_field = struct.pack(bo + "I", ext_off + len(ext))
            ext += payload
        ifd += struct.pack(bo + "HHI", tag, ftype, count) + val_field
    ifd += struct.pack(bo + "I", 0)  # next-IFD pointer: none

    with open(path, "wb") as f:
        f.write((b"II" if bo == "<" else b"MM"))
        f.write(struct.pack(bo + "H", 42))
        f.write(struct.pack(bo + "I", ifd_off))
        for c in chunks:
            f.write(c)
        f.write(ifd)
        f.write(ext)
