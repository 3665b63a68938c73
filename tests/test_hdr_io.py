"""Radiance .hdr reader round-trip test (writer built in the test)."""

import numpy as np

from realism_effects_tpu.utils.image_io import read_hdr


def _write_hdr_flat(path, rgb):
    """Minimal uncompressed RGBE writer for the round-trip test."""
    h, w = rgb.shape[:2]
    maxc = np.maximum(rgb.max(-1), 1e-32)
    exp = np.ceil(np.log2(maxc)).astype(np.int32) + 1
    # mantissa in [0, 256)
    scale = np.ldexp(1.0, -exp + 8)
    mant = np.clip(rgb * scale[..., None] + 0.5, 0, 255).astype(np.uint8)
    e = np.where(maxc < 1e-30, 0, exp + 128).astype(np.uint8)
    rgbe = np.concatenate([mant, e[..., None]], -1)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0.01, 50.0, (16, 32, 3))).astype(np.float32)
    path = str(tmp_path / "test.hdr")
    _write_hdr_flat(path, img)
    back = read_hdr(path)
    assert back.shape == (16, 32, 3)
    back = back[::-1]  # undo the bottom-up flip for comparison
    # shared-exponent format: error is relative to the pixel max channel
    maxc = img.max(-1, keepdims=True)
    rel = np.abs(back - img) / (maxc + 1e-3)
    assert np.median(rel) < 0.005
    assert rel.max() < 2.0 / 255.0


def test_hdr_rle(tmp_path):
    """New-style RLE scanlines decode correctly."""
    h, w = 4, 64
    img = np.zeros((h, w, 3), np.float32)
    img[:, :32] = 2.0  # constant run then another run
    img[:, 32:] = 0.5
    # write with RLE: encode each channel as runs
    maxc = np.maximum(img.max(-1), 1e-32)
    exp = np.ceil(np.log2(maxc)).astype(np.int32) + 1
    scale = np.ldexp(1.0, -exp + 8)
    mant = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    e = (exp + 128).astype(np.uint8)
    rgbe = np.concatenate([mant, e[..., None]], -1)
    out = bytearray()
    out += b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
    out += f"-Y {h} +X {w}\n".encode()
    for y in range(h):
        out += bytes([2, 2, w >> 8, w & 0xFF])
        for c in range(4):
            row = rgbe[y, :, c]
            x = 0
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 127:
                    run += 1
                out += bytes([128 + run, int(row[x])])
                x += run
    path = str(tmp_path / "rle.hdr")
    with open(path, "wb") as f:
        f.write(bytes(out))
    back = read_hdr(path)[::-1]
    maxc = img.max(-1, keepdims=True)
    rel = np.abs(back - img) / (maxc + 1e-3)
    assert rel.max() < 0.02
