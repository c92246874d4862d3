"""Generate the checked-in foreign-shaped PNG decode fixtures
(VERDICT r11 item 4).

The repo's PNG encoder (llm/png_codec.py:encode_png) emits filter 0 on
every scanline and a single IDAT chunk, so a decoder filter-path bug is
invisible to self-round-trips, and the existing in-test filter exercise
imports the codec's own ``_paeth`` — a shared-implementation blind
spot. No conformant third-party encoder exists in this container (no
Pillow/matplotlib; Tk has no display), so this tool is the next-best
thing: a forward PNG filter implementation transcribed INDEPENDENTLY
from the public spec (W3C PNG §9 "Filtering" / RFC 2083 §6), sharing
zero code with the decoder (own Paeth predictor, own byte layout), and
emitting the chunk shapes real encoders produce and ours never does:

- fixed-filter streams for each type 1-4 (libpng's "fixed" strategy);
- an ADAPTIVE stream using the minimum-sum-of-absolute-differences
  heuristic — the filter choice libpng/Pillow actually make — so the
  per-row filter sequence is decided by the same rule as real output;
- multi-IDAT splitting at awkward byte boundaries (encoders chunk
  their zlib stream; ours never splits);
- interspersed ancillary chunks (gAMA, pHYs, tEXt before and between
  IDATs) that a conformant decoder must skip.

Fixtures are STATIC checked-in artifacts (tests/fixtures/png/) with
sha256s pinned in manifest.json: the test byte-asserts decode output
against the closed-form lattice AND asserts the fixture bytes
themselves are unchanged, so neither the decoder nor this generator
can drift to match a bug in the other without the diff being visible.

Run from the repo root; writes tests/fixtures/png/ + manifest.json.
Deterministic: rerunning reproduces identical bytes (zlib level
pinned, no timestamps).
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import zlib

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "png",
)

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def lattice(width: int, height: int) -> bytes:
    """Closed-form test lattice. The x*y cross term makes consecutive
    rows non-translates of each other, so Up/Average/Paeth residuals
    differ materially per row (a pure gradient would make several
    filters coincide and mask transposition bugs). The test module
    re-derives this formula independently — keep them in sync."""
    return bytes(
        (x * 31 + y * 57 + c * 97 + x * y) % 256
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )


def lattice_adaptive(width: int, height: int) -> bytes:
    """Regime-switching lattice for the ADAPTIVE fixture: rows cycle
    horizontal-gradient / near-copy-of-previous / high-frequency /
    constant so the MSAD heuristic genuinely picks different filters
    per row (measured: Sub, Up, Average AND Paeth all chosen at
    16x11) instead of collapsing to one type. The test module
    re-derives this formula independently — keep them in sync."""

    def px(x: int, y: int, c: int) -> int:
        r = y % 4
        if r == 0:
            return (x * 37 + c * 11) % 256
        if r == 1:
            return (x * 37 + c * 11 + 3) % 256
        if r == 2:
            return (x * 149 + y * 211 + c * 83 + (x * y * c + 7) ** 2) % 256
        return (y * 5) % 256

    return bytes(
        px(x, y, c)
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )


# ---- forward filtering, transcribed from W3C PNG §9.2 ----------------
# Filt(x) equations, NOT the decoder's inverse loops. bpp = 3 (8-bit RGB).


def _paeth_predictor(a: int, b: int, c: int) -> int:
    """PaethPredictor per W3C PNG §9.4 pseudocode (independent
    transcription; the codec module has its own copy)."""
    p = a + b - c
    pa = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prior: bytes) -> bytes:
    out = bytearray()
    for i, orig in enumerate(row):
        a = row[i - 3] if i >= 3 else 0  # Raw(x-bpp)
        b = prior[i]  # Prior(x)
        c = prior[i - 3] if i >= 3 else 0  # Prior(x-bpp)
        if ftype == 0:  # None
            pred = 0
        elif ftype == 1:  # Sub:   Filt(x) = Raw(x) - Raw(x-bpp)
            pred = a
        elif ftype == 2:  # Up:    Filt(x) = Raw(x) - Prior(x)
            pred = b
        elif ftype == 3:  # Average: floor((Raw(x-bpp)+Prior(x))/2)
            pred = (a + b) // 2
        elif ftype == 4:  # Paeth
            pred = _paeth_predictor(a, b, c)
        else:
            raise ValueError(ftype)
        out.append((orig - pred) & 0xFF)
    return bytes(out)


def _filtered_stream(
    width: int, height: int, rgb: bytes, pick  # pick(y, row, prior) -> ftype
) -> tuple[bytes, list[int]]:
    stride = width * 3
    prior = bytes(stride)
    raw = bytearray()
    chosen = []
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        ftype = pick(y, row, prior)
        chosen.append(ftype)
        raw.append(ftype)
        raw += _filter_row(ftype, row, prior)
        prior = row
    return bytes(raw), chosen


def _msad_pick(y: int, row: bytes, prior: bytes) -> int:
    """Minimum sum of absolute differences over the filtered bytes
    (signed interpretation), the adaptive heuristic the spec suggests
    and libpng implements ('sum of absolute values of outputs ...
    treating the output bytes as signed differences')."""
    best_t, best_cost = 0, None
    for t in range(5):
        filt = _filter_row(t, row, prior)
        cost = sum(v if v < 128 else 256 - v for v in filt)
        if best_cost is None or cost < best_cost:
            best_t, best_cost = t, cost
    return best_t


def _assemble(
    width: int,
    height: int,
    raw: bytes,
    idat_splits: int = 1,
    ancillary: bool = False,
) -> bytes:
    z = zlib.compress(raw, 6)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    parts = [_SIG, _chunk(b"IHDR", ihdr)]
    if ancillary:
        # gAMA 1/2.2 and pHYs chunks as real encoders emit them
        parts.append(_chunk(b"gAMA", struct.pack(">I", 45455)))
        parts.append(
            _chunk(b"pHYs", struct.pack(">IIB", 2835, 2835, 1))
        )
    if idat_splits <= 1:
        parts.append(_chunk(b"IDAT", z))
    else:
        # deliberately awkward boundaries: first split after 1 byte,
        # rest near-even — mid-zlib-header and mid-block splits both
        cuts = [1] + [
            1 + (len(z) - 1) * k // (idat_splits - 1)
            for k in range(1, idat_splits)
        ]
        prev = 0
        for i, cut in enumerate(cuts):
            parts.append(_chunk(b"IDAT", z[prev:cut]))
            prev = cut
            if ancillary and i == 0:
                # tEXt BETWEEN IDATs is invalid per spec ordering, but
                # ancillary-after-first-IDAT chunks (e.g. tIME) occur in
                # the wild and a robust chunk walk must skip, not choke
                parts.append(_chunk(b"tEXt", b"Software\x00spec-transcribed"))
        if prev < len(z):
            parts.append(_chunk(b"IDAT", z[prev:]))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    manifest = {}

    def emit(name: str, width: int, height: int, data: bytes, filters):
        path = os.path.join(OUT_DIR, name)
        with open(path, "wb") as f:
            f.write(data)
        manifest[name] = {
            "width": width,
            "height": height,
            "filters": filters,
            "sha256": hashlib.sha256(data).hexdigest(),
        }
        print(f"  {name}: {width}x{height} filters={filters}")

    # fixed-filter fixtures, one per nontrivial type (libpng "fixed")
    w, h = 9, 7
    rgb = lattice(w, h)
    for t in (1, 2, 3, 4):
        raw, chosen = _filtered_stream(w, h, rgb, lambda y, r, p, t=t: t)
        emit(f"fixed_filter_{t}.png", w, h, _assemble(w, h, raw), chosen)

    # adaptive (MSAD) choice over a bigger lattice, multi-IDAT +
    # ancillary chunks — the closest thing to real libpng/Pillow output
    w2, h2 = 16, 11
    rgb2 = lattice_adaptive(w2, h2)
    raw2, chosen2 = _filtered_stream(w2, h2, rgb2, _msad_pick)
    assert len(set(chosen2)) >= 3, f"adaptive degenerated: {chosen2}"
    emit(
        "adaptive_msad.png",
        w2,
        h2,
        _assemble(w2, h2, raw2, idat_splits=4, ancillary=True),
        chosen2,
    )

    # 1x1 Paeth: left/up/upper-left all absent — the degenerate
    # predictor case (everything predicts 0)
    raw3, chosen3 = _filtered_stream(1, 1, lattice(1, 1), lambda y, r, p: 4)
    emit("one_pixel_paeth.png", 1, 1, _assemble(1, 1, raw3), chosen3)

    with open(os.path.join(OUT_DIR, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote {len(manifest)} fixtures + manifest to {OUT_DIR}")


if __name__ == "__main__":
    main()
