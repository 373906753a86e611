"""Chunk snippet image crops — the reference's ``crop`` geometry
(``pdf_parser.py:1129-1208``) over numpy page images.

The reference crops ±120 px of context around a chunk's position tags from
the rasterized page images, stitches the regions vertically with 6 px gaps
on a (245,245,245) canvas and dims the two context strips to 50%.  The
RASTERIZER (pdfplumber page rendering) is the external stage here — page
images arrive from an injectable provider — but everything the reference's
``crop`` itself does is implemented for real: tag parsing, the
context-strip synthesis, multi-page region spans, out-of-page clipping
(black fill, as PIL's ``crop`` yields), vertical composition and the
50%-dim of first/last strips.  Output is an ``HxWx3 uint8`` array plus
our PNG encoding (``media/codecs.py``), and the per-strip positions list.
"""

from __future__ import annotations

import re

import numpy as np

from ..media.codecs import encode_png

GAP = 6
CONTEXT = 120
_TAG_RE = re.compile(r"@@([0-9-]+)\t([0-9.\t]+)##")


def parse_position_tags(text: str):
    """→ [(page_list(0-based), left, right, top, bottom)] from @@..## tags."""
    poss = []
    for m in _TAG_RE.finditer(text):
        pn = [int(p) - 1 for p in m.group(1).split("-")]
        left, right, top, bottom = (float(x) for x in
                                    m.group(2).split("\t")[:4])
        poss.append((pn, left, right, top, bottom))
    return poss


def _region(page: np.ndarray, l: int, t: int, r: int, b: int) -> np.ndarray:
    """PIL-crop semantics: requested size, out-of-page area black."""
    h = max(b - t, 0)
    w = max(r - l, 0)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    sl, st = max(l, 0), max(t, 0)
    sr, sb = min(r, page.shape[1]), min(b, page.shape[0])
    if sr > sl and sb > st:
        out[st - t:sb - t, sl - l:sr - l] = page[st:sb, sl:sr]
    return out


def crop(text: str, page_images: list[np.ndarray], zoom: int = 3,
         need_position: bool = False):
    """Reference ``crop``: context strips + tagged regions → stitched image.

    ``page_images``: 0-based list of HxWx3 uint8 arrays at ``zoom``×72 dpi.
    Returns the composed array (and the positions list when asked), or
    None when the text carries no position tags."""
    poss = parse_position_tags(text)
    if not poss:
        return (None, None) if need_position else None

    max_width = max(max(r - l for (_, l, r, _, _) in poss), 6)
    first = poss[0]
    poss.insert(0, ([first[0][0]], first[1], first[2],
                    max(0, first[3] - CONTEXT), max(first[3] - GAP, 0)))
    last = poss[-1]
    page_h = page_images[last[0][-1]].shape[0] / zoom
    poss.append(([last[0][-1]], last[1], last[2],
                 min(page_h, last[4] + GAP), min(page_h, last[4] + CONTEXT)))

    imgs: list[np.ndarray] = []
    dim_idx: set[int] = set()
    positions = []
    for ii, (pns, left, right, top, bottom) in enumerate(poss):
        right = left + max_width
        bottom *= zoom
        for pn in pns[1:]:
            bottom += page_images[pn - 1].shape[0]
        pg = page_images[pns[0]]
        if ii == 0:
            dim_idx.add(len(imgs))
        imgs.append(_region(pg, int(left * zoom), int(top * zoom),
                            int(right * zoom),
                            int(min(bottom, pg.shape[0]))))
        if 0 < ii < len(poss) - 1:
            positions.append((pns[0], left, right, top,
                              min(bottom, pg.shape[0]) / zoom))
        bottom -= pg.shape[0]
        for pn in pns[1:]:
            pg2 = page_images[pn]
            imgs.append(_region(pg2, int(left * zoom), 0,
                                int(right * zoom),
                                int(min(bottom, pg2.shape[0]))))
            if 0 < ii < len(poss) - 1:
                positions.append((pn, left, right, 0,
                                  min(bottom, pg2.shape[0]) / zoom))
            bottom -= pg2.shape[0]
    if imgs:
        dim_idx.add(len(imgs) - 1)

    height = sum(im.shape[0] + GAP for im in imgs)
    width = max(im.shape[1] for im in imgs)
    canvas = np.full((int(height), int(width), 3), 245, dtype=np.uint8)
    y = 0
    for i, im in enumerate(imgs):
        if i in dim_idx:
            # 50% black overlay (alpha 128): out = img·(255-128)/255
            im = ((im.astype(np.uint16) * 127) // 255).astype(np.uint8)
        canvas[y:y + im.shape[0], :im.shape[1]] = im
        y += im.shape[0] + GAP

    return (canvas, positions) if need_position else canvas


def crop_png(text: str, page_images: list[np.ndarray],
             zoom: int = 3) -> bytes | None:
    """Crop composed to real PNG bytes (RGB, our stdlib encoder)."""
    arr = crop(text, page_images, zoom)
    if arr is None:
        return None
    h, w, _ = arr.shape
    return encode_png(arr.tobytes(), w, h, channels=3)
