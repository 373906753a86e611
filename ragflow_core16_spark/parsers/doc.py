"""Native legacy ``.doc`` (Word 97-2003) text extraction — no Tika.

The reference routes ``.doc`` files through Apache Tika over a JVM
subprocess (``rag/app/naive.py``: ``tika.parser.from_buffer``).  This
module replaces that external dependency with a stdlib-only reader of the
two formats involved:

  * **CFB / OLE2 compound file** (MS-CFB): 512-byte header, DIFAT → FAT
    sector chains, directory tree, mini-FAT + mini-stream for streams
    under the 4096-byte cutoff;
  * **Word 97 binary** (MS-DOC): FIB in the ``WordDocument`` stream
    (``fcClx``/``lcbClx`` at fixed FIBRgFcLcb97 offsets), CLX/piece table
    in the ``0Table``/``1Table`` stream (``fWhichTblStm`` flag), pieces
    decoded as UTF-16LE or compressed cp1252 (PCD.fc bit 30).

A minimal writer (``build_doc``) emits a valid single-piece file so the
round trip is testable without any external asset.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF


# ------------------------------------------------------------------ reader
def read_cfb(data: bytes) -> dict[str, bytes]:
    """Compound file → {stream_name: bytes} (top-level names, case kept)."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not a compound file")
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    ssz = 1 << sector_shift
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    mssz = 1 << mini_shift
    n_fat = struct.unpack_from("<I", data, 44)[0]
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        return data[off:off + ssz]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    s = first_difat
    for _ in range(n_difat):
        if s in (_ENDOFCHAIN, _FREESECT):
            break
        blk = sector(s)
        entries = struct.unpack(f"<{ssz // 4}I", blk)
        difat.extend(entries[:-1])
        s = entries[-1]
    fat_sectors = [x for x in difat[:n_fat] if x != _FREESECT]
    fat: list[int] = []
    for fs in fat_sectors:
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    def chain(start: int, size: int | None = None) -> bytes:
        out, s = [], start
        seen = set()
        while s not in (_ENDOFCHAIN, _FREESECT) and s not in seen:
            seen.add(s)
            out.append(sector(s))
            s = fat[s] if s < len(fat) else _ENDOFCHAIN
        blob = b"".join(out)
        return blob[:size] if size is not None else blob

    # directory
    dirblob = chain(first_dir)
    entries = []
    for off in range(0, len(dirblob), 128):
        e = dirblob[off:off + 128]
        if len(e) < 128:
            break
        nlen = struct.unpack_from("<H", e, 64)[0]
        if nlen < 2:
            continue
        name = e[:nlen - 2].decode("utf-16-le", errors="ignore")
        etype = e[66]
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<Q", e, 120)[0]
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_stream = chain(root[2], root[3]) if root else b""
    minifat: list[int] = []
    if n_minifat and first_minifat not in (_ENDOFCHAIN, _FREESECT):
        mfblob = chain(first_minifat)
        minifat = list(struct.unpack(f"<{len(mfblob) // 4}I", mfblob))

    def mini_chain(start: int, size: int) -> bytes:
        out, s = [], start
        seen = set()
        while s not in (_ENDOFCHAIN, _FREESECT) and s not in seen:
            seen.add(s)
            out.append(mini_stream[s * mssz:(s + 1) * mssz])
            s = minifat[s] if s < len(minifat) else _ENDOFCHAIN
        return b"".join(out)[:size]

    streams = {}
    for name, etype, start, size in entries:
        if etype != 2:      # stream objects only
            continue
        if size < mini_cutoff:
            streams[name] = mini_chain(start, size)
        else:
            streams[name] = chain(start, size)
    return streams


def extract_doc_text(data: bytes) -> str:
    """Word 97 binary → text (piece-table walk)."""
    streams = read_cfb(data)
    wd = streams.get("WordDocument")
    if wd is None:
        raise ValueError("no WordDocument stream")
    if struct.unpack_from("<H", wd, 0)[0] != 0xA5EC:
        raise ValueError("not a Word 97 binary (bad wIdent)")
    flags = struct.unpack_from("<H", wd, 0x000A)[0]
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name) or streams.get("1Table") \
        or streams.get("0Table")
    if table is None:
        raise ValueError("no Table stream")
    fc_clx = struct.unpack_from("<I", wd, 0x01A2)[0]
    lcb_clx = struct.unpack_from("<I", wd, 0x01A6)[0]
    clx = table[fc_clx:fc_clx + lcb_clx]

    # walk the CLX: Prc blocks (0x01 + cb(2) + grpprl) precede the Pcdt
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:
        cb = struct.unpack_from("<H", clx, pos + 1)[0]
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise ValueError("no Pcdt in CLX")
    lcb = struct.unpack_from("<I", clx, pos + 1)[0]
    plc = clx[pos + 5:pos + 5 + lcb]
    n = (len(plc) - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out = []
    for i in range(n):
        pcd = plc[(n + 1) * 4 + i * 8:(n + 1) * 4 + (i + 1) * 8]
        fc_raw = struct.unpack_from("<I", pcd, 2)[0]
        n_chars = cps[i + 1] - cps[i]
        if fc_raw & 0x40000000:     # compressed: cp1252, fc halved
            fc = (fc_raw & 0x3FFFFFFF) >> 1
            out.append(wd[fc:fc + n_chars].decode("cp1252",
                                                  errors="replace"))
        else:
            fc = fc_raw & 0x3FFFFFFF
            out.append(wd[fc:fc + 2 * n_chars].decode("utf-16-le",
                                                      errors="replace"))
    # Word stores paragraph marks as \r; expose \n like a text file
    return "".join(out).replace("\r", "\n").replace("\x07", "\n")


def doc_lines(data: bytes) -> list[str]:
    """Non-empty lines (the Tika-route section shape in the reference)."""
    return [ln for ln in extract_doc_text(data).split("\n") if ln.strip()]


# ------------------------------------------------------------------ writer
def _dir_entry(name: str, etype: int, start: int, size: int,
               color: int = 1, left: int = _FREESECT,
               right: int = _FREESECT, child: int = _FREESECT) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[:len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = etype
    e[67] = color
    struct.pack_into("<III", e, 68, left, right, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def build_doc(text: str) -> bytes:
    """Minimal valid single-piece Word 97 file (UTF-16 text).

    Streams are padded past the 4096-byte mini-stream cutoff so the FAT
    layout stays a flat chain (no mini-FAT needed); paragraph breaks use
    Word's native ``\\r``."""
    body = text.replace("\n", "\r") + "\r"
    txt = body.encode("utf-16-le")
    text_off = 1024
    wd = bytearray(max(4096, text_off + len(txt)))
    struct.pack_into("<H", wd, 0, 0xA5EC)      # wIdent
    struct.pack_into("<H", wd, 2, 0x00C1)      # nFib (Word 97)
    struct.pack_into("<H", wd, 0x000A, 0x0200)  # fWhichTblStm → 1Table
    wd[text_off:text_off + len(txt)] = txt

    # CLX: Pcdt with one uncompressed piece
    n_chars = len(body)
    plc = struct.pack("<II", 0, n_chars) + struct.pack(
        "<HIH", 0, text_off, 0)                 # PCD: fc bit30 clear
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", wd, 0x01A2, 0)       # fcClx
    struct.pack_into("<I", wd, 0x01A6, len(clx))  # lcbClx
    table = bytearray(4096)
    table[:len(clx)] = clx

    ssz = 512

    def n_sect(b):
        return (len(b) + ssz - 1) // ssz

    dir_sectors = 1
    wd_sectors = n_sect(wd)
    tb_sectors = n_sect(table)
    total = dir_sectors + wd_sectors + tb_sectors
    fat_sectors = (total + (ssz // 4) + 1 - 1) // (ssz // 4 - 0) or 1
    fat_sectors = max(1, (total + fat_sectors + ssz // 4 - 1) // (ssz // 4))
    # sector ids: [0..fat) FAT, then dir, then wd, then table
    dir_start = fat_sectors
    wd_start = dir_start + dir_sectors
    tb_start = wd_start + wd_sectors
    grand_total = tb_start + tb_sectors

    fat = [_FREESECT] * (fat_sectors * (ssz // 4))
    for i in range(fat_sectors):
        fat[i] = 0xFFFFFFFD                     # FATSECT marker
    fat[dir_start] = _ENDOFCHAIN
    for s in range(wd_start, wd_start + wd_sectors - 1):
        fat[s] = s + 1
    fat[wd_start + wd_sectors - 1] = _ENDOFCHAIN
    for s in range(tb_start, tb_start + tb_sectors - 1):
        fat[s] = s + 1
    fat[tb_start + tb_sectors - 1] = _ENDOFCHAIN

    header = bytearray(512)
    header[:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 26, 0x003E)  # minor
    struct.pack_into("<H", header, 28, 0x0003)  # major (512)
    struct.pack_into("<H", header, 30, 9)       # sector shift
    struct.pack_into("<H", header, 32, 6)       # mini shift
    struct.pack_into("<I", header, 44, fat_sectors)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, 4096)    # mini cutoff
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # no miniFAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<I", header, 76 + 4 * i,
                         i if i < fat_sectors else _FREESECT)

    direntries = (
        _dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
        + _dir_entry("WordDocument", 2, wd_start, len(wd), left=_FREESECT,
                     right=2)
        + _dir_entry("1Table", 2, tb_start, len(table))
        + b"\x00" * 128
    )

    def pad(b):
        need = n_sect(b) * ssz
        return bytes(b) + b"\x00" * (need - len(b))

    fat_blob = struct.pack(f"<{len(fat)}I", *fat)[:fat_sectors * ssz]
    out = bytes(header) + fat_blob + pad(direntries) + pad(wd) + pad(table)
    assert len(out) == 512 + grand_total * ssz
    return out
