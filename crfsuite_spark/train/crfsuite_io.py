"""Binary ``.crfsuite`` (lCRF/FOMC v100) model interop.

The reference persists trained models as a single binary file
(src/crf/src/crf1d_model.c): a 48-byte header (magic ``lCRF``, type
``FOMC``, version 100, counts + section offsets,
crf1d_model.c:43-75), a ``FEAT`` chunk of 20-byte feature records
(type u32, src u32, dst u32, weight f64 — crf1d_model.c:925-939),
two CQDB string-interning chunks (labels, attributes —
src/cqdb/src/cqdb.c), and two featureref chunks (``LFRF``/``AFRF``
adjacency lists used by the tagger's sparse scoring,
crf1d_model.c, crf1d_tag.c:62-100). All integers little-endian
(crf1d_model.c write_uint32/read_uint32); weights are IEEE-754
doubles stored little-endian (write_float).

This module reads AND writes that exact layout so models migrate in
both directions: ``read_model`` lets a user load an R-package-trained
``.crfsuite`` file into this engine (``CRFModel.from_crfsuite``);
``write_model`` produces files the reference's ``as.crf`` /
``Tagger::open`` can consume — including real CQDB hash tables (the
Jenkins lookup3 ``hashlittle`` over the NUL-terminated key,
cqdb.c:186-196) and per-attribute feature references, since the C
tagger scores through those. Zero-weight features and orphaned
attributes are pruned with compact renumbering at write, exactly like
``crf1de_save_model`` (crf1d_encode.c:582-618).

Everything here is a bounded driver-side operation: the artifact is
model-sized (the same object we broadcast for decode), never data-
sized.
"""

from __future__ import annotations

import struct

import numpy as np

FILEMAGIC = b"lCRF"
MODELTYPE = b"FOMC"
VERSION = 100
HEADER_SIZE = 48
CHUNK_SIZE = 12
FEATURE_SIZE = 20
FT_STATE, FT_TRANS = 0, 1

_CQDB_MAGIC = b"CQDB"
_CQDB_BYTEORDER = 0x62445371
_CQDB_NUM_TABLES = 256
_CQDB_HEADER = 24  # chunkid, size, flag, byteorder, bwd_size, bwd_offset
_CQDB_OFFSET_DATA = _CQDB_HEADER + 8 * _CQDB_NUM_TABLES

_M32 = 0xFFFFFFFF


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & _M32


def hashlittle(data: bytes, initval: int = 0) -> int:
    """Jenkins lookup3 ``hashlittle`` (public domain; the hash CQDB
    keys with — cqdb.c:186, lookup3.c). Keys are hashed INCLUDING the
    trailing NUL (``strlen(str)+1``, cqdb.c:185)."""
    length = len(data)
    a = b = c = (0xDEADBEEF + length + initval) & _M32
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i:i + 4], "little")) & _M32
        b = (b + int.from_bytes(data[i + 4:i + 8], "little")) & _M32
        c = (c + int.from_bytes(data[i + 8:i + 12], "little")) & _M32
        # mix(a,b,c) — lookup3.c:114-122
        a = (a - c) & _M32; a ^= _rot(c, 4); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot(a, 6); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot(b, 8); b = (b + a) & _M32
        a = (a - c) & _M32; a ^= _rot(c, 16); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot(a, 19); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot(b, 4); b = (b + a) & _M32
        i += 12
        length -= 12
    if length:
        # the tail switch adds only the present bytes; zero-padding to
        # a full 12-byte block is arithmetically identical
        buf = data[i:] + b"\x00" * (12 - length)
        a = (a + int.from_bytes(buf[0:4], "little")) & _M32
        b = (b + int.from_bytes(buf[4:8], "little")) & _M32
        c = (c + int.from_bytes(buf[8:12], "little")) & _M32
        # final(a,b,c) — lookup3.c:149-158
        c ^= b; c = (c - _rot(b, 14)) & _M32
        a ^= c; a = (a - _rot(c, 11)) & _M32
        b ^= a; b = (b - _rot(a, 25)) & _M32
        c ^= b; c = (c - _rot(b, 16)) & _M32
        a ^= c; a = (a - _rot(c, 4)) & _M32
        b ^= a; b = (b - _rot(a, 14)) & _M32
        c ^= b; c = (c - _rot(b, 24)) & _M32
    # length == 0: "zero length strings require no mixing" (lookup3.c)
    return c


# --------------------------------------------------------------------------
# CQDB
# --------------------------------------------------------------------------

def read_cqdb(buf: bytes, begin: int) -> list[str | None]:
    """id → string from a CQDB chunk's backward array (cqdb.c header at
    chunk start; records are [id u32][ksize u32][key bytes incl NUL])."""
    if buf[begin:begin + 4] != _CQDB_MAGIC:
        raise ValueError("not a CQDB chunk")
    _size, _flag, byteorder, bwd_size, bwd_offset = struct.unpack_from(
        "<IIIII", buf, begin + 4
    )
    if byteorder != _CQDB_BYTEORDER:
        raise ValueError("CQDB byte-order check failed")
    out: list[str | None] = [None] * bwd_size
    for i in range(bwd_size):
        (rec,) = struct.unpack_from("<I", buf, begin + bwd_offset + 4 * i)
        if rec == 0:
            continue  # id never assigned (cqdb.c backlink default)
        rid, ksize = struct.unpack_from("<II", buf, begin + rec)
        if rid != i:
            raise ValueError(f"CQDB backward array corrupt at id {i}")
        raw = buf[begin + rec + 8: begin + rec + 8 + ksize]
        out[i] = raw.rstrip(b"\x00").decode("utf-8")
    return out


def write_cqdb(pairs: list[tuple[str, int]]) -> bytes:
    """Serialize (string, id) pairs as one CQDB chunk, byte-compatible
    with cqdb_writer/cqdb_writer_close: data records, per-table
    open-addressed hash buckets (slot ``(hash>>8) %% (2·num)``, linear
    probe — cqdb.c:305-318), backward array, header + 256 tablerefs."""
    records = bytearray()
    tables: list[list[tuple[int, int]]] = [[] for _ in range(_CQDB_NUM_TABLES)]
    bwd_num = 0
    bwd: dict[int, int] = {}
    cur = _CQDB_OFFSET_DATA
    for s, i in pairs:
        if i < 0:
            raise ValueError("CQDB ids must be non-negative")
        key = s.encode("utf-8") + b"\x00"
        hv = hashlittle(key, 0)
        records += struct.pack("<II", i, len(key)) + key
        tables[hv % _CQDB_NUM_TABLES].append((hv, cur))
        bwd[i] = cur
        bwd_num = max(bwd_num, i + 1)
        cur += 8 + len(key)
    ht = bytearray()
    refs = []
    tcur = cur
    for t in tables:
        if not t:
            refs.append((0, 0))
            continue
        n = len(t) * 2
        slots: list[tuple[int, int]] = [(0, 0)] * n
        for hv, off in t:
            k = (hv >> 8) % n
            while slots[k][1] != 0:
                k = (k + 1) % n
            slots[k] = (hv, off)
        for hv, off in slots:
            ht += struct.pack("<II", hv, off)
        refs.append((tcur, n))
        tcur += n * 8
    bwd_offset = cur + len(ht)
    bwd_bytes = b"".join(
        struct.pack("<I", bwd.get(i, 0)) for i in range(bwd_num)
    )
    size = bwd_offset + len(bwd_bytes)
    header = _CQDB_MAGIC + struct.pack(
        "<IIIII", size, 0, _CQDB_BYTEORDER, bwd_num, bwd_offset if bwd_num else 0
    )
    tablerefs = b"".join(struct.pack("<II", off, n) for off, n in refs)
    return bytes(header + tablerefs + records + ht + bwd_bytes)


# --------------------------------------------------------------------------
# model file
# --------------------------------------------------------------------------

def read_model(path: str):
    """Parse a binary ``.crfsuite`` file → (labels, attrs, state_w,
    trans_w): the dense [A, L]/[L, L] weight matrices this engine
    broadcasts. Mirrors crf1dm_new_impl (header validation,
    crf1d_model.c:709-767) + crf1dm_get_feature (record walk,
    crf1d_model.c:925-939); the featureref chunks are redundant with
    the feature records' (src, dst) fields and are not needed here."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[0:4] != FILEMAGIC:
        raise ValueError(f"{path}: not a crfsuite model (bad magic)")
    (size,) = struct.unpack_from("<I", buf, 4)
    if buf[8:12] != MODELTYPE:
        raise ValueError(f"{path}: unsupported model type {buf[8:12]!r}")
    (version, num_features, num_labels, num_attrs, off_features,
     off_labels, off_attrs, _off_lrefs, _off_arefs) = struct.unpack_from(
        "<IIIIIIIII", buf, 12
    )
    if version != VERSION:
        raise ValueError(f"{path}: unsupported model version {version}")
    if size > len(buf):
        raise ValueError(f"{path}: truncated (header says {size} bytes)")
    labels_full = read_cqdb(buf, off_labels)
    attrs_full = read_cqdb(buf, off_attrs)
    labels = [s if s is not None else "" for s in labels_full[:num_labels]]
    attrs = [s if s is not None else "" for s in attrs_full[:num_attrs]]
    A, L = num_attrs, num_labels
    state_w = np.zeros((A, L), dtype=np.float64)
    trans_w = np.zeros((L, L), dtype=np.float64)
    base = off_features + CHUNK_SIZE
    for fid in range(num_features):
        off = base + FEATURE_SIZE * fid
        ftype, src, dst = struct.unpack_from("<III", buf, off)
        (weight,) = struct.unpack_from("<d", buf, off + 12)
        if ftype == FT_STATE:
            state_w[src, dst] = weight
        elif ftype == FT_TRANS:
            trans_w[src, dst] = weight
        else:
            raise ValueError(f"{path}: unknown feature type {ftype}")
    return labels, attrs, state_w, trans_w


def write_model(
    path: str,
    labels: list[str],
    attrs: list[str],
    state_w: np.ndarray,
    trans_w: np.ndarray,
) -> None:
    """Write a binary ``.crfsuite`` file the reference can open.

    Section order matches crf1de_save_model (crf1d_encode.c:570-766):
    FEAT, labels CQDB, attrs CQDB, LFRF (num = L+2 like the encoder's
    open_labelrefs(L+2), last two offsets zero), AFRF. Zero-weight
    features are pruned and surviving attributes renumbered compactly
    in first-seen order (crf1d_encode.c:582-618). Featureref lists are
    real (transition fids per from-label, state fids per attribute) —
    the C tagger scores through them (crf1d_tag.c:62-123)."""
    A, L = state_w.shape
    assert len(attrs) == A and len(labels) == L and trans_w.shape == (L, L)
    feats: list[tuple[int, int, int, float]] = []
    amap: dict[int, int] = {}
    kept_attrs: list[str] = []
    # state features first, in original-attribute order → first-seen
    # attribute renumbering equals compact ascending order
    for a in range(A):
        row = state_w[a]
        nz = np.nonzero(row)[0]
        if len(nz) == 0:
            continue  # orphaned attribute: pruned (crf1d_encode.c:595)
        amap[a] = len(kept_attrs)
        kept_attrs.append(attrs[a])
        for l in nz:
            feats.append((FT_STATE, amap[a], int(l), float(row[l])))
    for i in range(L):
        for j in np.nonzero(trans_w[i])[0]:
            feats.append((FT_TRANS, i, int(j), float(trans_w[i, j])))
    K, B = len(feats), len(kept_attrs)

    out = bytearray(b"\x00" * HEADER_SIZE)
    # FEAT chunk
    off_features = len(out)
    out += b"FEAT" + struct.pack("<II", CHUNK_SIZE + FEATURE_SIZE * K, K)
    for ftype, src, dst, w in feats:
        out += struct.pack("<III", ftype, src, dst) + struct.pack("<d", w)
    # label / attribute CQDB chunks (ids in insertion order, like
    # crf1dmw_put_label/put_attr loops)
    off_labels = len(out)
    out += write_cqdb([(s, i) for i, s in enumerate(labels)])
    off_attrs = len(out)
    out += write_cqdb([(s, i) for i, s in enumerate(kept_attrs)])

    def featureref_chunk(chunk_id: bytes, num_slots: int,
                         ref_lists: list[list[int]]) -> tuple[int, bytes]:
        """DWORD-aligned featureref chunk; offsets are ABSOLUTE file
        positions (put_labelref stores ftell)."""
        while len(out) % 4 != 0:
            out.append(0)
        begin = len(out)
        head_size = CHUNK_SIZE + 4 * num_slots
        offsets = [0] * num_slots
        body = bytearray()
        pos = begin + head_size
        for slot, fids in enumerate(ref_lists):
            offsets[slot] = pos
            rec = struct.pack("<I", len(fids)) + b"".join(
                struct.pack("<I", f) for f in fids
            )
            body += rec
            pos += len(rec)
        size = head_size + len(body)
        chunk = chunk_id + struct.pack("<II", size, num_slots)
        chunk += b"".join(struct.pack("<I", o) for o in offsets)
        return begin, bytes(chunk) + bytes(body)

    lrefs: list[list[int]] = [[] for _ in range(L)]
    arefs: list[list[int]] = [[] for _ in range(B)]
    for fid, (ftype, src, _dst, _w) in enumerate(feats):
        (arefs if ftype == FT_STATE else lrefs)[src].append(fid)
    off_labelrefs, chunk = featureref_chunk(b"LFRF", L + 2, lrefs)
    out += chunk
    off_attrrefs, chunk = featureref_chunk(b"AFRF", B, arefs)
    out += chunk

    header = FILEMAGIC + struct.pack("<I", len(out)) + MODELTYPE
    header += struct.pack(
        "<IIIIIIIII", VERSION, K, L, B, off_features, off_labels,
        off_attrs, off_labelrefs, off_attrrefs,
    )
    out[0:HEADER_SIZE] = header
    with open(path, "wb") as f:
        f.write(bytes(out))
