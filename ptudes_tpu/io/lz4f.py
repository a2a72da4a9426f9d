"""Dependency-free LZ4 codec (block + frame) for ROS bag chunks.

ROS1 bags compress chunks with LZ4 frame format (roslz4); the reference
reads them transparently through ``rosbags`` (reference
``src/ptudes/bag.py:41``). This module removes the repo's last optional
IO dependency: a real pure-Python LZ4 — full block decompressor
(literals + matches, overlapping copies), a greedy hash-table block
compressor (used for fixtures/round-trip tests; output is valid LZ4 any
decoder accepts), and the frame layer (magic, descriptor, block
sizes, skippable frames). Checksums (xxHash32) are parsed and skipped,
not verified — bag integrity is protected by the bag's own structure.

Throughput is pure-Python (~5-20 MB/s decompress) — fine for offline
bag decode where chunks are ~1 MB; the numpy packet parsers downstream
dominate. Spec: https://github.com/lz4/lz4/blob/dev/doc (public
format documentation).
"""
from __future__ import annotations

import struct

FRAME_MAGIC = 0x184D2204
_SKIP_MAGIC_LO = 0x184D2A50  # 0x184D2A50..5F are skippable frames

MIN_MATCH = 4


def block_decompress(src: bytes, max_out: int = 1 << 30,
                     history: bytes = b"") -> bytes:
    """Decompress one raw LZ4 block (no frame header).

    ``history``: previously-decoded output for block-LINKED frames —
    matches may reach back up to 64 KB into it (the LZ4 window). Only
    the decoded bytes of THIS block are returned.

    Uses the native C++ decoder when available (~100x the pure-Python
    throughput; same ValueError contract on malformed input), with the
    pure-Python body as the always-available fallback."""
    from .. import native
    nat = native.lz4_block_decompress(src, max_out=max_out,
                                      history=history)
    if nat is not None:
        return nat
    out = bytearray(history)
    h0 = len(out)
    i, n = 0, len(src)
    try:
        while i < n:
            token = src[i]
            i += 1
            # literals
            lit = token >> 4
            if lit == 15:
                while True:
                    b = src[i]
                    i += 1
                    lit += b
                    if b != 255:
                        break
            if lit:
                if i + lit > n:
                    raise ValueError("lz4: literal run past end of block")
                out += src[i:i + lit]
                i += lit
                if len(out) - h0 > max_out:
                    raise ValueError("lz4: output exceeds limit")
            if i >= n:
                break  # last sequence carries literals only
            # match
            offset = src[i] | (src[i + 1] << 8)
            i += 2
            if offset == 0:
                raise ValueError("lz4: zero match offset")
            mlen = token & 0xF
            if mlen == 15:
                while True:
                    b = src[i]
                    i += 1
                    mlen += b
                    if b != 255:
                        break
            mlen += MIN_MATCH
            start = len(out) - offset
            if start < 0:
                raise ValueError("lz4: match offset before block start")
            # overlapping copy semantics: byte-by-byte from start
            if offset >= mlen:
                out += out[start:start + mlen]
            else:
                for k in range(mlen):
                    out.append(out[start + k])
            if len(out) - h0 > max_out:
                raise ValueError("lz4: output exceeds limit")
    except IndexError:
        # truncated input: an extension-byte or offset read past the end
        raise ValueError("lz4: truncated block") from None
    return bytes(out[h0:])


def _write_varlen(ba: bytearray, v: int) -> None:
    while v >= 255:
        ba.append(255)
        v -= 255
    ba.append(v)


def block_compress(data: bytes) -> bytes:
    """Greedy hash-table LZ4 block compressor.

    Standard-conformant output (12-byte end guard: the last 5 bytes are
    always literals and no match starts within the last 12), not
    bit-identical to reference lz4 — any decoder accepts it.
    """
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)
        return bytes(out)
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    # matches must not extend into the last 5 bytes; no match starts in
    # the last 12 (lz4 block spec end conditions)
    limit = n - 12
    while i <= limit:
        key = data[i:i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF and data[j:j + 4] == key:
            # extend the match (stop 5 bytes before the end)
            m = i + 4
            p = j + 4
            end = n - 5
            while m < end and data[m] == data[p]:
                m += 1
                p += 1
            lit = data[anchor:i]
            mlen = m - i - MIN_MATCH
            token = (min(len(lit), 15) << 4) | min(mlen, 15)
            out.append(token)
            if len(lit) >= 15:
                _write_varlen(out, len(lit) - 15)
            out += lit
            out += struct.pack("<H", i - j)
            if mlen >= 15:
                _write_varlen(out, mlen - 15)
            anchor = m
            i = m
        else:
            i += 1
    # trailing literals
    lit = data[anchor:]
    token = min(len(lit), 15) << 4
    out.append(token)
    if len(lit) >= 15:
        _write_varlen(out, len(lit) - 15)
    out += lit
    return bytes(out)


def frame_decompress(buf: bytes) -> bytes:
    """Decompress a complete LZ4 frame stream (possibly multiple frames,
    including skippable ones) to bytes.

    Block-LINKED frames (the python-lz4 / lz4 CLI default: FLG bit 5
    clear) are supported: each block decodes against the last 64 KB of
    the frame's accumulated output, so cross-block match references
    resolve exactly as the reference's ``lz4.frame.decompress`` did."""
    out = bytearray()
    i, n = 0, len(buf)
    try:
        while i + 4 <= n:
            (magic,) = struct.unpack_from("<I", buf, i)
            i += 4
            if (magic & 0xFFFFFFF0) == _SKIP_MAGIC_LO:
                (size,) = struct.unpack_from("<I", buf, i)
                i += 4 + size
                continue
            if magic != FRAME_MAGIC:
                raise ValueError(f"lz4: bad frame magic 0x{magic:08x}")
            flg = buf[i]
            i += 2  # FLG + BD
            version = flg >> 6
            if version != 1:
                raise ValueError(
                    f"lz4: unsupported frame version {version}")
            block_indep = bool(flg & 0x20)
            block_cksum = bool(flg & 0x10)
            has_content_size = bool(flg & 0x08)
            content_cksum = bool(flg & 0x04)
            has_dict_id = bool(flg & 0x01)
            if has_content_size:
                i += 8
            if has_dict_id:
                # a frame requiring an external dictionary would decode to
                # silently wrong bytes (early matches reference a window we
                # don't have); roslz4 never emits dict frames, so reject
                raise ValueError(
                    "lz4: frame requires an external dictionary "
                    "(unsupported)")
            i += 1  # header checksum (xxh32 byte) — not verified
            frame_start = len(out)
            while True:
                (bsize,) = struct.unpack_from("<I", buf, i)
                i += 4
                if bsize == 0:  # EndMark
                    break
                uncompressed = bool(bsize & 0x80000000)
                bsize &= 0x7FFFFFFF
                blk = buf[i:i + bsize]
                i += bsize
                if block_cksum:
                    i += 4
                if uncompressed:
                    out += blk
                elif block_indep:
                    out += block_decompress(blk)
                else:
                    # linked blocks: window is the last 64 KB of THIS
                    # frame's output
                    lo = max(frame_start, len(out) - 65536)
                    out += block_decompress(blk, history=bytes(out[lo:]))
            if content_cksum:
                i += 4
        if i != n:
            # < 4 trailing bytes cannot start a frame; silently ignoring
            # them would make this laxer than the native decoder
            raise ValueError(
                f"lz4: {n - i} trailing bytes after last frame")
    except struct.error:
        raise ValueError("lz4: truncated frame") from None
    return bytes(out)


def frame_compress(data: bytes, block_size: int = 1 << 20) -> bytes:
    """Produce a minimal valid LZ4 frame (block-independent, no
    checksums) — used to build lz4-bag test fixtures."""
    out = bytearray()
    out += struct.pack("<I", FRAME_MAGIC)
    flg = (1 << 6) | 0x20  # version 1, block independence
    bd = 0x70              # 4 MB max block size field
    # header checksum byte: (xxh32(desc) >> 8) & 0xFF — decoders we care
    # about (including this module) don't verify it; emit the real value
    # via a tiny xxh32 so strict decoders accept fixtures too
    desc = bytes([flg, bd])
    out += desc
    out.append(_xxh32(desc, seed=0) >> 8 & 0xFF)
    for lo in range(0, max(len(data), 1), block_size):
        chunk = data[lo:lo + block_size]
        if not chunk:
            break
        comp = block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", 0x80000000 | len(chunk))
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


def _xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (public domain algorithm) — for frame header checksums."""
    P1, P2, P3, P4, P5 = (2654435761, 2246822519, 3266489917,
                          668265263, 374761393)
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 16:
            (a, b, c, d) = struct.unpack_from("<IIII", data, i)
            v1 = (rotl((v1 + a * P2) & M, 13) * P1) & M
            v2 = (rotl((v2 + b * P2) & M, 13) * P1) & M
            v3 = (rotl((v3 + c * P2) & M, 13) * P1) & M
            v4 = (rotl((v4 + d * P2) & M, 13) * P1) & M
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 4:
        (a,) = struct.unpack_from("<I", data, i)
        h = (rotl((h + a * P3) & M, 17) * P4) & M
        i += 4
    while i < n:
        h = (rotl((h + data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h
