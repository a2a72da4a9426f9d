"""LZ4 codec (io.lz4f) + lz4-compressed ROS1 bag end-to-end.

The reference reads lz4-compressed bag chunks transparently through
``rosbags`` (``src/ptudes/bag.py:41``); ``io.lz4f`` removes that last
optional dependency with a dependency-free frame/block codec.
"""
import bz2 as _bz2  # noqa: F401  (ensures stdlib path comparisons work)
import random

import numpy as np
import pytest

from ptudes_tpu.io import lz4f
from ptudes_tpu.io import rosbag as bag_io
from ptudes_tpu.io import sources
from ptudes_tpu.io import packets as pkt

from test_io import make_info, synth_frames


class TestBlock:
    def test_handcrafted_overlap_copy(self):
        # literals "a", match offset 1 len 14 (RLE semantics: overlapping
        # copy extends the single byte), trailing literals "aaaaa"
        blk = (bytes([0x1A]) + b"a" + bytes([0x01, 0x00])
               + bytes([0x50]) + b"aaaaa")
        assert lz4f.block_decompress(blk) == b"a" * 20

    def test_zero_offset_rejected(self):
        blk = bytes([0x10]) + b"a" + bytes([0x00, 0x00])
        with pytest.raises(ValueError):
            lz4f.block_decompress(blk)

    def test_offset_before_start_rejected(self):
        blk = bytes([0x10]) + b"a" + bytes([0x05, 0x00])
        with pytest.raises(ValueError):
            lz4f.block_decompress(blk)

    def test_roundtrip_fuzz(self):
        rng = random.Random(7)
        for _ in range(40):
            n = rng.randrange(0, 4000)
            base = bytes(rng.randrange(5) for _ in range(max(1, n // 9)))
            data = (base * 12)[:n]
            c = lz4f.block_compress(data)
            assert lz4f.block_decompress(c) == data
            if n > 200:
                assert len(c) < len(data)  # repetitive data compresses

    def test_incompressible_roundtrip(self):
        data = bytes(random.Random(3).randrange(256) for _ in range(1000))
        assert lz4f.block_decompress(lz4f.block_compress(data)) == data


class TestFrame:
    def test_roundtrip_multiblock(self):
        data = (b"0123456789abcdef" * 400)[:6000]
        f = lz4f.frame_compress(data, block_size=1024)
        assert lz4f.frame_decompress(f) == data

    def test_empty(self):
        assert lz4f.frame_decompress(lz4f.frame_compress(b"")) == b""

    def test_skippable_frame_skipped(self):
        import struct
        data = b"payload payload payload!"
        skip = struct.pack("<II", 0x184D2A50, 4) + b"\x00" * 4
        f = skip + lz4f.frame_compress(data)
        assert lz4f.frame_decompress(f) == data

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError):
            lz4f.frame_decompress(b"\x00\x01\x02\x03rest")

    def test_xxh32_known_vectors(self):
        # public xxHash32 test values
        assert lz4f._xxh32(b"") == 0x02CC5D05
        assert lz4f._xxh32(b"Hello World") == 0xB1FD16EE


@pytest.mark.parametrize("compression", ["lz4", "bz2"])
def test_compressed_bag_roundtrip(tmp_path, compression):
    """lz4-/bz2-chunked bags decode identically to uncompressed ones
    through the full packet-source path."""
    info = make_info()
    payloads, truth = synth_frames(info, n_frames=2)
    msgs = []
    for ts, p in payloads:
        raw = np.uint32(len(p)).tobytes() + p
        msgs.append(("/os_node/lidar_packets", "ouster_ros/msg/PacketMsg",
                     bag_io.OUSTER_PACKETMSG_MD5, int(ts * 1e9), raw))
    imu_buf = pkt.make_imu_packet(int(2e9), [0, 0, 1.0], [0, 0, 10.0])
    msgs.append(("/os_node/imu_packets", "ouster_ros/msg/PacketMsg",
                 bag_io.OUSTER_PACKETMSG_MD5, int(2e9),
                 np.uint32(len(imu_buf)).tobytes() + imu_buf))
    path = str(tmp_path / f"c_{compression}.bag")
    bag_io.write_simple_bag(path, msgs, messages_per_chunk=20,
                            compression=compression)
    scans, imu = sources.read_ouster_bag(path, info)
    assert len(scans) == 2
    assert np.array_equal(scans.range_mm, truth)
    assert len(imu) == 1


def test_native_matches_python(monkeypatch):
    """Differential: the C++ block decoder and the pure-Python body must
    agree on every input (the Python body is forced by stubbing the
    native hook to 'unavailable')."""
    from ptudes_tpu import native
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = random.Random(21)
    for _ in range(25):
        n = rng.randrange(0, 3000)
        base = bytes(rng.randrange(6) for _ in range(max(1, n // 5)))
        data = (base * 10)[:n]
        c = lz4f.block_compress(data)
        nat = native.lz4_block_decompress(c)
        assert nat == data
        with monkeypatch.context() as m:
            m.setattr(native, "lz4_block_decompress",
                      lambda *a, **k: None)
            assert lz4f.block_decompress(c) == data


class TestLinkedBlocks:
    def test_linked_frame_cross_block_match(self):
        """Block-LINKED frames (python-lz4 / lz4 CLI default) carry
        matches that reach into the PREVIOUS block's output."""
        import struct
        # block 1: literals "abcdefgh"
        b1 = bytes([0x80]) + b"abcdefgh"
        # block 2: match(offset=8, len=8) into block 1, then "WORLD"
        b2 = bytes([0x04, 0x08, 0x00]) + bytes([0x50]) + b"WORLD"
        frame = struct.pack("<I", lz4f.FRAME_MAGIC)
        frame += bytes([0x40, 0x70, 0x00])  # v1, LINKED (bit5 clear)
        frame += struct.pack("<I", len(b1)) + b1
        frame += struct.pack("<I", len(b2)) + b2
        frame += struct.pack("<I", 0)
        assert lz4f.frame_decompress(frame) == b"abcdefghabcdefghWORLD"

    def test_block_history_python_and_native_agree(self):
        from ptudes_tpu import native
        hist = b"0123456789" * 20
        blk = bytes([0x14]) + b"X" + bytes([0xC8, 0x00])  # offset 200
        got_py = lz4f.block_decompress(blk, history=hist)
        # offset 200 from end of (hist + "X") reaches hist[1:9]
        assert got_py == b"X" + (hist + b"X")[-200:][:8]
        if native.get_lib() is not None:
            got_nat = native.lz4_block_decompress(blk, history=hist)
            assert got_nat == got_py

    def test_truncated_inputs_raise_valueerror(self):
        for bad in (bytes([0xF0]),            # ext literal len cut off
                    bytes([0x10, 0x61, 0x05]),  # offset cut off
                    bytes([0x1F, 0x61, 0x01, 0x00])):  # ext mlen cut
            with pytest.raises(ValueError):
                lz4f.block_decompress(bad)
        with pytest.raises(ValueError):
            lz4f.frame_decompress(
                bytes.fromhex("04224d18") + bytes([0x40, 0x70, 0x00]))

    def test_max_out_enforced_both_paths(self):
        from ptudes_tpu import native
        data = b"a" * 10000
        c = lz4f.block_compress(data)
        with pytest.raises(ValueError):
            lz4f.block_decompress(c, max_out=100)
        if native.get_lib() is not None:
            with pytest.raises(ValueError):
                native.lz4_block_decompress(c, max_out=100)
