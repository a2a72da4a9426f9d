// ptudes-tpu native runtime: pcap splitting + Ouster packet decoding.
//
// The compute path of this framework is JAX/XLA/Pallas on TPU; this
// library is the host-side IO runtime — the role ouster-sdk's C++
// PacketFormat/ScanBatcher play for the reference (SURVEY.md section 2b),
// rebuilt for batch throughput: one pass over a memory-mapped capture
// splits UDP payload offsets by size class, and packet decoding writes
// straight into caller-provided dense arrays (zero copies beyond the
// unavoidable decode).
//
// C ABI only (consumed via ctypes); no external dependencies.

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- pcap

// Scan a classic pcap buffer and record (offset, length, ts_ns) of every
// UDP payload. Returns the number of payloads found, or -1 on a malformed
// header. Offsets/lengths/ts arrays must hold at least `max_out` entries;
// call once with max_out=0 to count.
int64_t pcap_split_udp(const uint8_t* data, int64_t len,
                       int64_t* offsets, int64_t* lengths, int64_t* ts_ns,
                       int64_t max_out) {
    if (len < 24) return -1;
    uint32_t magic;
    std::memcpy(&magic, data, 4);
    double frac_scale;
    if (magic == 0xa1b2c3d4u) frac_scale = 1000.0;        // usec -> ns
    else if (magic == 0xa1b23c4du) frac_scale = 1.0;      // nsec
    else return -1;  // big-endian captures: fall back to python path

    int64_t pos = 24;
    int64_t n = 0;
    while (pos + 16 <= len) {
        uint32_t sec, frac, incl;
        std::memcpy(&sec, data + pos, 4);
        std::memcpy(&frac, data + pos + 4, 4);
        std::memcpy(&incl, data + pos + 8, 4);
        pos += 16;
        if (pos + (int64_t)incl > len) break;
        const uint8_t* p = data + pos;
        int64_t rec_end = pos + incl;
        pos = rec_end;
        if (incl < 14 + 20 + 8) continue;
        uint16_t ethertype = (uint16_t)((p[12] << 8) | p[13]);
        const uint8_t* ip = p + 14;
        if (ethertype == 0x8100) {  // VLAN tag
            ethertype = (uint16_t)((p[16] << 8) | p[17]);
            ip = p + 18;
        }
        if (ethertype != 0x0800) continue;           // IPv4 only
        int ihl = (ip[0] & 0x0F) * 4;
        if (ip[9] != 17) continue;                   // UDP
        const uint8_t* udp = ip + ihl;
        int64_t udp_len = (udp[4] << 8) | udp[5];
        int64_t payload_off = (udp + 8) - data;
        int64_t payload_len = udp_len - 8;
        if (payload_off + payload_len > rec_end)
            payload_len = rec_end - payload_off;
        if (payload_len <= 0) continue;
        if (n < max_out) {
            offsets[n] = payload_off;
            lengths[n] = payload_len;
            ts_ns[n] = (int64_t)sec * 1000000000LL
                       + (int64_t)(frac * frac_scale);
        }
        n++;
    }
    return n;
}

// ------------------------------------------------------- lidar decoding

// LEGACY profile: n_pkts packets, each columns_per_packet blocks of
// (16 B header + h*12 B pixels + 4 B status). Outputs are per-column
// flattened [n_pkts*cpp] and [n_pkts*cpp, h].
void parse_legacy(const uint8_t* pkts, int64_t n_pkts, int64_t pkt_stride,
                  int32_t h, int32_t cpp,
                  uint64_t* ts, uint16_t* mid, uint16_t* fid,
                  uint8_t* status, uint32_t* range_mm,
                  uint16_t* reflectivity, uint16_t* signal, uint16_t* nir) {
    const int64_t block = 16 + (int64_t)h * 12 + 4;
    for (int64_t ip = 0; ip < n_pkts; ip++) {
        const uint8_t* pkt = pkts + ip * pkt_stride;
        for (int32_t c = 0; c < cpp; c++) {
            const uint8_t* col = pkt + c * block;
            int64_t oc = ip * cpp + c;
            std::memcpy(&ts[oc], col, 8);
            std::memcpy(&mid[oc], col + 8, 2);
            std::memcpy(&fid[oc], col + 10, 2);
            uint32_t st;
            std::memcpy(&st, col + block - 4, 4);
            status[oc] = (st == 0xFFFFFFFFu) ? 1 : 0;
            const uint8_t* px = col + 16;
            uint32_t* r = range_mm + oc * h;
            uint16_t* rf = reflectivity + oc * h;
            uint16_t* sg = signal + oc * h;
            uint16_t* nr = nir + oc * h;
            for (int32_t i = 0; i < h; i++) {
                uint32_t w0;
                std::memcpy(&w0, px + (int64_t)i * 12, 4);
                r[i] = w0 & 0x000FFFFFu;
                std::memcpy(&rf[i], px + (int64_t)i * 12 + 4, 2);
                std::memcpy(&sg[i], px + (int64_t)i * 12 + 6, 2);
                std::memcpy(&nr[i], px + (int64_t)i * 12 + 8, 2);
            }
        }
    }
}

// RNG19_RFL8_SIG16_NIR16 single-return eUDP profile:
// 32 B packet header + cpp * (12 B column header + h*12 B pixels) + 32 B.
void parse_rng19(const uint8_t* pkts, int64_t n_pkts, int64_t pkt_stride,
                 int32_t h, int32_t cpp,
                 uint64_t* ts, uint16_t* mid, uint16_t* fid,
                 uint8_t* status, uint32_t* range_mm,
                 uint16_t* reflectivity, uint16_t* signal, uint16_t* nir) {
    const int64_t col_bytes = 12 + (int64_t)h * 12;
    for (int64_t ip = 0; ip < n_pkts; ip++) {
        const uint8_t* pkt = pkts + ip * pkt_stride;
        uint16_t frame_id;
        std::memcpy(&frame_id, pkt + 2, 2);
        const uint8_t* body = pkt + 32;
        for (int32_t c = 0; c < cpp; c++) {
            const uint8_t* col = body + c * col_bytes;
            int64_t oc = ip * cpp + c;
            std::memcpy(&ts[oc], col, 8);
            std::memcpy(&mid[oc], col + 8, 2);
            uint16_t st;
            std::memcpy(&st, col + 10, 2);
            status[oc] = st & 0x1;
            fid[oc] = frame_id;
            const uint8_t* px = col + 12;
            uint32_t* r = range_mm + oc * h;
            uint16_t* rf = reflectivity + oc * h;
            uint16_t* sg = signal + oc * h;
            uint16_t* nr = nir + oc * h;
            for (int32_t i = 0; i < h; i++) {
                uint32_t w0;
                std::memcpy(&w0, px + (int64_t)i * 12, 4);
                r[i] = w0 & 0x0007FFFFu;
                rf[i] = px[(int64_t)i * 12 + 4];
                std::memcpy(&sg[i], px + (int64_t)i * 12 + 6, 2);
                std::memcpy(&nr[i], px + (int64_t)i * 12 + 8, 2);
            }
        }
    }
}

// IMU packets: 48 B — 3 x u64 ts + 3 x f32 accel(g) + 3 x f32 gyro(deg/s)
void parse_imu(const uint8_t* pkts, int64_t n_pkts, int64_t pkt_stride,
               uint64_t* sys_ts, float* accel_g, float* avel_deg) {
    for (int64_t i = 0; i < n_pkts; i++) {
        const uint8_t* p = pkts + i * pkt_stride;
        std::memcpy(&sys_ts[i], p, 8);
        std::memcpy(&accel_g[i * 3], p + 24, 12);
        std::memcpy(&avel_deg[i * 3], p + 36, 12);
    }
}

}  // extern "C"
