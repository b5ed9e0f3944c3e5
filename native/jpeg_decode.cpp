// Baseline JPEG decoder (SOF0, sequential DCT, huffman, restart markers,
// 1–3 components, 4:4:4 / 4:2:2 / 4:2:0 subsampling).
//
// First-party replacement for the image-decode half of the reference's
// OpenCV dependency (cv2.imread backend/descriptors.py:65, cv2.imdecode
// backend/engine.py:42). Scope: baseline JPEG only — PIL/libjpeg write
// baseline by default, and corpora are overwhelmingly baseline; progressive
// falls back to the Python loader (utils/native_loader.py).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <vector>

namespace ise_jpeg {

struct Huff {
    // canonical huffman: code lengths 1..16
    uint8_t lut_len[1 << 9];   // fast path: 9-bit lookup
    uint8_t lut_sym[1 << 9];
    int32_t maxcode[17];
    int32_t mincode[17];
    int32_t valptr[17];
    uint8_t vals[256];
    bool present = false;

    void build(const uint8_t counts[16], const uint8_t *symbols) {
        int code = 0, k = 0;
        std::memcpy(vals, symbols, 256);
        std::memset(lut_len, 0, sizeof lut_len);
        for (int l = 1; l <= 16; l++) {
            valptr[l] = k;
            mincode[l] = code;
            for (int i = 0; i < counts[l - 1]; i++) {
                if (l <= 9) {  // populate fast LUT
                    int shift = 9 - l;
                    for (int f = 0; f < (1 << shift); f++) {
                        int idx = (code << shift) | f;
                        lut_len[idx] = (uint8_t)l;
                        lut_sym[idx] = symbols[k];
                    }
                }
                code++;
                k++;
            }
            maxcode[l] = code - 1;
            code <<= 1;
        }
        present = true;
    }
};

struct BitReader {
    const uint8_t *p, *end;
    uint32_t buf = 0;
    int bits = 0;
    bool hit_marker = false;

    BitReader(const uint8_t *data, const uint8_t *e) : p(data), end(e) {}

    void fill() {
        while (bits <= 24) {
            if (p >= end) { buf |= 0; bits += 8; continue; }
            uint8_t b = *p;
            if (b == 0xFF) {
                if (p + 1 < end && p[1] == 0x00) { p += 2; }
                else { hit_marker = true; buf |= 0; bits += 8; continue; }
            } else {
                p++;
            }
            buf |= (uint32_t)b << (24 - bits);
            bits += 8;
        }
    }

    int peek(int n) { fill(); return (int)(buf >> (32 - n)); }
    void drop(int n) { buf <<= n; bits -= n; }

    int decode(const Huff &h) {
        int idx = peek(9);
        if (h.lut_len[idx]) {
            drop(h.lut_len[idx]);
            return h.lut_sym[idx];
        }
        // slow path: lengths 10..16
        int code = 0;
        for (int l = 1; l <= 16; l++) {
            code = (code << 1) | (peek(1) & 1);
            drop(1);
            if (l >= 10 || true) {
                if (h.maxcode[l] >= 0 && code <= h.maxcode[l] && code >= h.mincode[l]) {
                    if (l <= 9) continue;  // handled by LUT; shouldn't reach
                    return h.vals[h.valptr[l] + (code - h.mincode[l])];
                }
            }
        }
        return -1;  // corrupt
    }

    int receive_extend(int s) {
        if (s == 0) return 0;
        int v = peek(s);
        drop(s);
        if (v < (1 << (s - 1))) v += ((-1) << s) + 1;
        return v;
    }

    void align_to_marker() {
        buf = 0; bits = 0; hit_marker = false;
        // skip to just after RSTn marker
        while (p + 1 < end) {
            if (p[0] == 0xFF && p[1] >= 0xD0 && p[1] <= 0xD7) { p += 2; return; }
            p++;
        }
        p = end;
    }
};

static const int ZIGZAG[64] = {
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// separable float IDCT (simple, exact enough; hot path is the TPU, not this)
static void idct8x8(const int32_t in[64], const uint16_t qt[64], uint8_t out[64]) {
    double tmp[64];
    static double c[8][8];
    static bool init = false;
    if (!init) {
        for (int u = 0; u < 8; u++)
            for (int x = 0; x < 8; x++)
                c[u][x] = (u == 0 ? std::sqrt(0.125) : 0.5) *
                          std::cos((2 * x + 1) * u * M_PI / 16.0);
        init = true;
    }
    double block[64];
    for (int i = 0; i < 64; i++) block[i] = (double)in[i] * qt[i];
    // rows
    for (int y = 0; y < 8; y++)
        for (int x = 0; x < 8; x++) {
            double s = 0;
            for (int u = 0; u < 8; u++) s += c[u][x] * block[y * 8 + u];
            tmp[y * 8 + x] = s;
        }
    // cols
    for (int y = 0; y < 8; y++)
        for (int x = 0; x < 8; x++) {
            double s = 0;
            for (int v = 0; v < 8; v++) s += c[v][y] * tmp[v * 8 + x];
            int val = (int)std::lround(s) + 128;
            out[y * 8 + x] = (uint8_t)(val < 0 ? 0 : val > 255 ? 255 : val);
        }
}

struct Component {
    int id = 0, h = 1, v = 1, tq = 0, td = 0, ta = 0;
    int dc_pred = 0;
    std::vector<uint8_t> plane;  // (mcu_rows*v*8) x (mcu_cols*h*8)
    int stride = 0;
};

struct Decoder {
    uint16_t qt[4][64] = {};
    Huff hdc[4], hac[4];
    Component comp[3];
    int ncomp = 0, width = 0, height = 0;
    int hmax = 1, vmax = 1;
    int restart_interval = 0;

    bool decode(const uint8_t *data, long len, std::vector<uint8_t> &rgb, int &W, int &H);
};

static uint16_t rd16(const uint8_t *p) { return (uint16_t)((p[0] << 8) | p[1]); }

bool Decoder::decode(const uint8_t *data, long len, std::vector<uint8_t> &rgb, int &W, int &H) {
    const uint8_t *p = data, *end = data + len;
    if (len < 4 || p[0] != 0xFF || p[1] != 0xD8) return false;
    p += 2;
    const uint8_t *scan_start = nullptr;

    while (p + 4 <= end) {
        if (p[0] != 0xFF) { p++; continue; }
        uint8_t marker = p[1];
        p += 2;
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) continue;
        if (marker == 0xD9) break;  // EOI
        if (p + 2 > end) return false;
        int seg = rd16(p);
        const uint8_t *seg_end = p + seg;
        if (seg_end > end) return false;
        const uint8_t *q = p + 2;

        switch (marker) {
            case 0xDB:  // DQT
                while (q < seg_end) {
                    int pq = q[0] >> 4, tq_ = q[0] & 15;
                    q++;
                    for (int i = 0; i < 64; i++) {
                        uint16_t v = pq ? rd16(q + 2 * i) : q[i];
                        qt[tq_][ZIGZAG[i]] = v;
                    }
                    q += pq ? 128 : 64;
                }
                break;
            case 0xC4:  // DHT
                while (q < seg_end) {
                    int tc = q[0] >> 4, th = q[0] & 15;
                    q++;
                    uint8_t counts[16];
                    int total = 0;
                    for (int i = 0; i < 16; i++) { counts[i] = q[i]; total += q[i]; }
                    q += 16;
                    (tc ? hac[th] : hdc[th]).build(counts, q);
                    q += total;
                }
                break;
            case 0xC0: {  // SOF0 baseline
                height = rd16(q + 1);
                width = rd16(q + 3);
                ncomp = q[5];
                if (ncomp != 1 && ncomp != 3) return false;
                for (int i = 0; i < ncomp; i++) {
                    const uint8_t *c = q + 6 + 3 * i;
                    comp[i].id = c[0];
                    comp[i].h = c[1] >> 4;
                    comp[i].v = c[1] & 15;
                    comp[i].tq = c[2];
                    if (comp[i].h < 1 || comp[i].h > 2 || comp[i].v < 1 || comp[i].v > 2)
                        return false;
                    hmax = std::max(hmax, comp[i].h);
                    vmax = std::max(vmax, comp[i].v);
                }
                break;
            }
            case 0xC1: case 0xC2: case 0xC3: case 0xC5: case 0xC6: case 0xC7:
            case 0xC9: case 0xCA: case 0xCB: case 0xCD: case 0xCE: case 0xCF:
                return false;  // non-baseline frame: let the Python path handle it
            case 0xDD:  // DRI
                restart_interval = rd16(q);
                break;
            case 0xDA: {  // SOS
                int ns = q[0];
                const uint8_t *c = q + 1;
                for (int i = 0; i < ns; i++) {
                    for (int j = 0; j < ncomp; j++)
                        if (comp[j].id == c[0]) { comp[j].td = c[1] >> 4; comp[j].ta = c[1] & 15; }
                    c += 2;
                }
                scan_start = seg_end;
                break;
            }
            default:
                break;  // APPn/COM etc.
        }
        p = seg_end;
        if (scan_start) break;
    }
    if (!scan_start || !width || !height) return false;

    int mcux = (width + 8 * hmax - 1) / (8 * hmax);
    int mcuy = (height + 8 * vmax - 1) / (8 * vmax);
    for (int i = 0; i < ncomp; i++) {
        comp[i].stride = mcux * comp[i].h * 8;
        comp[i].plane.assign((size_t)comp[i].stride * mcuy * comp[i].v * 8, 128);
        comp[i].dc_pred = 0;
    }

    BitReader br(scan_start, end);
    int32_t block[64];
    uint8_t pix[64];
    int mcu_count = 0;

    for (int my = 0; my < mcuy; my++) {
        for (int mx = 0; mx < mcux; mx++) {
            if (restart_interval && mcu_count && mcu_count % restart_interval == 0) {
                br.align_to_marker();
                for (int i = 0; i < ncomp; i++) comp[i].dc_pred = 0;
            }
            mcu_count++;
            for (int ci = 0; ci < ncomp; ci++) {
                Component &co = comp[ci];
                for (int by = 0; by < co.v; by++) {
                    for (int bx = 0; bx < co.h; bx++) {
                        std::memset(block, 0, sizeof block);
                        int t = br.decode(hdc[co.td]);
                        if (t < 0) return false;
                        int diff = br.receive_extend(t);
                        co.dc_pred += diff;
                        block[0] = co.dc_pred;
                        for (int k = 1; k < 64;) {
                            int rs = br.decode(hac[co.ta]);
                            if (rs < 0) return false;
                            int r = rs >> 4, s = rs & 15;
                            if (s == 0) {
                                if (r == 15) { k += 16; continue; }
                                break;  // EOB
                            }
                            k += r;
                            if (k > 63) return false;
                            block[ZIGZAG[k]] = br.receive_extend(s);
                            k++;
                        }
                        idct8x8(block, qt[co.tq], pix);
                        int ox = (mx * co.h + bx) * 8;
                        int oy = (my * co.v + by) * 8;
                        for (int y = 0; y < 8; y++)
                            std::memcpy(&co.plane[(size_t)(oy + y) * co.stride + ox],
                                        &pix[y * 8], 8);
                    }
                }
            }
        }
    }

    // upsample + color convert
    W = width; H = height;
    rgb.resize((size_t)W * H * 3);
    for (int y = 0; y < H; y++) {
        for (int x = 0; x < W; x++) {
            uint8_t *o = &rgb[((size_t)y * W + x) * 3];
            if (ncomp == 1) {
                uint8_t g = comp[0].plane[(size_t)y * comp[0].stride + x];
                o[0] = o[1] = o[2] = g;
                continue;
            }
            auto sample = [&](const Component &c) -> int {
                int sy = y * c.v / vmax, sx = x * c.h / hmax;
                return c.plane[(size_t)sy * c.stride + sx];
            };
            int Y = sample(comp[0]), Cb = sample(comp[1]) - 128, Cr = sample(comp[2]) - 128;
            int r = (int)std::lround(Y + 1.402 * Cr);
            int g = (int)std::lround(Y - 0.344136 * Cb - 0.714136 * Cr);
            int b = (int)std::lround(Y + 1.772 * Cb);
            o[0] = (uint8_t)(r < 0 ? 0 : r > 255 ? 255 : r);
            o[1] = (uint8_t)(g < 0 ? 0 : g > 255 ? 255 : g);
            o[2] = (uint8_t)(b < 0 ? 0 : b > 255 ? 255 : b);
        }
    }
    return true;
}

}  // namespace ise_jpeg

bool ise_decode_jpeg(const uint8_t *data, long len, std::vector<uint8_t> &rgb, int &w, int &h) {
    ise_jpeg::Decoder d;
    return d.decode(data, len, rgb, w, h);
}
