// Native image loader: first-party decoders (PNG via zlib inflate, BMP,
// PPM, baseline JPEG in jpeg_decode.cpp) + bilinear resize + a thread-pool
// batch API exposed through a C ABI for ctypes.
//
// Replaces the host-side image IO the reference delegated to OpenCV/PIL
// (cv2.imread backend/descriptors.py:65, cv2.imdecode engine.py:42, and
// the joblib thread fan-out descriptors.py:125-129): decode threads here
// run free of the GIL, feeding device batches.

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>

bool ise_decode_jpeg(const uint8_t *data, long len, std::vector<uint8_t> &rgb,
                     int &w, int &h);

namespace {

// ---------------------------------------------------------------------------
// PNG (8-bit gray/gray+alpha/RGB/RGBA/palette, non-interlaced)
// ---------------------------------------------------------------------------

uint32_t rd32(const uint8_t *p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 8) | p[3];
}

int paeth(int a, int b, int c) {
    int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

bool decode_png(const uint8_t *data, long len, std::vector<uint8_t> &rgb, int &W, int &H) {
    static const uint8_t SIG[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (len < 8 || std::memcmp(data, SIG, 8) != 0) return false;
    const uint8_t *p = data + 8, *end = data + len;
    int w = 0, h = 0, bitdepth = 0, ctype = -1, interlace = 0;
    std::vector<uint8_t> idat, palette;

    while (p + 12 <= end) {
        uint32_t clen = rd32(p);
        const uint8_t *cdat = p + 8;
        if (cdat + clen + 4 > end) return false;
        if (!std::memcmp(p + 4, "IHDR", 4)) {
            w = (int)rd32(cdat);
            h = (int)rd32(cdat + 4);
            bitdepth = cdat[8];
            ctype = cdat[9];
            interlace = cdat[12];
        } else if (!std::memcmp(p + 4, "PLTE", 4)) {
            palette.assign(cdat, cdat + clen);
        } else if (!std::memcmp(p + 4, "IDAT", 4)) {
            idat.insert(idat.end(), cdat, cdat + clen);
        } else if (!std::memcmp(p + 4, "IEND", 4)) {
            break;
        }
        p = cdat + clen + 4;
    }
    if (w <= 0 || h <= 0 || bitdepth != 8 || interlace != 0) return false;
    int ch;
    switch (ctype) {
        case 0: ch = 1; break;  // gray
        case 2: ch = 3; break;  // rgb
        case 3: ch = 1; break;  // palette
        case 4: ch = 2; break;  // gray+alpha
        case 6: ch = 4; break;  // rgba
        default: return false;
    }

    size_t stride = (size_t)w * ch;
    std::vector<uint8_t> raw((stride + 1) * h);
    uLongf outlen = raw.size();
    if (uncompress(raw.data(), &outlen, idat.data(), idat.size()) != Z_OK) return false;

    // unfilter
    std::vector<uint8_t> img(stride * h);
    for (int y = 0; y < h; y++) {
        uint8_t f = raw[(stride + 1) * y];
        const uint8_t *src = &raw[(stride + 1) * y + 1];
        uint8_t *dst = &img[stride * y];
        const uint8_t *up = y ? &img[stride * (y - 1)] : nullptr;
        for (size_t x = 0; x < stride; x++) {
            int a = x >= (size_t)ch ? dst[x - ch] : 0;
            int b = up ? up[x] : 0;
            int c = (up && x >= (size_t)ch) ? up[x - ch] : 0;
            int v = src[x];
            switch (f) {
                case 0: break;
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: return false;
            }
            dst[x] = (uint8_t)v;
        }
    }

    // to RGB
    W = w; H = h;
    rgb.resize((size_t)w * h * 3);
    for (size_t i = 0; i < (size_t)w * h; i++) {
        const uint8_t *s = &img[i * ch];
        uint8_t *o = &rgb[i * 3];
        switch (ctype) {
            case 0: case 4: o[0] = o[1] = o[2] = s[0]; break;
            case 2: case 6: o[0] = s[0]; o[1] = s[1]; o[2] = s[2]; break;
            case 3: {
                if ((size_t)s[0] * 3 + 2 >= palette.size()) return false;
                const uint8_t *pal = &palette[(size_t)s[0] * 3];
                o[0] = pal[0]; o[1] = pal[1]; o[2] = pal[2];
                break;
            }
        }
    }
    return true;
}

// ---------------------------------------------------------------------------
// BMP (24/32-bit uncompressed) and PPM (P6)
// ---------------------------------------------------------------------------

bool decode_bmp(const uint8_t *d, long len, std::vector<uint8_t> &rgb, int &W, int &H) {
    if (len < 54 || d[0] != 'B' || d[1] != 'M') return false;
    uint32_t off = d[10] | (d[11] << 8) | (d[12] << 16) | ((uint32_t)d[13] << 24);
    int32_t w, h;
    uint16_t bpp;
    uint32_t comp;
    std::memcpy(&w, d + 18, 4);
    std::memcpy(&h, d + 22, 4);
    std::memcpy(&bpp, d + 28, 2);
    std::memcpy(&comp, d + 30, 4);
    if (comp != 0 || (bpp != 24 && bpp != 32) || w <= 0) return false;
    bool flip = h > 0;
    int ah = abs(h);
    int ch = bpp / 8;
    size_t rowsz = ((size_t)w * ch + 3) & ~3u;
    if (off + rowsz * ah > (size_t)len) return false;
    W = w; H = ah;
    rgb.resize((size_t)w * ah * 3);
    for (int y = 0; y < ah; y++) {
        const uint8_t *row = d + off + rowsz * (flip ? ah - 1 - y : y);
        for (int x = 0; x < w; x++) {
            uint8_t *o = &rgb[((size_t)y * w + x) * 3];
            o[0] = row[x * ch + 2];  // BMP is BGR
            o[1] = row[x * ch + 1];
            o[2] = row[x * ch + 0];
        }
    }
    return true;
}

bool decode_ppm(const uint8_t *d, long len, std::vector<uint8_t> &rgb, int &W, int &H) {
    if (len < 10 || d[0] != 'P' || d[1] != '6') return false;
    long pos = 2;
    auto skip = [&]() {
        while (pos < len && (d[pos] == ' ' || d[pos] == '\n' || d[pos] == '\t' || d[pos] == '\r' || d[pos] == '#')) {
            if (d[pos] == '#') { while (pos < len && d[pos] != '\n') pos++; }
            else pos++;
        }
    };
    auto num = [&]() {
        skip();
        long v = 0;
        while (pos < len && d[pos] >= '0' && d[pos] <= '9') v = v * 10 + (d[pos++] - '0');
        return v;
    };
    long w = num(), h = num(), maxv = num();
    pos++;  // single whitespace after maxval
    if (w <= 0 || h <= 0 || maxv != 255 || pos + w * h * 3 > len) return false;
    W = (int)w; H = (int)h;
    rgb.assign(d + pos, d + pos + w * h * 3);
    return true;
}

bool decode_any(const uint8_t *d, long len, std::vector<uint8_t> &rgb, int &w, int &h) {
    if (len >= 3 && d[0] == 0xFF && d[1] == 0xD8) return ise_decode_jpeg(d, len, rgb, w, h);
    if (len >= 8 && d[0] == 137 && d[1] == 'P') return decode_png(d, len, rgb, w, h);
    if (len >= 2 && d[0] == 'B' && d[1] == 'M') return decode_bmp(d, len, rgb, w, h);
    if (len >= 2 && d[0] == 'P' && d[1] == '6') return decode_ppm(d, len, rgb, w, h);
    return false;
}

bool read_file(const char *path, std::vector<uint8_t> &buf) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    buf.resize(sz);
    bool ok = sz > 0 && std::fread(buf.data(), 1, sz, f) == (size_t)sz;
    std::fclose(f);
    return ok;
}

// bilinear resize u8 RGB (align-corners=false, matching
// jax.image.resize/PIL semantics closely enough for feature stability).
// Templated on the output writer: f32 [0,1] for the legacy batch API,
// rounded u8 for the transfer-lean path (the [0,1] scaling then happens
// on device — see ops/image_ops.to_unit_f32).
template <typename WriteFn>
void resize_bilinear(const uint8_t *src, int sh, int sw, int dh, int dw,
                     WriteFn write) {
    for (int y = 0; y < dh; y++) {
        float fy = ((y + 0.5f) * sh / dh) - 0.5f;
        int y0 = (int)std::floor(fy);
        float wy = fy - y0;
        int y0c = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
        int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= sh ? sh - 1 : y0 + 1);
        for (int x = 0; x < dw; x++) {
            float fx = ((x + 0.5f) * sw / dw) - 0.5f;
            int x0 = (int)std::floor(fx);
            float wx = fx - x0;
            int x0c = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
            int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= sw ? sw - 1 : x0 + 1);
            for (int c = 0; c < 3; c++) {
                float v00 = src[((size_t)y0c * sw + x0c) * 3 + c];
                float v01 = src[((size_t)y0c * sw + x1c) * 3 + c];
                float v10 = src[((size_t)y1c * sw + x0c) * 3 + c];
                float v11 = src[((size_t)y1c * sw + x1c) * 3 + c];
                float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                          v10 * wy * (1 - wx) + v11 * wy * wx;
                write(((size_t)y * dw + x) * 3 + c, v);
            }
        }
    }
}

void resize_to_f32(const uint8_t *src, int sh, int sw, float *dst, int dh, int dw) {
    resize_bilinear(src, sh, sw, dh, dw,
                    [dst](size_t i, float v) { dst[i] = v / 255.0f; });
}

void resize_to_u8(const uint8_t *src, int sh, int sw, uint8_t *dst, int dh, int dw) {
    resize_bilinear(src, sh, sw, dh, dw, [dst](size_t i, float v) {
        dst[i] = (uint8_t)(v < 0.f ? 0.f : (v > 255.f ? 255.f : v + 0.5f));
    });
}

}  // namespace

extern "C" {

// Decode one file to malloc'd RGB u8. Returns 0 on success.
int ise_decode_file(const char *path, uint8_t **out, int *h, int *w) {
    std::vector<uint8_t> buf, rgb;
    if (!read_file(path, buf)) return 1;
    if (!decode_any(buf.data(), (long)buf.size(), rgb, *w, *h)) return 2;
    *out = (uint8_t *)std::malloc(rgb.size());
    std::memcpy(*out, rgb.data(), rgb.size());
    return 0;
}

int ise_decode_bytes(const uint8_t *data, long len, uint8_t **out, int *h, int *w) {
    std::vector<uint8_t> rgb;
    if (!decode_any(data, len, rgb, *w, *h)) return 2;
    *out = (uint8_t *)std::malloc(rgb.size());
    std::memcpy(*out, rgb.data(), rgb.size());
    return 0;
}

void ise_free(uint8_t *p) { std::free(p); }

// Batch: decode + resize n files into out (n, H, W, 3) f32; ok[i] flags
// success. GIL-free multi-threaded (n_threads).
void ise_load_batch(const char **paths, int n, int H, int W, float *out,
                    uint8_t *ok, int n_threads) {
    std::atomic<int> next(0);
    if (n_threads < 1) n_threads = 1;
    auto work = [&]() {
        std::vector<uint8_t> buf, rgb;
        int i;
        while ((i = next.fetch_add(1)) < n) {
            ok[i] = 0;
            int w = 0, h = 0;
            if (!read_file(paths[i], buf)) continue;
            if (!decode_any(buf.data(), (long)buf.size(), rgb, w, h)) continue;
            resize_to_f32(rgb.data(), h, w, out + (size_t)i * H * W * 3, H, W);
            ok[i] = 1;
        }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; t++) pool.emplace_back(work);
    for (auto &t : pool) t.join();
}

// Same as ise_load_batch but keeps pixels uint8 (n, H, W, 3): the batched
// indexing path uploads these straight to the device (4x fewer bytes) and
// casts to [0,1] f32 there.
void ise_load_batch_u8(const char **paths, int n, int H, int W, uint8_t *out,
                       uint8_t *ok, int n_threads) {
    std::atomic<int> next(0);
    if (n_threads < 1) n_threads = 1;
    auto work = [&]() {
        std::vector<uint8_t> buf, rgb;
        int i;
        while ((i = next.fetch_add(1)) < n) {
            ok[i] = 0;
            int w = 0, h = 0;
            if (!read_file(paths[i], buf)) continue;
            if (!decode_any(buf.data(), (long)buf.size(), rgb, w, h)) continue;
            resize_to_u8(rgb.data(), h, w, out + (size_t)i * H * W * 3, H, W);
            ok[i] = 1;
        }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; t++) pool.emplace_back(work);
    for (auto &t : pool) t.join();
}

}  // extern "C"
