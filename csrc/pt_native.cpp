// pt_native: native runtime tier for path_trace_golang_tpu.
//
// The reference's host runtime is Go (PNG encoding via image/png,
// engine/util.go:45-55; byte-level post-processing loops,
// gpu.go:2244-2520).  This library provides the equivalent native tier
// around the JAX/TPU compute path: a filtered+zlib PNG encoder and the
// byte-space bilateral/box post filters, exposed over a plain C ABI for
// ctypes (no pybind11 in this image).
//
// Build: make -C csrc   (produces libpt_native.so; io_png.py and post.py
// load it opportunistically and fall back to PIL/jnp when absent).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG encoding (RGB/RGBA 8-bit, per-row None/Sub/Up filter selection by
// minimum sum of absolute differences, zlib-compressed).
// Returns the number of bytes written to out, or -1 on error/overflow.
// ---------------------------------------------------------------------------

static void put_be32(std::vector<uint8_t>& b, uint32_t v) {
    b.push_back(v >> 24); b.push_back(v >> 16); b.push_back(v >> 8); b.push_back(v);
}

static void put_chunk(std::vector<uint8_t>& out, const char tag[4],
                      const uint8_t* data, size_t n) {
    put_be32(out, (uint32_t)n);
    size_t start = out.size();
    out.insert(out.end(), tag, tag + 4);
    out.insert(out.end(), data, data + n);
    uint32_t crc = crc32(0L, out.data() + start, (uInt)(n + 4));
    put_be32(out, crc);
}

int64_t pt_encode_png(const uint8_t* pixels, int32_t width, int32_t height,
                      int32_t channels, int32_t compress_level,
                      uint8_t* out, int64_t out_capacity) {
    if (width <= 0 || height <= 0 || (channels != 3 && channels != 4)) return -1;
    const size_t stride = (size_t)width * channels;

    // per-row filter selection: 0 None, 1 Sub, 2 Up
    std::vector<uint8_t> raw;
    raw.reserve((stride + 1) * height);
    std::vector<uint8_t> cand[3];
    for (int f = 0; f < 3; f++) cand[f].resize(stride);
    for (int y = 0; y < height; y++) {
        const uint8_t* row = pixels + (size_t)y * stride;
        const uint8_t* prev = y > 0 ? pixels + (size_t)(y - 1) * stride : nullptr;
        uint64_t score[3] = {0, 0, 0};
        for (size_t x = 0; x < stride; x++) {
            uint8_t none = row[x];
            uint8_t sub = (uint8_t)(row[x] - (x >= (size_t)channels ? row[x - channels] : 0));
            uint8_t up = (uint8_t)(row[x] - (prev ? prev[x] : 0));
            cand[0][x] = none; cand[1][x] = sub; cand[2][x] = up;
            score[0] += none < 128 ? none : 256 - none;
            score[1] += sub < 128 ? sub : 256 - sub;
            score[2] += up < 128 ? up : 256 - up;
        }
        int best = 0;
        if (score[1] < score[best]) best = 1;
        if (score[2] < score[best]) best = 2;
        raw.push_back((uint8_t)best);
        raw.insert(raw.end(), cand[best].begin(), cand[best].end());
    }

    uLongf zcap = compressBound((uLong)raw.size());
    std::vector<uint8_t> zbuf(zcap);
    if (compress2(zbuf.data(), &zcap, raw.data(), (uLong)raw.size(),
                  compress_level) != Z_OK)
        return -1;

    std::vector<uint8_t> png;
    png.reserve(zcap + 128);
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
    png.insert(png.end(), sig, sig + 8);
    uint8_t ihdr[13];
    ihdr[0] = width >> 24; ihdr[1] = width >> 16; ihdr[2] = width >> 8; ihdr[3] = width;
    ihdr[4] = height >> 24; ihdr[5] = height >> 16; ihdr[6] = height >> 8; ihdr[7] = height;
    ihdr[8] = 8;                          // bit depth
    ihdr[9] = channels == 3 ? 2 : 6;      // color type
    ihdr[10] = ihdr[11] = ihdr[12] = 0;   // compression/filter/interlace
    put_chunk(png, "IHDR", ihdr, 13);
    put_chunk(png, "IDAT", zbuf.data(), zcap);
    put_chunk(png, "IEND", nullptr, 0);

    if ((int64_t)png.size() > out_capacity) return -1;
    memcpy(out, png.data(), png.size());
    return (int64_t)png.size();
}

// ---------------------------------------------------------------------------
// Byte-space post filters (reference semantics: gpu.go:2355-2520).
// Operate on RGB(A) uint8 buffers; alpha (if present) passes through 255.
// ---------------------------------------------------------------------------

void pt_bilateral3x3(const uint8_t* src, uint8_t* dst, int32_t w, int32_t h,
                     int32_t channels, double sigma_s, double sigma_r) {
    const double two_ss2 = 2.0 * sigma_s * sigma_s;
    const double two_sr2 = 2.0 * sigma_r * sigma_r;
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            const size_t ci = ((size_t)y * w + x) * channels;
            double cr = src[ci] / 255.0, cg = src[ci + 1] / 255.0, cb = src[ci + 2] / 255.0;
            double sw = 0, sr = 0, sg = 0, sb = 0;
            for (int ky = -1; ky <= 1; ky++) {
                int ny = y + ky; if (ny < 0 || ny >= h) continue;
                for (int kx = -1; kx <= 1; kx++) {
                    int nx = x + kx; if (nx < 0 || nx >= w) continue;
                    const size_t ni = ((size_t)ny * w + nx) * channels;
                    double nr = src[ni] / 255.0, ng = src[ni + 1] / 255.0, nb = src[ni + 2] / 255.0;
                    double ds2 = kx * kx + ky * ky;
                    double dr = cr - nr, dg = cg - ng, db = cb - nb;
                    double wgt = std::exp(-ds2 / two_ss2) * std::exp(-(dr * dr + dg * dg + db * db) / two_sr2);
                    sw += wgt; sr += nr * wgt; sg += ng * wgt; sb += nb * wgt;
                }
            }
            auto clamp01 = [](double v) { return v < 0 ? 0.0 : v > 1 ? 1.0 : v; };
            if (sw > 0) {
                dst[ci] = (uint8_t)(clamp01(sr / sw) * 255.0 + 0.5);
                dst[ci + 1] = (uint8_t)(clamp01(sg / sw) * 255.0 + 0.5);
                dst[ci + 2] = (uint8_t)(clamp01(sb / sw) * 255.0 + 0.5);
            } else {
                dst[ci] = src[ci]; dst[ci + 1] = src[ci + 1]; dst[ci + 2] = src[ci + 2];
            }
            if (channels == 4) dst[ci + 3] = 255;
        }
    }
}

void pt_box_smooth(const uint8_t* src, uint8_t* dst, int32_t w, int32_t h,
                   int32_t channels, int32_t radius, double strength) {
    if (radius < 1) radius = 1;
    if (radius > 5) radius = 5;
    if (strength < 0) strength = 0;
    if (strength > 1) strength = 1;
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            double acc[3] = {0, 0, 0};
            int cnt = 0;
            for (int ky = -radius; ky <= radius; ky++) {
                int ny = y + ky; if (ny < 0 || ny >= h) continue;
                for (int kx = -radius; kx <= radius; kx++) {
                    int nx = x + kx; if (nx < 0 || nx >= w) continue;
                    const size_t ni = ((size_t)ny * w + nx) * channels;
                    acc[0] += src[ni]; acc[1] += src[ni + 1]; acc[2] += src[ni + 2];
                    cnt++;
                }
            }
            const size_t ci = ((size_t)y * w + x) * channels;
            for (int c = 0; c < 3; c++) {
                double avg = acc[c] / cnt;
                double v = (1.0 - strength) * src[ci + c] + strength * avg;
                if (v < 0) v = 0; if (v > 255) v = 255;
                dst[ci + c] = (uint8_t)(v + 0.5);
            }
            if (channels == 4) dst[ci + 3] = 255;
        }
    }
}

}  // extern "C"
