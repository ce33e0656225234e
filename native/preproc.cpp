// Native image preprocessing for the diffvit_tpu data pipeline.
//
// Replicates Pillow's 8-bit convolution resampling (bicubic, a = -0.5)
// bit-exactly — the same two-pass horizontal/vertical fixed-point scheme
// with PRECISION_BITS = 32-8-2 coefficient quantization and per-pass uint8
// rounding — followed by center crop and CHW float normalization.  Exact
// PIL parity matters because preprocessing differences move ImageNet top-1
// by tenths of a percent (SURVEY.md §7 hard parts).
//
// Exposed C ABI (ctypes):
//   preprocess_rgb(src, sh, sw, dst, resize_to, crop, mean, std)
//     src: uint8 HWC (sh, sw, 3) decoded RGB
//     dst: float32 CHW (3, crop, crop)
//     resize_to: shorter-side target before crop (e.g. 256 for crop 224)
//   preprocess_batch(...): OpenMP-parallel loop over images.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

constexpr int PRECISION_BITS = 32 - 8 - 2;

// PIL's bicubic filter, a = -0.5 (support 2.0)
static double bicubic_filter(double x) {
    constexpr double a = -0.5;
    if (x < 0.0) x = -x;
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

static inline uint8_t clip8(int in) {
    if (in >= (1 << (PRECISION_BITS + 8))) return 255;
    if (in <= 0) return 0;
    return static_cast<uint8_t>(in >> PRECISION_BITS);
}

// PIL precompute_coeffs: per-output-pixel input window + int32 coefficients
struct Coeffs {
    int ksize;
    std::vector<int> bounds;   // (xmin, xcount) pairs
    std::vector<int> kk;       // ksize coeffs per output pixel
};

static Coeffs precompute_coeffs(int in_size, int out_size) {
    const double support_base = 2.0;  // bicubic
    double scale = static_cast<double>(in_size) / out_size;
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = support_base * filterscale;
    int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

    Coeffs c;
    c.ksize = ksize;
    c.bounds.resize(out_size * 2);
    c.kk.resize(out_size * ksize);
    std::vector<double> w(ksize);

    for (int xx = 0; xx < out_size; xx++) {
        double center = (xx + 0.5) * scale;
        double ww = 0.0;
        double ss = 1.0 / filterscale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        int x = 0;
        for (; x < xmax; x++) {
            double wv = bicubic_filter((x + xmin - center + 0.5) * ss);
            w[x] = wv;
            ww += wv;
        }
        for (x = 0; x < xmax; x++) w[x] /= ww;
        for (; x < ksize; x++) w[x] = 0.0;
        for (x = 0; x < ksize; x++) {
            // PIL rounds coefficients half-away-from-zero
            double v = w[x] * (1 << PRECISION_BITS);
            c.kk[xx * ksize + x] =
                static_cast<int>(v < 0 ? v - 0.5 : v + 0.5);
        }
        c.bounds[xx * 2 + 0] = xmin;
        c.bounds[xx * 2 + 1] = xmax;
    }
    return c;
}

// Horizontal pass: (h, in_w, 3) u8 -> (h, out_w, 3) u8
static void resample_h(const uint8_t* src, int h, int in_w,
                       uint8_t* dst, int out_w, const Coeffs& c) {
    for (int yy = 0; yy < h; yy++) {
        const uint8_t* row = src + static_cast<size_t>(yy) * in_w * 3;
        uint8_t* orow = dst + static_cast<size_t>(yy) * out_w * 3;
        for (int xx = 0; xx < out_w; xx++) {
            int xmin = c.bounds[xx * 2 + 0];
            int xcnt = c.bounds[xx * 2 + 1];
            const int* k = &c.kk[xx * c.ksize];
            for (int b = 0; b < 3; b++) {
                int ss = 1 << (PRECISION_BITS - 1);
                for (int x = 0; x < xcnt; x++)
                    ss += row[(xmin + x) * 3 + b] * k[x];
                orow[xx * 3 + b] = clip8(ss);
            }
        }
    }
}

// Vertical pass: (in_h, w, 3) u8 -> (out_h, w, 3) u8
static void resample_v(const uint8_t* src, int in_h, int w,
                       uint8_t* dst, int out_h, const Coeffs& c) {
    for (int yy = 0; yy < out_h; yy++) {
        int ymin = c.bounds[yy * 2 + 0];
        int ycnt = c.bounds[yy * 2 + 1];
        const int* k = &c.kk[yy * c.ksize];
        uint8_t* orow = dst + static_cast<size_t>(yy) * w * 3;
        for (int xx = 0; xx < w * 3; xx++) {
            int ss = 1 << (PRECISION_BITS - 1);
            for (int y = 0; y < ycnt; y++)
                ss += src[static_cast<size_t>(ymin + y) * w * 3 + xx] * k[y];
            orow[xx] = clip8(ss);
        }
    }
}

// Python-round semantics (half to even) — torchvision's CenterCrop offsets
// and Resize target sizes go through Python round(), which is banker's
// rounding; lround would put the crop window off by one on exact .5.
static long round_half_even(double v) {
    double f = std::floor(v);
    double diff = v - f;
    if (diff > 0.5) return static_cast<long>(f) + 1;
    if (diff < 0.5) return static_cast<long>(f);
    long lf = static_cast<long>(f);
    return (lf % 2 == 0) ? lf : lf + 1;
}

}  // namespace

extern "C" {

// Resize shorter side to `resize_to` (PIL torchvision Resize(int) semantics),
// center-crop `crop`, normalize to CHW float32.
void preprocess_rgb(const uint8_t* src, int sh, int sw, float* dst,
                    int resize_to, int crop, const float* mean,
                    const float* std_) {
    int ow, oh;
    if (sw <= sh) {
        ow = resize_to;
        oh = std::max(1L, round_half_even(
            static_cast<double>(resize_to) * sh / sw));
    } else {
        oh = resize_to;
        ow = std::max(1L, round_half_even(
            static_cast<double>(resize_to) * sw / sh));
    }

    std::vector<uint8_t> tmp_h, tmp_v;
    const uint8_t* cur = src;
    int cur_h = sh, cur_w = sw;
    if (ow != sw) {
        Coeffs cx = precompute_coeffs(sw, ow);
        tmp_h.resize(static_cast<size_t>(sh) * ow * 3);
        resample_h(cur, sh, sw, tmp_h.data(), ow, cx);
        cur = tmp_h.data();
        cur_w = ow;
    }
    if (oh != sh) {
        Coeffs cy = precompute_coeffs(sh, oh);
        tmp_v.resize(static_cast<size_t>(oh) * cur_w * 3);
        resample_v(cur, sh, cur_w, tmp_v.data(), oh, cy);
        cur = tmp_v.data();
        cur_h = oh;
    }

    // torchvision CenterCrop rounding
    int left = static_cast<int>(round_half_even((cur_w - crop) / 2.0));
    int top = static_cast<int>(round_half_even((cur_h - crop) / 2.0));
    if (left < 0) left = 0;
    if (top < 0) top = 0;

    // same op order as the numpy path (x/255 - mean)/std for bit parity
    for (int b = 0; b < 3; b++) {
        float m = mean[b], s = std_[b];
        float* out = dst + static_cast<size_t>(b) * crop * crop;
        for (int y = 0; y < crop; y++) {
            const uint8_t* row =
                cur + (static_cast<size_t>(top + y) * cur_w + left) * 3 + b;
            for (int x = 0; x < crop; x++)
                out[y * crop + x] = (row[x * 3] / 255.0f - m) / s;
        }
    }
}

void preprocess_batch(const uint8_t** srcs, const int* shs, const int* sws,
                      int n, float* dst, int resize_to, int crop,
                      const float* mean, const float* std_) {
#pragma omp parallel for schedule(dynamic)
    for (int i = 0; i < n; i++) {
        preprocess_rgb(srcs[i], shs[i], sws[i],
                       dst + static_cast<size_t>(i) * 3 * crop * crop,
                       resize_to, crop, mean, std_);
    }
}

}  // extern "C"
