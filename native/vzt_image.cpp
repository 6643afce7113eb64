// vzt_image: native host-side image pipeline for vision-zephyr-tpu.
//
// Replaces the PIL/torchvision path the reference uses for data loading
// (JPEG decode → LANCZOS resize → pad/tile → CLIP normalize,
// vis_zephyr/model/multi_scale_process.py + CLIPImageProcessor) with a
// dependency-light C++ implementation so the training input pipeline can
// run in cheap worker threads without the Python interpreter.
//
// Exposed C ABI (driven from Python via ctypes):
//   vzt_decode_jpeg      — libjpeg decode to RGB8
//   vzt_resize_lanczos   — separable Lanczos-3 resample (PIL-compatible:
//                          support scales with the downscale ratio)
//   vzt_anyres           — full anyres pipeline: best-fit canvas, fit
//                          resize + center pad, tile crops, global view,
//                          CLIP mean/std normalize → float32 [P, S, S, 3]
//
// Build: see native/Makefile (g++ -O3 -shared, links -ljpeg).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------

struct VztJpegError {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

static void vzt_jpeg_error_exit(j_common_ptr cinfo) {
    VztJpegError* err = reinterpret_cast<VztJpegError*>(cinfo->err);
    longjmp(err->jump, 1);
}

// Returns 0 on success. Caller provides out buffer of cap bytes; the decoded
// size (w*h*3) is written through out_w/out_h. On probe (out == nullptr)
// only dimensions are filled.
int vzt_decode_jpeg(const uint8_t* data, long size, uint8_t* out, long cap,
                    int* out_w, int* out_h) {
    jpeg_decompress_struct cinfo;
    VztJpegError jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = vzt_jpeg_error_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_calc_output_dimensions(&cinfo);
    *out_w = cinfo.output_width;
    *out_h = cinfo.output_height;
    if (out == nullptr) {
        jpeg_destroy_decompress(&cinfo);
        return 0;
    }
    long need = 3L * cinfo.output_width * cinfo.output_height;
    if (cap < need) {
        jpeg_destroy_decompress(&cinfo);
        return 2;
    }
    jpeg_start_decompress(&cinfo);
    long stride = 3L * cinfo.output_width;
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out + stride * cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// ---------------------------------------------------------------------------
// Lanczos-3 separable resampling (PIL-compatible)
// ---------------------------------------------------------------------------

static inline double lanczos3(double x) {
    if (x <= -3.0 || x >= 3.0) return 0.0;
    if (x == 0.0) return 1.0;
    double px = M_PI * x;
    return 3.0 * std::sin(px) * std::sin(px / 3.0) / (px * px);
}

struct ResampleAxis {
    std::vector<int> bounds_lo;     // first source index per output pixel
    std::vector<int> counts;        // taps per output pixel
    std::vector<double> coeffs;     // max_taps per output pixel, normalized
    int max_taps = 0;
};

// Precompute normalized filter taps for one axis (PIL's algorithm: the
// filter support widens by the downscale ratio).
static void build_axis(int in_size, int out_size, ResampleAxis* ax) {
    double scale = static_cast<double>(in_size) / out_size;
    double filterscale = std::max(scale, 1.0);
    double support = 3.0 * filterscale;
    int max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;

    ax->bounds_lo.resize(out_size);
    ax->counts.resize(out_size);
    ax->coeffs.assign(static_cast<size_t>(out_size) * max_taps, 0.0);
    ax->max_taps = max_taps;

    for (int xx = 0; xx < out_size; ++xx) {
        double center = (xx + 0.5) * scale;
        int lo = static_cast<int>(center - support + 0.5);
        lo = std::max(lo, 0);
        int hi = static_cast<int>(center + support + 0.5);
        hi = std::min(hi, in_size);
        int n = hi - lo;
        double* w = &ax->coeffs[static_cast<size_t>(xx) * max_taps];
        double total = 0.0;
        for (int i = 0; i < n; ++i) {
            double weight = lanczos3((lo + i - center + 0.5) / filterscale);
            w[i] = weight;
            total += weight;
        }
        if (total != 0.0) {
            for (int i = 0; i < n; ++i) w[i] /= total;
        }
        ax->bounds_lo[xx] = lo;
        ax->counts[xx] = n;
    }
}

// uint8 RGB in → uint8 RGB out, separable two-pass resample.
void vzt_resize_lanczos(const uint8_t* src, int sw, int sh,
                        uint8_t* dst, int dw, int dh) {
    ResampleAxis hx, vx;
    build_axis(sw, dw, &hx);
    build_axis(sh, dh, &vx);

    // Horizontal pass into an intermediate double buffer [sh, dw, 3].
    std::vector<float> mid(static_cast<size_t>(sh) * dw * 3);
    for (int y = 0; y < sh; ++y) {
        const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
        float* mrow = &mid[static_cast<size_t>(y) * dw * 3];
        for (int x = 0; x < dw; ++x) {
            const double* w = &hx.coeffs[static_cast<size_t>(x) * hx.max_taps];
            int lo = hx.bounds_lo[x], n = hx.counts[x];
            double acc[3] = {0, 0, 0};
            for (int i = 0; i < n; ++i) {
                const uint8_t* px = row + 3 * (lo + i);
                acc[0] += w[i] * px[0];
                acc[1] += w[i] * px[1];
                acc[2] += w[i] * px[2];
            }
            mrow[3 * x + 0] = static_cast<float>(acc[0]);
            mrow[3 * x + 1] = static_cast<float>(acc[1]);
            mrow[3 * x + 2] = static_cast<float>(acc[2]);
        }
    }

    // Vertical pass → clamp to uint8.
    for (int y = 0; y < dh; ++y) {
        const double* w = &vx.coeffs[static_cast<size_t>(y) * vx.max_taps];
        int lo = vx.bounds_lo[y], n = vx.counts[y];
        uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
        for (int x = 0; x < dw; ++x) {
            double acc[3] = {0, 0, 0};
            for (int i = 0; i < n; ++i) {
                const float* px = &mid[(static_cast<size_t>(lo + i) * dw + x) * 3];
                acc[0] += w[i] * px[0];
                acc[1] += w[i] * px[1];
                acc[2] += w[i] * px[2];
            }
            for (int c = 0; c < 3; ++c) {
                int v = static_cast<int>(std::lround(acc[c]));
                drow[3 * x + c] = static_cast<uint8_t>(std::clamp(v, 0, 255));
            }
        }
    }
}

// ---------------------------------------------------------------------------
// anyres pipeline
// ---------------------------------------------------------------------------

static const float kClipMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
static const float kClipStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};

static void normalize_into(const uint8_t* rgb, int size, float* out) {
    // [size, size, 3] uint8 → CLIP-normalized float32.
    long n = static_cast<long>(size) * size;
    for (long i = 0; i < n; ++i) {
        for (int c = 0; c < 3; ++c) {
            float v = rgb[3 * i + c] / 255.0f;
            out[3 * i + c] = (v - kClipMean[c]) / kClipStd[c];
        }
    }
}

// Full anyres pipeline for one RGB8 image.
//   pin_w/pin_h: candidate canvases, n_pins entries.
//   out: float32 [max_patches, S, S, 3]; out_valid: int32 [max_patches].
// Returns the number of live patches, or -1 on error.
int vzt_anyres(const uint8_t* src, int sw, int sh,
               const int* pin_w, const int* pin_h, int n_pins,
               int target, int max_patches,
               float* out, int* out_valid) {
    // Best-fit selection (matches data/anyres.py select_best_fit_resolution).
    long best_eff = 0;
    double best_waste = 1e300;
    int bw = -1, bh = -1;
    for (int i = 0; i < n_pins; ++i) {
        double scale = std::min(
            static_cast<double>(pin_w[i]) / sw, static_cast<double>(pin_h[i]) / sh);
        long dw = static_cast<long>(sw * scale), dh = static_cast<long>(sh * scale);
        long eff = std::min(dw * dh, static_cast<long>(sw) * sh);
        double waste = static_cast<double>(pin_w[i]) * pin_h[i] - eff;
        if (eff > best_eff || (eff == best_eff && waste < best_waste)) {
            best_eff = eff;
            best_waste = waste;
            bw = pin_w[i];
            bh = pin_h[i];
        }
    }
    if (bw < 0) return -1;

    int tiles_x = bw / target, tiles_y = bh / target;
    int live = 1 + tiles_x * tiles_y;
    if (live > max_patches) return -1;

    // Global view: direct resize to target×target.
    std::vector<uint8_t> global(static_cast<size_t>(target) * target * 3);
    vzt_resize_lanczos(src, sw, sh, global.data(), target, target);
    long patch_floats = static_cast<long>(target) * target * 3;
    normalize_into(global.data(), target, out);

    // Fit-within resize + centered black pad onto the canvas.
    double scale = std::min(static_cast<double>(bw) / sw, static_cast<double>(bh) / sh);
    int nw = static_cast<int>(sw * scale), nh = static_cast<int>(sh * scale);
    std::vector<uint8_t> resized(static_cast<size_t>(nw) * nh * 3);
    vzt_resize_lanczos(src, sw, sh, resized.data(), nw, nh);
    std::vector<uint8_t> canvas(static_cast<size_t>(bw) * bh * 3, 0);
    int px = (bw - nw) / 2, py = (bh - nh) / 2;
    for (int y = 0; y < nh; ++y) {
        std::memcpy(&canvas[(static_cast<size_t>(py + y) * bw + px) * 3],
                    &resized[static_cast<size_t>(y) * nw * 3],
                    static_cast<size_t>(nw) * 3);
    }

    // Row-major tiles.
    std::vector<uint8_t> tile(static_cast<size_t>(target) * target * 3);
    int p = 1;
    for (int ty = 0; ty < tiles_y; ++ty) {
        for (int tx = 0; tx < tiles_x; ++tx, ++p) {
            for (int y = 0; y < target; ++y) {
                std::memcpy(&tile[static_cast<size_t>(y) * target * 3],
                            &canvas[((static_cast<size_t>(ty) * target + y) * bw
                                     + static_cast<size_t>(tx) * target) * 3],
                            static_cast<size_t>(target) * 3);
            }
            normalize_into(tile.data(), target, out + static_cast<long>(p) * patch_floats);
        }
    }
    // Zero-fill padding patches + validity.
    for (int i = live; i < max_patches; ++i) {
        std::memset(out + static_cast<long>(i) * patch_floats, 0,
                    sizeof(float) * patch_floats);
    }
    for (int i = 0; i < max_patches; ++i) out_valid[i] = i < live ? 1 : 0;
    return live;
}

}  // extern "C"
