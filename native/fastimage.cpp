// fastimage: native image-decode + augmentation core for the data pipeline.
//
// The reference feeds its GPUs through torchvision/PIL inside DataLoader worker
// processes; this is the TPU-native framework's equivalent native component: a
// C++ JPEG/PNG decoder with fused bilinear resize and the three transform modes
// the pipelines need, batched over a pthread pool and exposed through a C ABI
// (ctypes — no pybind11 in this environment):
//
//   mode 0: resize to exactly (out_h, out_w)            [THINGS: Resize((224,224))]
//   mode 1: RandomResizedCrop(out) + random h-flip      [ImageNet train]
//           (torchvision sampling: 10 attempts of area in [0.08,1.0] and
//            log-uniform aspect in [3/4,4/3], then center fallback)
//   mode 2: resize shorter side to `resize_to`, center crop (out) [ImageNet val]
//
// Augmentation randomness comes from a splitmix64 PRNG seeded per call, so a
// (seed, epoch, index) tuple reproduces the same crop/flip exactly — the same
// replayability contract as the Python loader.
//
// Build: make -C native   (produces libfastimage.so; loaded via ctypes with a
// transparent PIL fallback when absent).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <cmath>
#include <csetjmp>
#include <algorithm>
#include <vector>
#include <thread>
#include <atomic>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------- PRNG -----
struct SplitMix64 {
    uint64_t s;
    explicit SplitMix64(uint64_t seed) : s(seed) {}
    uint64_t next() {
        uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
        z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
        z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
        return z ^ (z >> 31);
    }
    double uniform() {  // [0, 1)
        return (next() >> 11) * (1.0 / 9007199254740992.0);
    }
    int64_t randint(int64_t lo, int64_t hi) {  // [lo, hi] inclusive
        return lo + (int64_t)(uniform() * (double)(hi - lo + 1));
    }
};

struct ImageU8 {
    int w = 0, h = 0;
    std::vector<uint8_t> rgb;  // h*w*3
};

// ---------------------------------------------------------------- JPEG -----
struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, const uint8_t* buf, size_t len, ImageU8* out) {
    // exactly one source: a stdio stream (f) or a memory buffer (buf+len —
    // the packed-dataset path, which decodes records straight out of the
    // mmapped shard with zero per-image file opens)
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    if (f != nullptr) {
        jpeg_stdio_src(&cinfo, f);
    } else {
        jpeg_mem_src(&cinfo, buf, (unsigned long)len);
    }
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    out->w = cinfo.output_width;
    out->h = cinfo.output_height;
    out->rgb.resize((size_t)out->w * out->h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out->rgb.data() + (size_t)cinfo.output_scanline * out->w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

// ----------------------------------------------------------------- PNG -----
struct PngMemSrc {
    const uint8_t* buf;
    size_t len;
    size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
    PngMemSrc* src = reinterpret_cast<PngMemSrc*>(png_get_io_ptr(png));
    if (src->pos + n > src->len) {
        png_error(png, "read past end of memory buffer");
        return;
    }
    std::memcpy(out, src->buf + src->pos, n);
    src->pos += n;
}

bool decode_png(FILE* f, const uint8_t* buf, size_t len, ImageU8* out) {
    // one source: stdio stream or memory buffer (see decode_jpeg)
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) return false;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return false;
    }
    PngMemSrc src = {buf, len, 0};
    if (f != nullptr) {
        png_init_io(png, f);
    } else {
        png_set_read_fn(png, &src, png_mem_read);
    }
    png_read_info(png, info);
    png_uint_32 w, h;
    int bit_depth, color_type;
    png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr,
                 nullptr, nullptr);
    // normalize everything to 8-bit RGB
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_ALPHA ||
        png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_strip_alpha(png);
    png_read_update_info(png, info);

    out->w = (int)w;
    out->h = (int)h;
    out->rgb.resize((size_t)w * h * 3);
    std::vector<png_bytep> rows(h);
    for (png_uint_32 y = 0; y < h; ++y)
        rows[y] = out->rgb.data() + (size_t)y * w * 3;
    png_read_image(png, rows.data());
    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    return true;
}

bool decode_file(const char* path, ImageU8* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    uint8_t magic[8] = {0};
    size_t n = fread(magic, 1, 8, f);
    rewind(f);
    bool ok = false;
    if (n >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
        ok = decode_jpeg(f, nullptr, 0, out);
    } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
        ok = decode_png(f, nullptr, 0, out);
    }
    fclose(f);
    return ok && out->w > 0 && out->h > 0;
}

bool decode_mem(const uint8_t* buf, size_t len, ImageU8* out) {
    if (buf == nullptr || len < 8) return false;
    bool ok = false;
    if (buf[0] == 0xFF && buf[1] == 0xD8) {
        ok = decode_jpeg(nullptr, buf, len, out);
    } else if (png_sig_cmp(const_cast<png_bytep>(buf), 0, 8) == 0) {
        ok = decode_png(nullptr, buf, len, out);
    }
    return ok && out->w > 0 && out->h > 0;
}

// ------------------------------------------------------------- resize ------
// Separable antialiased triangle (bilinear) resample of a crop region
// [x0, x0+cw) x [y0, y0+ch) to out_w x out_h, with optional horizontal flip.
// Coefficient computation follows PIL's precompute_coeffs (triangle filter,
// support scaled by the reduction factor), so outputs closely match
// Image.resize(..., Image.BILINEAR).

struct Taps {
    std::vector<int> bounds;      // 2 per output pixel: (start, count)
    std::vector<float> weights;   // kmax per output pixel
    int kmax = 0;
};

Taps precompute_taps(int in_size, int crop0, int crop_size, int out_size) {
    Taps t;
    double scale = (double)crop_size / out_size;
    double filterscale = std::max(scale, 1.0);
    double support = 1.0 * filterscale;  // triangle filter support = 1
    t.kmax = (int)std::ceil(support) * 2 + 1;
    t.bounds.resize(2 * out_size);
    t.weights.assign((size_t)t.kmax * out_size, 0.0f);
    for (int xx = 0; xx < out_size; ++xx) {
        double center = crop0 + (xx + 0.5) * scale;
        int xmin = (int)(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = (int)(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        float* k = &t.weights[(size_t)xx * t.kmax];
        double ww = 0.0;
        for (int x = 0; x < xmax; ++x) {
            double arg = (x + xmin - center + 0.5) / filterscale;
            double w = (arg < 0 ? 1.0 + arg : 1.0 - arg);
            if (w < 0) w = 0;
            k[x] = (float)w;
            ww += w;
        }
        if (ww != 0.0)
            for (int x = 0; x < xmax; ++x) k[x] = (float)(k[x] / ww);
        t.bounds[xx * 2] = xmin;
        t.bounds[xx * 2 + 1] = xmax;
    }
    return t;
}

void resize_bilinear_crop(const ImageU8& src, int x0, int y0, int cw, int ch,
                          int out_w, int out_h, bool flip, uint8_t* out) {
    Taps tx = precompute_taps(src.w, x0, cw, out_w);
    Taps ty = precompute_taps(src.h, y0, ch, out_h);
    // horizontal pass over the vertically-needed rows only
    int ry0 = ty.bounds[0];
    int ry1 = ty.bounds[(out_h - 1) * 2] + ty.bounds[(out_h - 1) * 2 + 1];
    int rows = ry1 - ry0;
    std::vector<float> mid((size_t)rows * out_w * 3);
    for (int y = 0; y < rows; ++y) {
        const uint8_t* srow = &src.rgb[(size_t)(y + ry0) * src.w * 3];
        float* drow = &mid[(size_t)y * out_w * 3];
        for (int ox = 0; ox < out_w; ++ox) {
            int xmin = tx.bounds[ox * 2], xmax = tx.bounds[ox * 2 + 1];
            const float* k = &tx.weights[(size_t)ox * tx.kmax];
            float r = 0, g = 0, b = 0;
            const uint8_t* p = srow + (size_t)xmin * 3;
            for (int x = 0; x < xmax; ++x, p += 3) {
                r += k[x] * p[0];
                g += k[x] * p[1];
                b += k[x] * p[2];
            }
            drow[ox * 3] = r;
            drow[ox * 3 + 1] = g;
            drow[ox * 3 + 2] = b;
        }
    }
    // vertical pass
    for (int oy = 0; oy < out_h; ++oy) {
        int ymin = ty.bounds[oy * 2] - ry0, ymax = ty.bounds[oy * 2 + 1];
        const float* k = &ty.weights[(size_t)oy * ty.kmax];
        uint8_t* drow = out + (size_t)oy * out_w * 3;
        for (int ox = 0; ox < out_w; ++ox) {
            float r = 0, g = 0, b = 0;
            for (int y = 0; y < ymax; ++y) {
                const float* p = &mid[((size_t)(ymin + y) * out_w + ox) * 3];
                r += k[y] * p[0];
                g += k[y] * p[1];
                b += k[y] * p[2];
            }
            int txx = flip ? (out_w - 1 - ox) : ox;
            uint8_t* d = drow + (size_t)txx * 3;
            d[0] = (uint8_t)std::lround(std::min(255.0f, std::max(0.0f, r)));
            d[1] = (uint8_t)std::lround(std::min(255.0f, std::max(0.0f, g)));
            d[2] = (uint8_t)std::lround(std::min(255.0f, std::max(0.0f, b)));
        }
    }
}

// torchvision RandomResizedCrop parameter sampling
void sample_rrc(SplitMix64& rng, int W, int H, int* x0, int* y0, int* cw,
                int* ch) {
    const double area = (double)W * H;
    const double log_lo = std::log(3.0 / 4.0), log_hi = std::log(4.0 / 3.0);
    for (int i = 0; i < 10; ++i) {
        double target_area = area * (0.08 + rng.uniform() * (1.0 - 0.08));
        double aspect = std::exp(log_lo + rng.uniform() * (log_hi - log_lo));
        int w = (int)std::lround(std::sqrt(target_area * aspect));
        int h = (int)std::lround(std::sqrt(target_area / aspect));
        if (w > 0 && w <= W && h > 0 && h <= H) {
            *y0 = (int)rng.randint(0, H - h);
            *x0 = (int)rng.randint(0, W - w);
            *cw = w;
            *ch = h;
            return;
        }
    }
    // center fallback
    double in_ratio = (double)W / H;
    int w, h;
    if (in_ratio < 3.0 / 4.0) {
        w = W;
        h = (int)std::lround(W / (3.0 / 4.0));
    } else if (in_ratio > 4.0 / 3.0) {
        h = H;
        w = (int)std::lround(H * (4.0 / 3.0));
    } else {
        w = W;
        h = H;
    }
    *y0 = (H - h) / 2;
    *x0 = (W - w) / 2;
    *cw = w;
    *ch = h;
}

int transform_decoded(ImageU8& img, int mode, int out_h, int out_w,
                      int resize_to, uint64_t seed, uint8_t* out) {
    if (mode == 0) {  // plain resize
        resize_bilinear_crop(img, 0, 0, img.w, img.h, out_w, out_h, false, out);
    } else if (mode == 1) {  // RandomResizedCrop + flip
        SplitMix64 rng(seed);
        int x0, y0, cw, ch;
        sample_rrc(rng, img.w, img.h, &x0, &y0, &cw, &ch);
        bool flip = rng.uniform() < 0.5;
        resize_bilinear_crop(img, x0, y0, cw, ch, out_w, out_h, flip, out);
    } else if (mode == 2) {  // resize shorter side then center crop
        int nw, nh;
        if (img.w < img.h) {
            nw = resize_to;
            nh = (int)std::lround((double)resize_to * img.h / img.w);
        } else {
            nh = resize_to;
            nw = (int)std::lround((double)resize_to * img.w / img.h);
        }
        // a crop larger than the resized image would read before/past the
        // mid buffer (negative left/top) — reject at EVERY entry point,
        // not just the Python wrapper
        if (out_w > nw || out_h > nh) return -3;
        std::vector<uint8_t> tmp((size_t)nw * nh * 3);
        resize_bilinear_crop(img, 0, 0, img.w, img.h, nw, nh, false, tmp.data());
        ImageU8 mid;
        mid.w = nw;
        mid.h = nh;
        mid.rgb = std::move(tmp);
        int left = (nw - out_w) / 2, top = (nh - out_h) / 2;
        for (int y = 0; y < out_h; ++y)
            std::memcpy(out + (size_t)y * out_w * 3,
                        mid.rgb.data() + ((size_t)(top + y) * nw + left) * 3,
                        (size_t)out_w * 3);
    } else {
        return -2;
    }
    return 0;
}

int transform_one(const char* path, int mode, int out_h, int out_w,
                  int resize_to, uint64_t seed, uint8_t* out) {
    ImageU8 img;
    if (!decode_file(path, &img)) return -1;
    return transform_decoded(img, mode, out_h, out_w, resize_to, seed, out);
}

int transform_one_mem(const uint8_t* buf, size_t len, int mode, int out_h,
                      int out_w, int resize_to, uint64_t seed, uint8_t* out) {
    ImageU8 img;
    if (!decode_mem(buf, len, &img)) return -1;
    return transform_decoded(img, mode, out_h, out_w, resize_to, seed, out);
}

}  // namespace

extern "C" {

// Decode+transform one image into out[out_h*out_w*3] (uint8 RGB).
// Returns 0 on success, negative on error.
int fi_transform(const char* path, int mode, int out_h, int out_w,
                 int resize_to, uint64_t seed, uint8_t* out) {
    return transform_one(path, mode, out_h, out_w, resize_to, seed, out);
}

// Batched variant over `n` images with `threads` worker threads.
// paths: array of n C strings; seeds: array of n per-image seeds;
// out: n*out_h*out_w*3 bytes. Returns number of failed images.
int fi_transform_batch(const char** paths, int n, int mode, int out_h,
                       int out_w, int resize_to, const uint64_t* seeds,
                       uint8_t* out, int threads) {
    std::atomic<int> next(0), failed(0);
    const size_t stride = (size_t)out_h * out_w * 3;
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            if (transform_one(paths[i], mode, out_h, out_w, resize_to,
                              seeds[i], out + stride * i) != 0)
                failed.fetch_add(1);
        }
    };
    int t = std::max(1, std::min(threads, n));
    std::vector<std::thread> pool;
    pool.reserve(t);
    for (int i = 0; i < t; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return failed.load();
}

// Memory-buffer batched variant (the packed-dataset path: records decode
// straight out of the mmapped shard — no per-image file opens).
// bufs: n pointers to encoded JPEG/PNG bytes; lens: their byte lengths;
// seeds/out/threads as fi_transform_batch. Returns number of failed images.
int fi_transform_mem_batch(const uint8_t* const* bufs, const size_t* lens,
                           int n, int mode, int out_h, int out_w,
                           int resize_to, const uint64_t* seeds,
                           uint8_t* out, int threads) {
    std::atomic<int> next(0), failed(0);
    const size_t stride = (size_t)out_h * out_w * 3;
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            if (transform_one_mem(bufs[i], lens[i], mode, out_h, out_w,
                                  resize_to, seeds[i],
                                  out + stride * i) != 0)
                failed.fetch_add(1);
        }
    };
    int t = std::max(1, std::min(threads, n));
    std::vector<std::thread> pool;
    pool.reserve(t);
    for (int i = 0; i < t; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return failed.load();
}

int fi_version() { return 2; }

}  // extern "C"
