// artdeco-tpu native runtime: threaded image decode + dual-resolution
// resize pipeline.
//
// Role parity: the reference decodes every image TWICE in separate OS
// processes (frontend at SLAM res, mapper at map res — run_system.py:163,
// Frontend.py:61; see SURVEY.md §3 "process crossings").  Here one native
// worker pool decodes each frame once (libjpeg/libpng) and produces both
// streams into a preallocated ring, overlapping with TPU compute.
//
// C ABI consumed by artdeco_tpu/runtime/native_loader.py via ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC artdeco_io.cpp -o libartdeco_io.so
//        -ljpeg -lpng -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

// ---------------------------------------------------------------------------
// Decoding
// ---------------------------------------------------------------------------

struct Image {
    std::vector<uint8_t> rgb;  // H*W*3
    int w = 0, h = 0;
    bool ok = false;
};

struct JpegErr {
    jpeg_error_mgr pub;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jb, 1);
}

Image decode_jpeg(FILE* f) {
    Image out;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return out;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    out.w = cinfo.output_width;
    out.h = cinfo.output_height;
    out.rgb.resize(size_t(out.w) * out.h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out.rgb.data() + size_t(cinfo.output_scanline) * out.w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    out.ok = true;
    return out;
}

Image decode_png(FILE* f) {
    Image out;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) return out;
    png_infop info = png_create_info_struct(png);
    if (!info || setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        return out;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_uint_32 w, h;
    int bit_depth, color_type;
    png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type,
                 nullptr, nullptr, nullptr);
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_read_update_info(png, info);
    out.w = int(w);
    out.h = int(h);
    out.rgb.resize(size_t(w) * h * 3);
    std::vector<png_bytep> rows(h);
    for (png_uint_32 y = 0; y < h; y++)
        rows[y] = out.rgb.data() + size_t(y) * w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    out.ok = true;
    return out;
}

Image decode_file(const char* path) {
    Image out;
    FILE* f = fopen(path, "rb");
    if (!f) return out;
    uint8_t magic[8] = {0};
    if (fread(magic, 1, 8, f) != 8) {
        fclose(f);
        return out;
    }
    rewind(f);
    if (magic[0] == 0xFF && magic[1] == 0xD8) {
        out = decode_jpeg(f);
    } else if (magic[0] == 0x89 && magic[1] == 'P') {
        out = decode_png(f);
    }
    fclose(f);
    return out;
}

// ---------------------------------------------------------------------------
// Resizing (area downsample / bilinear upsample — cv2.INTER_AREA-compatible
// for integer factors, bilinear otherwise)
// ---------------------------------------------------------------------------

void resize_rgb(const uint8_t* src, int sw, int sh, float* dst_hwc,
                int dw, int dh) {
    const float sx = float(sw) / dw;
    const float sy = float(sh) / dh;
    if (sx >= 1.0f && sy >= 1.0f) {
        // area average over the source footprint
        for (int y = 0; y < dh; y++) {
            const float y0f = y * sy, y1f = (y + 1) * sy;
            const int y0 = int(y0f), y1 = std::min(int(ceilf(y1f)), sh);
            for (int x = 0; x < dw; x++) {
                const float x0f = x * sx, x1f = (x + 1) * sx;
                const int x0 = int(x0f), x1 = std::min(int(ceilf(x1f)), sw);
                float acc[3] = {0, 0, 0};
                float wsum = 0;
                for (int yy = y0; yy < y1; yy++) {
                    const float wy = std::min(float(yy + 1), y1f) -
                                     std::max(float(yy), y0f);
                    for (int xx = x0; xx < x1; xx++) {
                        const float wx = std::min(float(xx + 1), x1f) -
                                         std::max(float(xx), x0f);
                        const float wgt = wx * wy;
                        const uint8_t* p = src + (size_t(yy) * sw + xx) * 3;
                        acc[0] += wgt * p[0];
                        acc[1] += wgt * p[1];
                        acc[2] += wgt * p[2];
                        wsum += wgt;
                    }
                }
                float* o = dst_hwc + (size_t(y) * dw + x) * 3;
                o[0] = acc[0] / wsum;
                o[1] = acc[1] / wsum;
                o[2] = acc[2] / wsum;
            }
        }
    } else {
        // bilinear
        for (int y = 0; y < dh; y++) {
            const float fy = (y + 0.5f) * sy - 0.5f;
            const int y0 = std::max(0, std::min(int(floorf(fy)), sh - 1));
            const int y1 = std::min(y0 + 1, sh - 1);
            const float dy = fy - y0;
            for (int x = 0; x < dw; x++) {
                const float fx = (x + 0.5f) * sx - 0.5f;
                const int x0 = std::max(0, std::min(int(floorf(fx)), sw - 1));
                const int x1 = std::min(x0 + 1, sw - 1);
                const float dx = fx - x0;
                float* o = dst_hwc + (size_t(y) * dw + x) * 3;
                for (int c = 0; c < 3; c++) {
                    const float a = src[(size_t(y0) * sw + x0) * 3 + c];
                    const float b = src[(size_t(y0) * sw + x1) * 3 + c];
                    const float cc = src[(size_t(y1) * sw + x0) * 3 + c];
                    const float d = src[(size_t(y1) * sw + x1) * 3 + c];
                    o[c] = a * (1 - dx) * (1 - dy) + b * dx * (1 - dy) +
                           cc * (1 - dx) * dy + d * dx * dy;
                }
            }
        }
    }
}

// HWC float [0,255] -> CHW float normalized
void hwc_to_chw(const float* hwc, float* chw, int w, int h,
                float scale, float shift) {
    for (int c = 0; c < 3; c++)
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                chw[(size_t(c) * h + y) * w + x] =
                    hwc[(size_t(y) * w + x) * 3 + c] * scale + shift;
}

// ---------------------------------------------------------------------------
// Prefetcher: worker pool filling an ordered ring of decoded frames
// ---------------------------------------------------------------------------

struct Slot {
    std::vector<float> slam;  // 3 * slam_h * slam_w, [-1, 1]
    std::vector<float> map;   // 3 * map_h * map_w, [0, 1]
    std::atomic<int> state{0};  // 0 empty, 1 ready, 2 failed
};

struct Prefetcher {
    std::vector<std::string> paths;
    int slam_w, slam_h;     // final (cropped) SLAM dims
    int rs_w, rs_h;         // long-edge-resized dims before crop
    int map_w, map_h;
    int ring_size;
    std::vector<Slot> slots;
    std::atomic<size_t> next_job{0};
    std::atomic<size_t> consumed{0};
    std::atomic<bool> stop{false};
    std::vector<std::thread> workers;
    std::mutex mu;
    std::condition_variable cv;

    void worker() {
        std::vector<float> hwc_slam(size_t(rs_w) * rs_h * 3);
        std::vector<float> hwc_map(size_t(map_w) * map_h * 3);
        while (!stop.load()) {
            size_t job = next_job.fetch_add(1);
            if (job >= paths.size()) break;
            // bounded lookahead: wait until the ring slot is free
            Slot& slot = slots[job % ring_size];
            {
                std::unique_lock<std::mutex> lk(mu);
                cv.wait(lk, [&] {
                    return stop.load() ||
                           job < consumed.load() + ring_size;
                });
            }
            if (stop.load()) break;
            Image img = decode_file(paths[job].c_str());
            if (!img.ok) {
                {
                    // hold mu so the store can't land between a waiter's
                    // predicate check and its re-block (lost wakeup)
                    std::lock_guard<std::mutex> lk(mu);
                    slot.state.store(2);
                }
                cv.notify_all();
                continue;
            }
            // SLAM stream: resize long edge then centre-crop
            resize_rgb(img.rgb.data(), img.w, img.h, hwc_slam.data(),
                       rs_w, rs_h);
            const int ox = (rs_w - slam_w) / 2;
            const int oy = (rs_h - slam_h) / 2;
            for (int c = 0; c < 3; c++)
                for (int y = 0; y < slam_h; y++)
                    for (int x = 0; x < slam_w; x++)
                        slot.slam[(size_t(c) * slam_h + y) * slam_w + x] =
                            hwc_slam[(size_t(y + oy) * rs_w + (x + ox)) * 3 + c]
                            * (2.0f / 255.0f) - 1.0f;
            // map stream
            resize_rgb(img.rgb.data(), img.w, img.h, hwc_map.data(),
                       map_w, map_h);
            hwc_to_chw(hwc_map.data(), slot.map.data(), map_w, map_h,
                       1.0f / 255.0f, 0.0f);
            {
                std::lock_guard<std::mutex> lk(mu);
                slot.state.store(1);
            }
            cv.notify_all();
        }
    }
};

}  // namespace

extern "C" {

void* prefetcher_create(const char** paths, int n_paths,
                        int slam_w, int slam_h, int rs_w, int rs_h,
                        int map_w, int map_h,
                        int ring_size, int n_threads) {
    auto* p = new Prefetcher();
    p->paths.assign(paths, paths + n_paths);
    p->slam_w = slam_w;
    p->slam_h = slam_h;
    p->rs_w = rs_w;
    p->rs_h = rs_h;
    p->map_w = map_w;
    p->map_h = map_h;
    p->ring_size = ring_size;
    p->slots = std::vector<Slot>(ring_size);
    for (auto& s : p->slots) {
        s.slam.resize(size_t(3) * slam_h * slam_w);
        s.map.resize(size_t(3) * map_h * map_w);
    }
    for (int t = 0; t < n_threads; t++)
        p->workers.emplace_back(&Prefetcher::worker, p);
    return p;
}

// Blocks until frame `idx` (must be consumed in order) is ready; copies into
// caller buffers. Returns 1 ok, 0 decode failure.
int prefetcher_get(void* handle, int idx, float* slam_out, float* map_out) {
    auto* p = static_cast<Prefetcher*>(handle);
    Slot& slot = p->slots[idx % p->ring_size];
    {
        std::unique_lock<std::mutex> lk(p->mu);
        p->cv.wait(lk, [&] { return slot.state.load() != 0; });
    }
    const int st = slot.state.load();
    if (st == 1) {
        memcpy(slam_out, slot.slam.data(), slot.slam.size() * sizeof(float));
        memcpy(map_out, slot.map.data(), slot.map.size() * sizeof(float));
    }
    {
        std::lock_guard<std::mutex> lk(p->mu);
        slot.state.store(0);
        p->consumed.fetch_add(1);
    }
    p->cv.notify_all();
    return st == 1 ? 1 : 0;
}

void prefetcher_destroy(void* handle) {
    auto* p = static_cast<Prefetcher*>(handle);
    {
        std::lock_guard<std::mutex> lk(p->mu);
        p->stop.store(true);
    }
    p->cv.notify_all();
    for (auto& t : p->workers) t.join();
    delete p;
}

// One-shot decode (testing / simple callers).
int decode_image(const char* path, uint8_t* out, int max_bytes,
                 int* w, int* h) {
    Image img = decode_file(path);
    if (!img.ok) return 0;
    *w = img.w;
    *h = img.h;
    if (int(img.rgb.size()) > max_bytes) return 0;
    memcpy(out, img.rgb.data(), img.rgb.size());
    return 1;
}

}  // extern "C"
