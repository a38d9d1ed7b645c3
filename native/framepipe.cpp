// framepipe — native frame ring buffer + threaded prefetch + pixel converters.
//
// TPU-native replacement for the runtime role VapourSynth's C++ core plays in
// the reference (frame graph + thread-pool scheduler + frame cache;
// reference: SURVEY.md L0 — vsdeoldify rides on VapourSynth for all frame
// scheduling).  Here the hot host-side path is:
//
//   decoder thread(s) -> ring buffer of reusable frame slots -> Python
//   drains batches -> jax.device_put (overlapped by JAX async dispatch)
//
// Components:
//  * FrameRing: bounded MPMC ring of fixed-size frame buffers with
//    mutex+condvar handoff (blocking push/pop, shutdown support).
//  * Y4M reader: dependency-free YUV4MPEG2 demuxer (the interchange format
//    ffmpeg pipes produce) with a background prefetch thread filling a ring.
//  * Pixel converters: uint8 -> float32 [0,1] (and back with rounding),
//    interleaved->planar — the host-side format work that would otherwise
//    eat Python time per batch.  Plain loops; compilers autovectorize.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// FrameRing
// ---------------------------------------------------------------------------

struct FrameRing {
    std::vector<std::vector<uint8_t>> slots;
    std::vector<size_t> sizes;     // payload bytes per occupied slot
    std::vector<int64_t> indices;  // frame index per occupied slot
    size_t capacity;
    size_t frame_bytes;
    size_t head = 0, tail = 0, count = 0;
    bool closed = false;
    std::mutex mu;
    std::condition_variable cv_push, cv_pop;
};

FrameRing* fr_create(size_t capacity, size_t frame_bytes) {
    auto* r = new FrameRing();
    r->capacity = capacity;
    r->frame_bytes = frame_bytes;
    r->slots.resize(capacity);
    for (auto& s : r->slots) s.resize(frame_bytes);
    r->sizes.resize(capacity, 0);
    r->indices.resize(capacity, -1);
    return r;
}

void fr_destroy(FrameRing* r) { delete r; }

void fr_close(FrameRing* r) {
    std::lock_guard<std::mutex> lk(r->mu);
    r->closed = true;
    r->cv_push.notify_all();
    r->cv_pop.notify_all();
}

// push: copies `size` bytes into the next free slot; blocks while full.
// returns 0 on success, -1 if closed.
int fr_push(FrameRing* r, const uint8_t* data, size_t size, int64_t index) {
    std::unique_lock<std::mutex> lk(r->mu);
    r->cv_push.wait(lk, [&] { return r->count < r->capacity || r->closed; });
    if (r->closed) return -1;
    size_t slot = r->tail;
    std::memcpy(r->slots[slot].data(), data, size);
    r->sizes[slot] = size;
    r->indices[slot] = index;
    r->tail = (r->tail + 1) % r->capacity;
    r->count++;
    r->cv_pop.notify_one();
    return 0;
}

// pop: copies the oldest frame out; blocks while empty.
// returns payload size, 0 if closed-and-drained, -1 on error.
int64_t fr_pop(FrameRing* r, uint8_t* out, int64_t* index_out) {
    std::unique_lock<std::mutex> lk(r->mu);
    r->cv_pop.wait(lk, [&] { return r->count > 0 || r->closed; });
    if (r->count == 0) return 0;  // closed and drained
    size_t slot = r->head;
    size_t size = r->sizes[slot];
    std::memcpy(out, r->slots[slot].data(), size);
    if (index_out) *index_out = r->indices[slot];
    r->head = (r->head + 1) % r->capacity;
    r->count--;
    r->cv_push.notify_one();
    return (int64_t)size;
}

size_t fr_size(FrameRing* r) {
    std::lock_guard<std::mutex> lk(r->mu);
    return r->count;
}

// ---------------------------------------------------------------------------
// Y4M reader with background prefetch
// ---------------------------------------------------------------------------

struct Y4MReader {
    FILE* f = nullptr;
    int width = 0, height = 0;
    int fps_num = 25, fps_den = 1;
    std::string colorspace = "420";
    size_t frame_bytes = 0;  // raw YUV payload per frame
    FrameRing* ring = nullptr;
    std::thread worker;
    std::atomic<bool> stop{false};
    int64_t frames_read = 0;
};

static bool y4m_parse_header(Y4MReader* r) {
    char line[1024];
    if (!fgets(line, sizeof(line), r->f)) return false;
    if (strncmp(line, "YUV4MPEG2", 9) != 0) return false;
    char* tok = strtok(line + 9, " \n");
    while (tok) {
        switch (tok[0]) {
            case 'W': r->width = atoi(tok + 1); break;
            case 'H': r->height = atoi(tok + 1); break;
            case 'F': sscanf(tok + 1, "%d:%d", &r->fps_num, &r->fps_den); break;
            case 'C': r->colorspace = std::string(tok + 1); break;
            default: break;
        }
        tok = strtok(nullptr, " \n");
    }
    size_t luma = (size_t)r->width * r->height;
    if (r->colorspace.rfind("444", 0) == 0) r->frame_bytes = luma * 3;
    else if (r->colorspace.rfind("422", 0) == 0) r->frame_bytes = luma * 2;
    else r->frame_bytes = luma * 3 / 2;  // 420 / mono handled below
    if (r->colorspace.rfind("mono", 0) == 0) r->frame_bytes = luma;
    return r->width > 0 && r->height > 0;
}

Y4MReader* y4m_open(const char* path) {
    auto* r = new Y4MReader();
    r->f = fopen(path, "rb");
    if (!r->f || !y4m_parse_header(r)) {
        if (r->f) fclose(r->f);
        delete r;
        return nullptr;
    }
    return r;
}

void y4m_info(Y4MReader* r, int* w, int* h, int* fps_num, int* fps_den,
              int64_t* frame_bytes) {
    *w = r->width;
    *h = r->height;
    *fps_num = r->fps_num;
    *fps_den = r->fps_den;
    *frame_bytes = (int64_t)r->frame_bytes;
}

// synchronous single-frame read; returns bytes read or 0 on EOF.
int64_t y4m_read_frame(Y4MReader* r, uint8_t* out) {
    char line[256];
    if (!fgets(line, sizeof(line), r->f)) return 0;  // FRAME header
    if (strncmp(line, "FRAME", 5) != 0) return 0;
    size_t got = fread(out, 1, r->frame_bytes, r->f);
    if (got != r->frame_bytes) return 0;
    r->frames_read++;
    return (int64_t)got;
}

// start a background thread that reads frames into `ring` until EOF.
void y4m_start_prefetch(Y4MReader* r, FrameRing* ring) {
    r->ring = ring;
    r->stop = false;
    r->worker = std::thread([r] {
        std::vector<uint8_t> buf(r->frame_bytes);
        int64_t idx = 0;
        while (!r->stop) {
            int64_t got = y4m_read_frame(r, buf.data());
            if (got <= 0) break;
            if (fr_push(r->ring, buf.data(), (size_t)got, idx++) != 0) break;
        }
        fr_close(r->ring);
    });
}

void y4m_close(Y4MReader* r) {
    r->stop = true;
    if (r->ring) fr_close(r->ring);
    if (r->worker.joinable()) r->worker.join();
    if (r->f) fclose(r->f);
    delete r;
}

// ---------------------------------------------------------------------------
// Pixel converters
// ---------------------------------------------------------------------------

void u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
    const float s = 1.0f / 255.0f;
    for (int64_t i = 0; i < n; i++) dst[i] = src[i] * s;
}

void f32_to_u8(const float* src, uint8_t* dst, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        float v = src[i] * 255.0f + 0.5f;
        if (v < 0.f) v = 0.f;
        if (v > 255.f) v = 255.f;
        dst[i] = (uint8_t)v;
    }
}

// Floyd–Steinberg error-diffusion quantizer: float plane (arbitrary scale,
// caller pre-maps to the target code range) -> uint8 codes.  The encode-path
// equivalent of zimg's dither_type="error_diffusion" that the reference's
// restore_format relies on (havc_utils.py:167-237) — sequential error
// propagation is a poor fit for XLA, so it runs here on the host.
//   src: h*w floats already scaled to output code values (e.g. 16..235)
//   lo/hi: clamp range of the output codes
void fs_dither_u8(const float* src, uint8_t* dst, int w, int h,
                  float lo, float hi) {
    std::vector<float> err_cur((size_t)w + 2, 0.f);
    std::vector<float> err_next((size_t)w + 2, 0.f);
    for (int y = 0; y < h; y++) {
        std::fill(err_next.begin(), err_next.end(), 0.f);
        for (int x = 0; x < w; x++) {
            float v = src[(size_t)y * w + x] + err_cur[x + 1];
            float q = v + 0.5f;
            if (q < lo) q = lo;
            if (q > hi) q = hi;
            uint8_t code = (uint8_t)q;
            dst[(size_t)y * w + x] = code;
            float e = v - (float)code;
            err_cur[x + 2]  += e * (7.0f / 16.0f);
            err_next[x]     += e * (3.0f / 16.0f);
            err_next[x + 1] += e * (5.0f / 16.0f);
            err_next[x + 2] += e * (1.0f / 16.0f);
        }
        std::swap(err_cur, err_next);
    }
}

// Parallel-for over [0, n): spawns up to hw_concurrency-1 helper threads,
// each striding over items.  Error diffusion is sequential WITHIN a frame
// but frames are independent, so batch calls parallelize across frames.
static void parallel_for_items(int n, const std::function<void(int)>& body) {
    int nt = (int)std::thread::hardware_concurrency();
    if (nt < 2 || n < 2) {
        for (int i = 0; i < n; i++) body(i);
        return;
    }
    if (nt > n) nt = n;
    std::vector<std::thread> pool;
    pool.reserve(nt - 1);
    for (int t = 1; t < nt; t++) {
        pool.emplace_back([=, &body]() {
            for (int i = t; i < n; i += nt) body(i);
        });
    }
    for (int i = 0; i < n; i += nt) body(i);
    for (auto& th : pool) th.join();
}

// Batched form: n independent planes (frames) of h*w, multi-threaded
// across frames.
void fs_dither_u8_batch(const float* src, uint8_t* dst, int n, int w, int h,
                        float lo, float hi) {
    parallel_for_items(n, [=](int i) {
        fs_dither_u8(src + (size_t)i * w * h, dst + (size_t)i * w * h,
                     w, h, lo, hi);
    });
}

// 16-bit-container variant for >8-bit output formats (yuv420p10/p16,
// 4:2:2/4:4:4 high-depth restore — havc_utils.py restore_format keeps the
// clip's ORIGINAL depth, which for feature-film sources is routinely 10+
// bits).  Same Floyd–Steinberg error diffusion, uint16 codes.
void fs_dither_u16(const float* src, uint16_t* dst, int w, int h,
                   float lo, float hi) {
    std::vector<float> err_cur((size_t)w + 2, 0.f);
    std::vector<float> err_next((size_t)w + 2, 0.f);
    for (int y = 0; y < h; y++) {
        std::fill(err_next.begin(), err_next.end(), 0.f);
        for (int x = 0; x < w; x++) {
            float v = src[(size_t)y * w + x] + err_cur[x + 1];
            float q = v + 0.5f;
            if (q < lo) q = lo;
            if (q > hi) q = hi;
            uint16_t code = (uint16_t)q;
            dst[(size_t)y * w + x] = code;
            float e = v - (float)code;
            err_cur[x + 2]  += e * (7.0f / 16.0f);
            err_next[x]     += e * (3.0f / 16.0f);
            err_next[x + 1] += e * (5.0f / 16.0f);
            err_next[x + 2] += e * (1.0f / 16.0f);
        }
        std::swap(err_cur, err_next);
    }
}

void fs_dither_u16_batch(const float* src, uint16_t* dst, int n, int w,
                         int h, float lo, float hi) {
    parallel_for_items(n, [=](int i) {
        fs_dither_u16(src + (size_t)i * w * h, dst + (size_t)i * w * h,
                      w, h, lo, hi);
    });
}

// YUV420 (Y4M layout) -> interleaved RGB float [0,1], BT.601 full range —
// matches the package's colorspace conventions (ops/colorspace.py).
// Multi-threaded over row bands (band edges on even rows so each band owns
// whole 4:2:0 chroma rows).
static void yuv420_rows_to_rgb(const uint8_t* yp, const uint8_t* up,
                               const uint8_t* vp, float* dst, int w,
                               int y0, int y1) {
    for (int y = y0; y < y1; y++) {
        for (int x = 0; x < w; x++) {
            float Y = yp[(size_t)y * w + x] / 255.0f;
            float U = up[(size_t)(y / 2) * (w / 2) + x / 2] / 255.0f - 0.5f;
            float V = vp[(size_t)(y / 2) * (w / 2) + x / 2] / 255.0f - 0.5f;
            float r = Y + V / 0.877f;
            float b = Y + U / 0.492f;
            float g = (Y - 0.299f * r - 0.114f * b) / 0.587f;
            float* o = dst + ((size_t)y * w + x) * 3;
            o[0] = r < 0 ? 0 : (r > 1 ? 1 : r);
            o[1] = g < 0 ? 0 : (g > 1 ? 1 : g);
            o[2] = b < 0 ? 0 : (b > 1 ? 1 : b);
        }
    }
}

void yuv420_to_rgb_f32(const uint8_t* src, float* dst, int w, int h) {
    const uint8_t* yp = src;
    const uint8_t* up = src + (size_t)w * h;
    const uint8_t* vp = up + (size_t)(w / 2) * (h / 2);
    int bands = (h / 2 + 15) / 16;  // >=16 rows of work per task
    parallel_for_items(bands, [=](int b) {
        int y0 = b * 32;           // 32 luma rows per band (even boundary)
        int y1 = y0 + 32;
        if (y1 > h) y1 = h;
        yuv420_rows_to_rgb(yp, up, vp, dst, w, y0, y1);
    });
}

}  // extern "C"
