// koala_tpu_host: native host-side data plane. See include/koala_tpu_host.h.
//
// Design: per-stream SPSC ring buffers of int16 samples with atomic
// head/tail (acquire/release), so an audio callback thread can push while
// the batcher thread gathers, lock-free. The gather packs one frame per
// ready stream into a contiguous [B, frame] batch — the host half of the
// batched device step (the reference's analog is the Web Worker message
// pump, binding/web/src/koala_worker_handler.ts:123-155, which marshals
// frames into the engine heap; ours marshals into a batch for the TPU).

#include "../include/koala_tpu_host.h"

#include <atomic>
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <new>

namespace {

struct Ring {
    int16_t *data = nullptr;
    int64_t capacity = 0;                  // samples, power of two
    std::atomic<int64_t> head{0};          // write position (producer)
    std::atomic<int64_t> tail{0};          // read position (consumer)
    std::atomic<int64_t> dropped{0};

    bool init(int64_t cap_samples) {
        int64_t cap = 1;
        while (cap < cap_samples) cap <<= 1;
        data = static_cast<int16_t *>(std::malloc(sizeof(int16_t) * cap));
        capacity = cap;
        return data != nullptr;
    }
    void destroy() { std::free(data); data = nullptr; }

    int64_t readable() const {
        return head.load(std::memory_order_acquire) -
               tail.load(std::memory_order_acquire);
    }

    kt_status_t push(const int16_t *samples, int64_t n) {
        int64_t h = head.load(std::memory_order_relaxed);
        int64_t t = tail.load(std::memory_order_acquire);
        int64_t free_space = capacity - (h - t);
        int64_t to_write = n < free_space ? n : free_space;
        for (int64_t i = 0; i < to_write; ++i)
            data[(h + i) & (capacity - 1)] = samples[i];
        head.store(h + to_write, std::memory_order_release);
        if (to_write < n) {
            dropped.fetch_add(n - to_write, std::memory_order_relaxed);
            return KT_OVERFLOW;
        }
        return KT_SUCCESS;
    }

    // Pop exactly n samples into out; caller must check readable() >= n.
    void pop(int16_t *out, int64_t n) {
        int64_t t = tail.load(std::memory_order_relaxed);
        for (int64_t i = 0; i < n; ++i)
            out[i] = data[(t + i) & (capacity - 1)];
        tail.store(t + n, std::memory_order_release);
    }

    // As push(), but converts float32 (fullscale 1.0) to int16 while
    // writing into the ring — the fused convert+route used by the serving
    // dispatcher to move a whole device batch in one call.
    kt_status_t push_f32(const float *samples, int64_t n) {
        int64_t h = head.load(std::memory_order_relaxed);
        int64_t t = tail.load(std::memory_order_acquire);
        int64_t free_space = capacity - (h - t);
        int64_t to_write = n < free_space ? n : free_space;
        for (int64_t i = 0; i < to_write; ++i) {
            float v = std::nearbyint(samples[i] * 32768.0f);
            if (v > 32767.0f) v = 32767.0f;
            if (v < -32768.0f) v = -32768.0f;
            data[(h + i) & (capacity - 1)] = static_cast<int16_t>(v);
        }
        head.store(h + to_write, std::memory_order_release);
        if (to_write < n) {
            dropped.fetch_add(n - to_write, std::memory_order_relaxed);
            return KT_OVERFLOW;
        }
        return KT_SUCCESS;
    }

    void clear() {
        tail.store(head.load(std::memory_order_acquire),
                   std::memory_order_release);
    }
};

}  // namespace

struct kt_pool {
    Ring *rings = nullptr;
    int32_t num_streams = 0;
    int32_t frame_length = 0;
};

extern "C" {

kt_pool_t *kt_pool_create(int32_t num_streams, int32_t frame_length,
                          int32_t capacity_frames) {
    if (num_streams <= 0 || frame_length <= 0 || capacity_frames <= 0)
        return nullptr;
    kt_pool_t *pool = new (std::nothrow) kt_pool_t;
    if (!pool) return nullptr;
    pool->rings = new (std::nothrow) Ring[num_streams];
    if (!pool->rings) { delete pool; return nullptr; }
    pool->num_streams = num_streams;
    pool->frame_length = frame_length;
    for (int32_t i = 0; i < num_streams; ++i) {
        if (!pool->rings[i].init(
                static_cast<int64_t>(frame_length) * capacity_frames)) {
            for (int32_t j = 0; j < i; ++j) pool->rings[j].destroy();
            delete[] pool->rings;
            delete pool;
            return nullptr;
        }
    }
    return pool;
}

void kt_pool_delete(kt_pool_t *pool) {
    if (!pool) return;
    for (int32_t i = 0; i < pool->num_streams; ++i) pool->rings[i].destroy();
    delete[] pool->rings;
    delete pool;
}

kt_status_t kt_pool_push(kt_pool_t *pool, int32_t stream,
                         const int16_t *samples, int32_t num_samples) {
    if (!pool || stream < 0 || stream >= pool->num_streams || !samples ||
        num_samples < 0)
        return KT_INVALID_ARGUMENT;
    return pool->rings[stream].push(samples, num_samples);
}

int32_t kt_pool_frames_ready(const kt_pool_t *pool, int32_t stream) {
    if (!pool || stream < 0 || stream >= pool->num_streams) return 0;
    return static_cast<int32_t>(pool->rings[stream].readable() /
                                pool->frame_length);
}

int32_t kt_pool_gather(kt_pool_t *pool, int16_t *batch_out,
                       uint8_t *active_out) {
    if (!pool || !batch_out || !active_out) return -1;
    const int32_t fl = pool->frame_length;
    int32_t active = 0;
    for (int32_t i = 0; i < pool->num_streams; ++i) {
        int16_t *row = batch_out + static_cast<int64_t>(i) * fl;
        if (pool->rings[i].readable() >= fl) {
            pool->rings[i].pop(row, fl);
            active_out[i] = 1;
            ++active;
        } else {
            std::memset(row, 0, sizeof(int16_t) * fl);
            active_out[i] = 0;
        }
    }
    return active;
}

int32_t kt_pool_gather_f32(kt_pool_t *pool, float *batch_out,
                           uint8_t *active_out) {
    if (!pool || !batch_out || !active_out) return -1;
    const int32_t fl = pool->frame_length;
    int32_t active = 0;
    int16_t *tmp = static_cast<int16_t *>(
        std::malloc(sizeof(int16_t) * fl));
    if (!tmp) return -1;
    for (int32_t i = 0; i < pool->num_streams; ++i) {
        float *row = batch_out + static_cast<int64_t>(i) * fl;
        if (pool->rings[i].readable() >= fl) {
            pool->rings[i].pop(tmp, fl);
            kt_pcm_to_f32(tmp, row, fl);
            active_out[i] = 1;
            ++active;
        } else {
            std::memset(row, 0, sizeof(float) * fl);
            active_out[i] = 0;
        }
    }
    std::free(tmp);
    return active;
}

int32_t kt_pool_gather_chunk(kt_pool_t *pool, int16_t *batch_out,
                             int32_t *counts_out, int32_t max_frames) {
    if (!pool || !batch_out || !counts_out || max_frames <= 0) return -1;
    const int32_t fl = pool->frame_length;
    int32_t total = 0;
    for (int32_t i = 0; i < pool->num_streams; ++i) {
        int16_t *row = batch_out +
                       static_cast<int64_t>(i) * max_frames * fl;
        int32_t ready = static_cast<int32_t>(pool->rings[i].readable() / fl);
        int32_t take = ready < max_frames ? ready : max_frames;
        if (take > 0) pool->rings[i].pop(row, static_cast<int64_t>(take) * fl);
        if (take < max_frames)
            std::memset(row + static_cast<int64_t>(take) * fl, 0,
                        sizeof(int16_t) * static_cast<int64_t>(max_frames - take) * fl);
        counts_out[i] = take;
        total += take;
    }
    return total;
}

int32_t kt_pool_push_rows(kt_pool_t *pool, int32_t first_stream,
                          int32_t n_streams, const int16_t *rows,
                          const int32_t *counts, int32_t max_frames) {
    if (!pool || !rows || !counts || max_frames <= 0 || first_stream < 0 ||
        n_streams < 0 || first_stream + n_streams > pool->num_streams)
        return -1;
    const int32_t fl = pool->frame_length;
    int32_t total = 0;
    for (int32_t i = 0; i < n_streams; ++i) {
        int32_t c = counts[i];
        if (c <= 0) continue;
        if (c > max_frames) c = max_frames;
        const int16_t *row = rows + static_cast<int64_t>(i) * max_frames * fl;
        if (pool->rings[first_stream + i].push(
                row, static_cast<int64_t>(c) * fl) == KT_SUCCESS)
            total += c;
    }
    return total;
}

int32_t kt_pool_push_rows_f32(kt_pool_t *pool, int32_t first_stream,
                              int32_t n_streams, const float *rows,
                              const int32_t *counts, int32_t max_frames) {
    if (!pool || !rows || !counts || max_frames <= 0 || first_stream < 0 ||
        n_streams < 0 || first_stream + n_streams > pool->num_streams)
        return -1;
    const int32_t fl = pool->frame_length;
    int32_t total = 0;
    for (int32_t i = 0; i < n_streams; ++i) {
        int32_t c = counts[i];
        if (c <= 0) continue;
        if (c > max_frames) c = max_frames;
        const float *row = rows + static_cast<int64_t>(i) * max_frames * fl;
        if (pool->rings[first_stream + i].push_f32(
                row, static_cast<int64_t>(c) * fl) == KT_SUCCESS)
            total += c;
    }
    return total;
}

int32_t kt_pool_pull(kt_pool_t *pool, int32_t stream, int16_t *out,
                     int32_t max_samples) {
    if (!pool || stream < 0 || stream >= pool->num_streams || !out ||
        max_samples < 0)
        return -1;
    int64_t n = pool->rings[stream].readable();
    if (n > max_samples) n = max_samples;
    if (n > 0) pool->rings[stream].pop(out, n);
    return static_cast<int32_t>(n);
}

void kt_pool_reset_stream(kt_pool_t *pool, int32_t stream) {
    if (!pool || stream < 0 || stream >= pool->num_streams) return;
    pool->rings[stream].clear();
}

int64_t kt_pool_dropped_samples(const kt_pool_t *pool) {
    if (!pool) return 0;
    int64_t total = 0;
    for (int32_t i = 0; i < pool->num_streams; ++i)
        total += pool->rings[i].dropped.load(std::memory_order_relaxed);
    return total;
}

void kt_pcm_to_f32(const int16_t *in, float *out, int64_t n) {
    constexpr float kScale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kScale;
}

void kt_f32_to_pcm(const float *in, int16_t *out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = std::nearbyint(in[i] * 32768.0f);
        if (v > 32767.0f) v = 32767.0f;
        if (v < -32768.0f) v = -32768.0f;
        out[i] = static_cast<int16_t>(v);
    }
}

float kt_rms(const int16_t *pcm, int64_t n) {
    if (n <= 0) return 0.0f;
    double acc = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double v = pcm[i] / 32768.0;
        acc += v * v;
    }
    return static_cast<float>(std::sqrt(acc / n));
}

float kt_peak(const int16_t *pcm, int64_t n) {
    int32_t peak = 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t v = pcm[i] < 0 ? -static_cast<int32_t>(pcm[i]) : pcm[i];
        if (v > peak) peak = v;
    }
    return peak / 32768.0f;
}

const char *kt_host_version(void) { return "3.0.0-tpu.1"; }

}  // extern "C"
