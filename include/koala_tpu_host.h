/*
 * koala_tpu_host — native host-side runtime for the koala_tpu framework.
 *
 * The TPU compute path is JAX/XLA; this library is the native data plane
 * around it (the part the reference implements inside its closed binary
 * and bindings): per-stream ring buffers, a stream-pool frame assembler
 * that gathers ready frames into contiguous batches for the device step,
 * int16<->float PCM conversion, and level meters.
 *
 * Thread model: each ring buffer is single-producer single-consumer
 * (audio callback -> batcher). The pool-level gather runs on the batcher
 * thread only.
 */

#ifndef KOALA_TPU_HOST_H
#define KOALA_TPU_HOST_H

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct kt_pool kt_pool_t;

typedef enum {
    KT_SUCCESS = 0,
    KT_INVALID_ARGUMENT = 1,
    KT_OUT_OF_MEMORY = 2,
    KT_OVERFLOW = 3,     /* ring full: frames dropped */
    KT_UNDERFLOW = 4,    /* not enough buffered samples */
} kt_status_t;

/* Create a pool of `num_streams` ring buffers, each holding
 * `capacity_frames` frames of `frame_length` int16 samples. */
kt_pool_t *kt_pool_create(int32_t num_streams, int32_t frame_length,
                          int32_t capacity_frames);
void kt_pool_delete(kt_pool_t *pool);

/* Producer side: append samples to stream `stream`. Partial frames are
 * buffered. Returns KT_OVERFLOW if the ring is full (samples dropped). */
kt_status_t kt_pool_push(kt_pool_t *pool, int32_t stream,
                         const int16_t *samples, int32_t num_samples);

/* Number of complete frames buffered for `stream`. */
int32_t kt_pool_frames_ready(const kt_pool_t *pool, int32_t stream);

/* Consumer side: gather one frame from every stream that has one into
 * `batch_out` ([num_streams][frame_length] row-major; rows for streams
 * without a ready frame are zero-filled) and set active_out[i] to 1/0.
 * Returns the number of active streams. */
int32_t kt_pool_gather(kt_pool_t *pool, int16_t *batch_out,
                       uint8_t *active_out);

/* As gather, but converts to float32 at fullscale 1.0 (scale 1/32768). */
int32_t kt_pool_gather_f32(kt_pool_t *pool, float *batch_out,
                           uint8_t *active_out);

/* Backlog-draining gather: pop up to `max_frames` complete frames from
 * every stream into `batch_out` ([num_streams][max_frames][frame_length]
 * row-major; frames beyond a stream's backlog are zero-filled) and write
 * the per-stream frame count into counts_out[i]. Returns the total number
 * of frames gathered. This is the host half of the chunked device step
 * that amortizes dispatch latency over k frames per stream. */
int32_t kt_pool_gather_chunk(kt_pool_t *pool, int16_t *batch_out,
                             int32_t *counts_out, int32_t max_frames);

/* Batched producer: append counts[i] frames from rows
 * ([n_streams][max_frames][frame_length] row-major) to streams
 * first_stream+i, in ONE call — the batched host hop that lets a single
 * producer (or the serving dispatcher routing device output) move the
 * whole pool's audio without per-stream call overhead. Returns total
 * frames appended (rings that overflow drop and are excluded). */
int32_t kt_pool_push_rows(kt_pool_t *pool, int32_t first_stream,
                          int32_t n_streams, const int16_t *rows,
                          const int32_t *counts, int32_t max_frames);

/* As kt_pool_push_rows, but rows are float32 at fullscale 1.0 and are
 * converted to int16 while being written into the rings (fused
 * convert+route for device output). */
int32_t kt_pool_push_rows_f32(kt_pool_t *pool, int32_t first_stream,
                              int32_t n_streams, const float *rows,
                              const int32_t *counts, int32_t max_frames);

/* Consumer side, single stream: pop up to max_samples buffered samples
 * into `out`; returns the number popped (0 if empty, -1 on bad args). */
int32_t kt_pool_pull(kt_pool_t *pool, int32_t stream, int16_t *out,
                     int32_t max_samples);

/* Drop all buffered audio for one stream (stream reset/rebind). */
void kt_pool_reset_stream(kt_pool_t *pool, int32_t stream);

/* Totals for overflow accounting. */
int64_t kt_pool_dropped_samples(const kt_pool_t *pool);

/* PCM conversion + metering (vectorized loops). */
void kt_pcm_to_f32(const int16_t *in, float *out, int64_t n);
void kt_f32_to_pcm(const float *in, int16_t *out, int64_t n);
float kt_rms(const int16_t *pcm, int64_t n);
float kt_peak(const int16_t *pcm, int64_t n);

const char *kt_host_version(void);

#ifdef __cplusplus
}
#endif

#endif /* KOALA_TPU_HOST_H */
