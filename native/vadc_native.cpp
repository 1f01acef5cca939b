// vadc_tpu native runtime kernels.
//
// The TPU owns the model math; these are the host-side hot paths of the
// serving runtime, kept native for throughput and GIL-freedom (the role the
// reference's hand-written C host code plays — ingest conversion and the
// segmentation state machine; reference vadc.c:873-901 and 165-221):
//
//   * s16le <-> f32 PCM conversion (feeds every stream at 16 kHz x N streams)
//   * the batched hysteresis segmentation FSM over probability matrices
//     (one pass over [B, T] with per-stream int32 state, no Python loop)
//
// Exposed as a plain C ABI for ctypes. Build: `make -C native`.

#include <cstdint>
#include <cstddef>

extern "C" {

// s16le -> f32 by /32768 (the reference ingest scaling, vadc.c:894-901).
void vadc_s16le_to_f32(const int16_t* in, float* out, int64_t n) {
    constexpr float kScale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) {
        out[i] = static_cast<float>(in[i]) * kScale;
    }
}

// f32 -> s16le with clipping.
void vadc_f32_to_s16le(const float* in, int16_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i] * 32768.0f;
        if (v > 32767.0f) v = 32767.0f;
        if (v < -32768.0f) v = -32768.0f;
        out[i] = static_cast<int16_t>(v);
    }
}

// Convert and frame one stream's s16le bytes into rows of a [rows, chunk]
// f32 matrix, zero-padding the tail. Returns the number of rows written.
int64_t vadc_frame_s16le(const int16_t* in, int64_t n_samples,
                         float* out, int64_t chunk_samples, int64_t max_rows) {
    constexpr float kScale = 1.0f / 32768.0f;
    int64_t rows = (n_samples + chunk_samples - 1) / chunk_samples;
    if (rows > max_rows) rows = max_rows;
    for (int64_t r = 0; r < rows; ++r) {
        float* dst = out + r * chunk_samples;
        const int64_t base = r * chunk_samples;
        int64_t valid = n_samples - base;
        if (valid > chunk_samples) valid = chunk_samples;
        for (int64_t i = 0; i < valid; ++i) {
            dst[i] = static_cast<float>(in[base + i]) * kScale;
        }
        for (int64_t i = valid; i < chunk_samples; ++i) {
            dst[i] = 0.0f;
        }
    }
    return rows;
}

// Batched hysteresis segmentation FSM (semantics of reference
// feed_probability, vadc.c:165-221), advancing B streams over T chunks.
//
// probs: [B, T] row-major. Per-stream state arrays (int32, caller-owned,
// zero-initialized for fresh streams): triggered, speech_start, temp_end,
// chunk_index (each stream's own global chunk counter — streams may be
// ragged/stalled). active (nullable): streams with active[s]==0 are
// skipped entirely (no state advance, no index advance).
//
// Closed segments are appended to the event arrays as (stream, start, end);
// returns the number of events written (capped at max_events; excess
// segments are dropped — size generously).
int64_t vadc_fsm_feed(const float* probs, int64_t b, int64_t t,
                      float threshold, float neg_threshold,
                      int32_t min_silence_chunks, int32_t min_speech_chunks,
                      int32_t* triggered, int32_t* speech_start,
                      int32_t* temp_end, int32_t* chunk_index,
                      const uint8_t* active,
                      int32_t* event_stream, int32_t* event_start,
                      int32_t* event_end, int64_t max_events) {
    int64_t n_events = 0;
    for (int64_t s = 0; s < b; ++s) {
        if (active && !active[s]) continue;
        const float* row = probs + s * t;
        int32_t trig = triggered[s];
        int32_t start = speech_start[s];
        int32_t tend = temp_end[s];
        for (int64_t j = 0; j < t; ++j) {
            const float p = row[j];
            const int32_t idx = chunk_index[s] + static_cast<int32_t>(j);
            if (p >= threshold && tend > 0) {
                tend = 0;
            }
            if (!trig) {
                if (p >= threshold) {
                    trig = 1;
                    start = idx;
                }
            } else if (p < neg_threshold) {
                if (tend == 0) {
                    tend = idx;
                }
                if (idx - tend >= min_silence_chunks) {
                    if (tend - start >= min_speech_chunks &&
                        n_events < max_events) {
                        event_stream[n_events] = static_cast<int32_t>(s);
                        event_start[n_events] = start;
                        event_end[n_events] = tend;
                        ++n_events;
                    }
                    start = 0;
                    tend = 0;
                    trig = 0;
                }
            }
        }
        triggered[s] = trig;
        speech_start[s] = start;
        temp_end[s] = tend;
        chunk_index[s] += static_cast<int32_t>(t);
    }
    return n_events;
}

}  // extern "C"
