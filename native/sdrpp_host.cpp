// sdrpp_tpu native host runtime.
//
// The reference's runtime layer is C++ (stream/ring buffers in
// core/src/dsp/buffer/*, the VOLK type-convert hot loops in
// compression/sample_stream_compressor.h and file_source's per-format
// conversion loops, main.cpp:294-436). The TPU build keeps the device
// compute in XLA but the host-side runtime — the ingest ring between
// IO threads and device steps, the wire codec feeding the network path,
// and streaming WAV decode — lives here, compiled -O3 -march=native so the
// conversion loops auto-vectorize. Exposed with a plain C ABI for ctypes.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <cstdio>

extern "C" {

// ---------------------------------------------------------------------------
// SPSC ring buffer of complex64 samples (8 bytes each).
// Replaces dsp::RingBuffer / SampleFrameBuffer (buffer/ring_buffer.h:10-238,
// frame_buffer.h:10-133): decouples a producer IO thread from the consumer
// feeding device steps. Lock-free single-producer single-consumer.
// ---------------------------------------------------------------------------

struct RingBuffer {
    float* data;           // interleaved I/Q
    size_t capacity;       // in samples
    std::atomic<size_t> head;  // write index (samples)
    std::atomic<size_t> tail;  // read index (samples)
};

RingBuffer* ring_create(size_t capacity_samples) {
    RingBuffer* rb = new RingBuffer();
    rb->data = (float*)std::malloc(capacity_samples * 2 * sizeof(float));
    rb->capacity = capacity_samples;
    rb->head.store(0);
    rb->tail.store(0);
    return rb;
}

void ring_destroy(RingBuffer* rb) {
    std::free(rb->data);
    delete rb;
}

size_t ring_available(RingBuffer* rb) {  // samples readable
    return rb->head.load(std::memory_order_acquire) -
           rb->tail.load(std::memory_order_relaxed);
}

size_t ring_space(RingBuffer* rb) {  // samples writable
    return rb->capacity - (rb->head.load(std::memory_order_relaxed) -
                           rb->tail.load(std::memory_order_acquire));
}

// Write up to n samples; returns number written (non-blocking).
size_t ring_write(RingBuffer* rb, const float* iq, size_t n) {
    size_t space = ring_space(rb);
    if (n > space) n = space;
    size_t head = rb->head.load(std::memory_order_relaxed);
    for (size_t i = 0; i < n; i++) {
        size_t idx = (head + i) % rb->capacity;
        rb->data[2 * idx] = iq[2 * i];
        rb->data[2 * idx + 1] = iq[2 * i + 1];
    }
    rb->head.store(head + n, std::memory_order_release);
    return n;
}

// Read up to n samples; returns number read (non-blocking).
size_t ring_read(RingBuffer* rb, float* iq, size_t n) {
    size_t avail = ring_available(rb);
    if (n > avail) n = avail;
    size_t tail = rb->tail.load(std::memory_order_relaxed);
    for (size_t i = 0; i < n; i++) {
        size_t idx = (tail + i) % rb->capacity;
        iq[2 * i] = rb->data[2 * idx];
        iq[2 * i + 1] = rb->data[2 * idx + 1];
    }
    rb->tail.store(tail + n, std::memory_order_release);
    return n;
}

// ---------------------------------------------------------------------------
// Wire codec: float <-> i8/i16 with block-max scaler (the server wire
// format, sample_stream_compressor.h:26-60). count = number of FLOATS
// (2x samples). Returns the scaler used. Signed-max semantics preserved.
// ---------------------------------------------------------------------------

float wire_quantize_i8(const float* in, int8_t* out, size_t count) {
    float maxv = in[0];
    for (size_t i = 1; i < count; i++) maxv = in[i] > maxv ? in[i] : maxv;
    const float scale = 128.0f / maxv;
    for (size_t i = 0; i < count; i++) {
        float v = std::nearbyintf(in[i] * scale);
        v = v > 127.f ? 127.f : (v < -128.f ? -128.f : v);
        out[i] = (int8_t)v;
    }
    return maxv;
}

float wire_quantize_i16(const float* in, int16_t* out, size_t count) {
    float maxv = in[0];
    for (size_t i = 1; i < count; i++) maxv = in[i] > maxv ? in[i] : maxv;
    const float scale = 32768.0f / maxv;
    for (size_t i = 0; i < count; i++) {
        float v = std::nearbyintf(in[i] * scale);
        v = v > 32767.f ? 32767.f : (v < -32768.f ? -32768.f : v);
        out[i] = (int16_t)v;
    }
    return maxv;
}

void wire_dequantize_i8(const int8_t* in, float* out, size_t count, float scaler) {
    const float scale = scaler / 128.0f;
    for (size_t i = 0; i < count; i++) out[i] = in[i] * scale;
}

void wire_dequantize_i16(const int16_t* in, float* out, size_t count, float scaler) {
    const float scale = scaler / 32768.0f;
    for (size_t i = 0; i < count; i++) out[i] = in[i] * scale;
}

// ---------------------------------------------------------------------------
// WAV sample-format conversion loops (file_source main.cpp:294-436):
// interleaved PCM -> split/interleaved float IQ. count = frames; stereo
// input has 2*count values. Mono duplicates I into Q.
// ---------------------------------------------------------------------------

void conv_pcm8_iq(const uint8_t* in, float* iq, size_t frames, int channels) {
    const float s = 1.0f / 128.0f;
    if (channels >= 2) {
        for (size_t i = 0; i < frames; i++) {
            iq[2 * i] = ((float)in[channels * i] - 128.0f) * s;
            iq[2 * i + 1] = ((float)in[channels * i + 1] - 128.0f) * s;
        }
    } else {
        for (size_t i = 0; i < frames; i++) {
            float v = ((float)in[i] - 128.0f) * s;
            iq[2 * i] = v;
            iq[2 * i + 1] = v;
        }
    }
}

void conv_pcm16_iq(const int16_t* in, float* iq, size_t frames, int channels) {
    const float s = 1.0f / 32768.0f;
    if (channels >= 2) {
        for (size_t i = 0; i < frames; i++) {
            iq[2 * i] = in[channels * i] * s;
            iq[2 * i + 1] = in[channels * i + 1] * s;
        }
    } else {
        for (size_t i = 0; i < frames; i++) {
            float v = in[i] * s;
            iq[2 * i] = v;
            iq[2 * i + 1] = v;
        }
    }
}

void conv_pcm24_iq(const uint8_t* in, float* iq, size_t frames, int channels) {
    const float s = 1.0f / 8388608.0f;
    for (size_t i = 0; i < frames; i++) {
        for (int c = 0; c < 2; c++) {
            int cc = channels >= 2 ? c : 0;
            const uint8_t* p = in + 3 * (channels * i + cc);
            int32_t v = (int32_t)p[0] | ((int32_t)p[1] << 8) | ((int32_t)p[2] << 16);
            if (v & 0x800000) v -= 0x1000000;
            iq[2 * i + c] = v * s;
        }
    }
}

void conv_pcm32_iq(const int32_t* in, float* iq, size_t frames, int channels) {
    const float s = 1.0f / 2147483648.0f;
    if (channels >= 2) {
        for (size_t i = 0; i < frames; i++) {
            iq[2 * i] = in[channels * i] * s;
            iq[2 * i + 1] = in[channels * i + 1] * s;
        }
    } else {
        for (size_t i = 0; i < frames; i++) {
            float v = in[i] * s;
            iq[2 * i] = v;
            iq[2 * i + 1] = v;
        }
    }
}

void conv_f32_iq(const float* in, float* iq, size_t frames, int channels) {
    if (channels >= 2) {
        for (size_t i = 0; i < frames; i++) {
            iq[2 * i] = in[channels * i];
            iq[2 * i + 1] = in[channels * i + 1];
        }
    } else {
        for (size_t i = 0; i < frames; i++) {
            iq[2 * i] = in[i];
            iq[2 * i + 1] = in[i];
        }
    }
}

void conv_f64_iq(const double* in, float* iq, size_t frames, int channels) {
    if (channels >= 2) {
        for (size_t i = 0; i < frames; i++) {
            iq[2 * i] = (float)in[channels * i];
            iq[2 * i + 1] = (float)in[channels * i + 1];
        }
    } else {
        for (size_t i = 0; i < frames; i++) {
            float v = (float)in[i];
            iq[2 * i] = v;
            iq[2 * i + 1] = v;
        }
    }
}

}  // extern "C"
