// Multi-stream PCM ingest pool.
//
// The serving runtime's data loader: N live PCM sources (pipes, sockets,
// files) are drained by one background thread (poll + non-blocking reads),
// converted s16le -> f32 and framed into per-stream chunk ring buffers,
// GIL-free. The engine thread calls vadc_pool_gather() to collect one chunk
// per ready stream into a batch matrix for the next device step.
//
// This is the TPU-serving generalization of the reference's single
// Buffered_Stream (vadc.c:401-667): same full-chunk framing and EOF
// zero-drain discipline, but for hundreds of concurrent streams.
//
// Plain C ABI for ctypes. Build: `make -C native`.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <poll.h>
#include <thread>
#include <unistd.h>
#include <vector>
#include <fcntl.h>
#include <errno.h>

namespace {

constexpr float kScale = 1.0f / 32768.0f;

struct Stream {
    int fd = -1;
    std::atomic<bool> eof{false};
    bool drained = false;  // eof observed AND partial tail flushed (engine thread only)
    // staging: raw bytes of an incomplete sample pair + incomplete chunk
    int16_t sample_stage[1];
    // incomplete chunk under construction (f32)
    std::vector<float> partial;
    uint8_t byte_stage = 0;
    bool has_byte = false;
    // ring of completed chunks
    std::vector<float> ring;  // ring_chunks * chunk_samples
    std::atomic<int64_t> head{0};  // written chunks
    std::atomic<int64_t> tail{0};  // consumed chunks
};

}  // namespace

struct VadcPool {
    int n_streams;
    int chunk_samples;
    int ring_chunks;
    std::vector<Stream> streams;
    std::thread reader;
    std::atomic<bool> running{false};
    std::mutex fd_mutex;
};

extern "C" {

VadcPool* vadc_pool_create(int n_streams, int chunk_samples, int ring_chunks) {
    auto* pool = new VadcPool();
    pool->n_streams = n_streams;
    pool->chunk_samples = chunk_samples;
    pool->ring_chunks = ring_chunks;
    pool->streams = std::vector<Stream>(n_streams);
    for (auto& s : pool->streams) {
        s.ring.resize(static_cast<size_t>(ring_chunks) * chunk_samples);
        s.partial.reserve(chunk_samples);
    }
    return pool;
}

// (Re)assign a source to a slot. Fully resets the slot's ingest state so
// slots can be recycled across connections. Caller must ensure the slot is
// idle (previous source at EOF and drained) before reassigning.
int vadc_pool_add_fd(VadcPool* pool, int stream_idx, int fd) {
    if (stream_idx < 0 || stream_idx >= pool->n_streams) return -1;
    int flags = fcntl(fd, F_GETFL, 0);
    fcntl(fd, F_SETFL, flags | O_NONBLOCK);
    std::lock_guard<std::mutex> lock(pool->fd_mutex);
    Stream& s = pool->streams[stream_idx];
    s.partial.clear();
    s.has_byte = false;
    s.drained = false;
    s.head.store(0, std::memory_order_relaxed);
    s.tail.store(0, std::memory_order_relaxed);
    s.eof.store(false, std::memory_order_release);
    s.fd = fd;
    return 0;
}

static void pool_drain_fd(VadcPool* pool, Stream& s) {
    uint8_t buf[16384];
    for (;;) {
        // backpressure: when the ring is full, leave bytes in the kernel
        // pipe buffer instead of growing `partial` unboundedly
        if (s.head.load(std::memory_order_relaxed) -
                s.tail.load(std::memory_order_acquire) >= pool->ring_chunks) {
            return;
        }
        ssize_t n = read(s.fd, buf, sizeof(buf));
        if (n < 0) {
            if (errno == EAGAIN || errno == EWOULDBLOCK) return;
            s.eof.store(true, std::memory_order_release);
            return;
        }
        if (n == 0) {
            s.eof.store(true, std::memory_order_release);
            return;
        }
        ssize_t i = 0;
        if (s.has_byte) {  // complete the split sample
            int16_t sample =
                static_cast<int16_t>(s.byte_stage | (static_cast<uint16_t>(buf[0]) << 8));
            s.partial.push_back(sample * kScale);
            s.has_byte = false;
            i = 1;
        }
        for (; i + 1 < n; i += 2) {
            int16_t sample;
            std::memcpy(&sample, buf + i, 2);
            s.partial.push_back(sample * kScale);
        }
        if (i < n) {
            s.byte_stage = buf[n - 1];
            s.has_byte = true;
        }
        // flush completed chunks into the ring (drop oldest on overflow)
        while (static_cast<int>(s.partial.size()) >= pool->chunk_samples) {
            int64_t head = s.head.load(std::memory_order_relaxed);
            if (head - s.tail.load(std::memory_order_acquire) >= pool->ring_chunks) {
                break;  // ring full: stop reading this stream for now
            }
            float* slot =
                s.ring.data() + (head % pool->ring_chunks) * pool->chunk_samples;
            std::memcpy(slot, s.partial.data(), pool->chunk_samples * sizeof(float));
            s.partial.erase(s.partial.begin(), s.partial.begin() + pool->chunk_samples);
            s.head.store(head + 1, std::memory_order_release);
        }
    }
}

static void pool_reader_loop(VadcPool* pool) {
    std::vector<pollfd> fds;
    std::vector<int> idx;
    while (pool->running.load(std::memory_order_relaxed)) {
        fds.clear();
        idx.clear();
        {
            std::lock_guard<std::mutex> lock(pool->fd_mutex);
            for (int i = 0; i < pool->n_streams; ++i) {
                Stream& s = pool->streams[i];
                if (s.fd >= 0 && !s.eof.load(std::memory_order_acquire)) {
                    fds.push_back({s.fd, POLLIN, 0});
                    idx.push_back(i);
                }
            }
        }
        if (fds.empty()) {
            usleep(2000);
            continue;
        }
        int rc = poll(fds.data(), fds.size(), 10);
        if (rc <= 0) continue;
        for (size_t j = 0; j < fds.size(); ++j) {
            if (fds[j].revents & (POLLIN | POLLHUP | POLLERR)) {
                pool_drain_fd(pool, pool->streams[idx[j]]);
            }
        }
    }
}

int vadc_pool_start(VadcPool* pool) {
    if (pool->running.exchange(true)) return -1;
    pool->reader = std::thread(pool_reader_loop, pool);
    return 0;
}

// Pop one chunk per ready stream into out [n_streams, chunk_samples].
// ready[i]: 1 = fresh chunk, 2 = final zero-padded tail chunk, 0 = nothing.
// A stream at EOF with a partial chunk yields it zero-padded exactly once.
// Returns the number of ready streams.
int64_t vadc_pool_gather(VadcPool* pool, float* out, uint8_t* ready) {
    int64_t count = 0;
    for (int i = 0; i < pool->n_streams; ++i) {
        Stream& s = pool->streams[i];
        float* row = out + static_cast<int64_t>(i) * pool->chunk_samples;
        int64_t tail = s.tail.load(std::memory_order_relaxed);
        if (s.head.load(std::memory_order_acquire) > tail) {
            const float* slot =
                s.ring.data() + (tail % pool->ring_chunks) * pool->chunk_samples;
            std::memcpy(row, slot, pool->chunk_samples * sizeof(float));
            s.tail.store(tail + 1, std::memory_order_release);
            ready[i] = 1;
            ++count;
        } else if (s.eof.load(std::memory_order_acquire) && !s.drained &&
                   !s.partial.empty()) {
            // After EOF the reader thread never touches this stream again,
            // so the engine thread may consume `partial` directly. It can
            // hold MORE than one chunk when EOF arrived while the ring was
            // full — flush whole chunks first, zero-pad only the final tail.
            const size_t chunk = static_cast<size_t>(pool->chunk_samples);
            if (s.partial.size() >= chunk) {
                std::memcpy(row, s.partial.data(), chunk * sizeof(float));
                s.partial.erase(s.partial.begin(), s.partial.begin() + chunk);
                ready[i] = 1;
            } else {
                std::memcpy(row, s.partial.data(), s.partial.size() * sizeof(float));
                std::memset(row + s.partial.size(), 0,
                            (chunk - s.partial.size()) * sizeof(float));
                s.partial.clear();
                s.drained = true;
                ready[i] = 2;
            }
            ++count;
        } else {
            ready[i] = 0;
        }
    }
    return count;
}

// 1 when the stream has delivered everything it ever will.
int vadc_pool_stream_done(VadcPool* pool, int idx) {
    Stream& s = pool->streams[idx];
    return s.eof.load(std::memory_order_acquire) && s.partial.empty() &&
           s.head.load(std::memory_order_acquire) ==
               s.tail.load(std::memory_order_acquire);
}

void vadc_pool_destroy(VadcPool* pool) {
    pool->running.store(false);
    if (pool->reader.joinable()) pool->reader.join();
    delete pool;
}

}  // extern "C"
