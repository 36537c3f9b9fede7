// Native capture loader: pread + deinterleave + readahead.
//
// The TPU-native counterpart of the reference's Rust sample reader
// (src/samples.rs:44-94: positional pread + per-sample decode).  Numeric
// decode stays ON CHIP (quadrs_tpu.formats); this library owns the byte
// path: positional reads, interleaved->planar conversion (the device
// requires contiguous component planes; see quadrs_tpu/formats.py), and
// a double-buffered background prefetcher so disk latency overlaps
// device compute.
//
// Exposed as a plain C ABI for ctypes (no pybind dependency).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Capture {
  int fd = -1;
  int64_t file_bytes = 0;
  int type_bytes = 1;  // bytes per scalar component

  int64_t pair_bytes() const { return 2 * type_bytes; }
  int64_t samples() const { return file_bytes / pair_bytes(); }
};

// Split interleaved component pairs into two contiguous planes.
template <typename T>
void deinterleave(const T* src, T* re, T* im, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    re[i] = src[2 * i];
    im[i] = src[2 * i + 1];
  }
}

void deinterleave_any(const uint8_t* src, uint8_t* re, uint8_t* im, int64_t n,
                      int type_bytes) {
  switch (type_bytes) {
    case 1:
      deinterleave<uint8_t>(src, re, im, n);
      break;
    case 2:
      deinterleave<uint16_t>(reinterpret_cast<const uint16_t*>(src),
                             reinterpret_cast<uint16_t*>(re),
                             reinterpret_cast<uint16_t*>(im), n);
      break;
    case 4:
      deinterleave<uint32_t>(reinterpret_cast<const uint32_t*>(src),
                             reinterpret_cast<uint32_t*>(re),
                             reinterpret_cast<uint32_t*>(im), n);
      break;
  }
}

// Background readahead: a ring of chunk buffers filled by a reader
// thread, popped by the host staging loop.  Keeps the disk ahead of the
// device without Python-side threading.
struct Prefetcher {
  Capture* cap = nullptr;
  int64_t chunk_samples = 0;
  int64_t next_off = 0;  // next chunk's sample offset to read

  struct Slot {
    std::vector<uint8_t> raw, re, im;
    int64_t off = -1;
    int64_t n = 0;
    bool full = false;
  };
  std::vector<Slot> slots;
  size_t head = 0, tail = 0;  // pop from head, fill at tail
  size_t filled = 0;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread worker;
  std::atomic<bool> stop{false};

  void run() {
    while (!stop.load()) {
      std::unique_lock<std::mutex> lk(mu);
      cv_empty.wait(lk, [&] { return stop.load() || filled < slots.size(); });
      if (stop.load()) return;
      Slot& s = slots[tail];
      int64_t off = next_off;
      lk.unlock();

      int64_t want = std::min(chunk_samples, cap->samples() - off);
      int64_t got = 0;
      if (want > 0) {
        int64_t bytes = want * cap->pair_bytes();
        s.raw.resize(bytes);
        int64_t r = pread(cap->fd, s.raw.data(), bytes, off * cap->pair_bytes());
        if (r < 0) r = 0;
        got = r / cap->pair_bytes();
        s.re.resize(got * cap->type_bytes);
        s.im.resize(got * cap->type_bytes);
        deinterleave_any(s.raw.data(), s.re.data(), s.im.data(), got,
                         cap->type_bytes);
      }

      lk.lock();
      s.off = off;
      s.n = got;
      s.full = true;
      next_off = off + chunk_samples;
      tail = (tail + 1) % slots.size();
      ++filled;
      cv_full.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* qt_open(const char* path, int type_bytes) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  auto* cap = new Capture();
  cap->fd = fd;
  cap->file_bytes = st.st_size;
  cap->type_bytes = type_bytes;
  return cap;
}

int64_t qt_samples(void* h) { return static_cast<Capture*>(h)->samples(); }

// Read [off, off+n) samples as planes into caller buffers (native dtype,
// n*type_bytes each).  Returns samples read (short at EOF), -1 on error.
int64_t qt_read_planes(void* h, int64_t off, int64_t n, void* re, void* im) {
  auto* cap = static_cast<Capture*>(h);
  if (off < 0 || n < 0) return -1;
  int64_t avail = cap->samples() - off;
  if (avail <= 0) return 0;
  int64_t want = std::min(n, avail);
  int64_t bytes = want * cap->pair_bytes();
  std::vector<uint8_t> buf(bytes);
  int64_t r = pread(cap->fd, buf.data(), bytes, off * cap->pair_bytes());
  if (r < 0) return -1;
  int64_t got = r / cap->pair_bytes();
  deinterleave_any(buf.data(), static_cast<uint8_t*>(re),
                   static_cast<uint8_t*>(im), got, cap->type_bytes);
  return got;
}

void qt_close(void* h) {
  auto* cap = static_cast<Capture*>(h);
  close(cap->fd);
  delete cap;
}

void* qt_prefetch_start(void* h, int64_t chunk_samples, int n_buffers,
                        int64_t start_off) {
  auto* p = new Prefetcher();
  p->cap = static_cast<Capture*>(h);
  p->chunk_samples = chunk_samples;
  p->next_off = start_off;
  p->slots.resize(n_buffers > 1 ? n_buffers : 2);
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Pop the next prefetched chunk into caller plane buffers (each at least
// chunk_samples*type_bytes).  Returns samples delivered (0 past EOF).
int64_t qt_prefetch_next(void* ph, int64_t* off_out, void* re, void* im) {
  auto* p = static_cast<Prefetcher*>(ph);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_full.wait(lk, [&] { return p->filled > 0; });
  auto& s = p->slots[p->head];
  int64_t n = s.n;
  *off_out = s.off;
  if (n > 0) {
    std::memcpy(re, s.re.data(), n * p->cap->type_bytes);
    std::memcpy(im, s.im.data(), n * p->cap->type_bytes);
  }
  s.full = false;
  p->head = (p->head + 1) % p->slots.size();
  --p->filled;
  p->cv_empty.notify_one();
  return n;
}

void qt_prefetch_stop(void* ph) {
  auto* p = static_cast<Prefetcher*>(ph);
  p->stop.store(true);
  p->cv_empty.notify_all();
  p->cv_full.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
