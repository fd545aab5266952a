// clipstore: mmap-backed packed clip dataset with threaded batch gather.
//
// The reference feeds training from a directory of per-clip Python pickles
// decoded by 12 worker processes (train.py:219-240). On TPU hosts that
// Python decode path is the bottleneck; this native store packs all clips
// into one flat f32 file, maps it read-only, and serves batch gathers with
// a pool of memcpy threads — zero deserialization, zero Python in the hot
// loop. Exposed to Python via ctypes (motionbert_tpu/data/clipstore.py);
// the writer is tools/pack_clips.py.
//
// File layout (little-endian):
//   magic   "MBCS"            4 bytes
//   version u32               (=1)
//   n_clips u64
//   has_input u32             (0: labels only, input synthesized on the fly)
//   T, J, C u32 each
//   pad to 64 bytes
//   input  [n_clips * T * J * C] f32   (present iff has_input)
//   label  [n_clips * T * J * C] f32

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x5343424d;  // "MBCS"
constexpr size_t kHeaderBytes = 64;

struct Header {
  uint32_t magic;
  uint32_t version;
  uint64_t n_clips;
  uint32_t has_input;
  uint32_t T, J, C;
};

// A tiny persistent thread pool: gathers are bursty and frequent, so
// per-call thread spawning would dominate.
class ThreadPool {
 public:
  explicit ThreadPool(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.back());
            jobs_.pop_back();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void run(std::vector<std::function<void()>> jobs) {
    // Completion state lives on the heap and is captured by value: a
    // stack-local mutex/condvar would race with the last worker, which can
    // decrement the counter, lose the CPU, and touch the (already
    // destroyed) synchronization objects after run() returned.
    struct Done {
      std::mutex mu;
      std::condition_variable cv;
      size_t remaining;
    };
    auto done = std::make_shared<Done>();
    done->remaining = jobs.size();
    {
      std::lock_guard<std::mutex> lk(mu_);
      for (auto& j : jobs) {
        jobs_.emplace_back([done, job = std::move(j)] {
          job();
          std::lock_guard<std::mutex> dlk(done->mu);
          if (--done->remaining == 0) done->cv.notify_one();
        });
      }
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(done->mu);
    done->cv.wait(lk, [&] { return done->remaining == 0; });
  }

 private:
  std::vector<std::thread> workers_;
  std::vector<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t mapped_bytes = 0;
  Header hdr{};
  size_t clip_floats = 0;   // T*J*C
  const float* input = nullptr;
  const float* label = nullptr;
  ThreadPool* pool = nullptr;
};

}  // namespace

extern "C" {

void* mbcs_open(const char* path, int n_threads) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* s = new Store();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(base);
  s->mapped_bytes = st.st_size;
  std::memcpy(&s->hdr, s->base, sizeof(Header));
  if (s->hdr.magic != kMagic || s->hdr.version != 1) {
    munmap(base, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  s->clip_floats =
      size_t(s->hdr.T) * s->hdr.J * s->hdr.C;
  const float* data =
      reinterpret_cast<const float*>(s->base + kHeaderBytes);
  if (s->hdr.has_input) {
    s->input = data;
    s->label = data + s->hdr.n_clips * s->clip_floats;
  } else {
    s->input = nullptr;
    s->label = data;
  }
  // sanity: file must hold everything it claims (division form — the
  // multiplicative check can overflow size_t on a corrupt header and
  // accept out-of-mapping indices)
  const size_t streams = 1 + (s->hdr.has_input ? 1 : 0);
  const size_t clip_bytes = s->clip_floats * sizeof(float);
  bool ok = s->mapped_bytes >= kHeaderBytes && clip_bytes > 0 &&
            (s->mapped_bytes - kHeaderBytes) / clip_bytes / streams >=
                s->hdr.n_clips;
  if (!ok) {
    munmap(base, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  s->pool = new ThreadPool(n_threads > 0 ? n_threads : 4);
  return s;
}

void mbcs_info(void* handle, uint64_t* n_clips, uint32_t* T, uint32_t* J,
               uint32_t* C, uint32_t* has_input) {
  auto* s = static_cast<Store*>(handle);
  *n_clips = s->hdr.n_clips;
  *T = s->hdr.T;
  *J = s->hdr.J;
  *C = s->hdr.C;
  *has_input = s->hdr.has_input;
}

// Gather `n` clips by index into contiguous output buffers. out_input may be
// null when the store has no input stream. Returns 0 on success.
int mbcs_gather(void* handle, const int64_t* indices, int64_t n,
                float* out_input, float* out_label) {
  auto* s = static_cast<Store*>(handle);
  const size_t cf = s->clip_floats;
  for (int64_t i = 0; i < n; ++i) {
    if (indices[i] < 0 ||
        static_cast<uint64_t>(indices[i]) >= s->hdr.n_clips) {
      return -1;
    }
  }
  // one job per contiguous output chunk; memcpy saturates memory bandwidth
  // with a handful of threads
  const int64_t chunk = (n + 7) / 8;
  std::vector<std::function<void()>> jobs;
  for (int64_t st = 0; st < n; st += chunk) {
    int64_t en = std::min(st + chunk, n);
    jobs.emplace_back([=] {
      for (int64_t i = st; i < en; ++i) {
        const size_t src = size_t(indices[i]) * cf;
        if (out_input && s->input) {
          std::memcpy(out_input + i * cf, s->input + src,
                      cf * sizeof(float));
        }
        std::memcpy(out_label + i * cf, s->label + src, cf * sizeof(float));
      }
    });
  }
  s->pool->run(std::move(jobs));
  return 0;
}

void mbcs_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  delete s->pool;
  munmap(const_cast<uint8_t*>(s->base), s->mapped_bytes);
  ::close(s->fd);
  delete s;
}

}  // extern "C"
