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
#include <cmath>
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
#include <string>
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

// ---------------------------------------------------------------------------
// Robot-side deployment policy: the native twin of the reference's NumPy
// deployment runtime (CustomerLstmNN.predict, CustomerLstmNN.py:96-134 —
// the code that actually runs on the BlackPanther's onboard computer at
// 500 Hz). Loads a bp5 CSV export (lstm_w{x,h}{0,1}/lstm_b{0,1}/pi_{w,b}),
// keeps the stacked-LSTM recurrent state internally, and produces the
// clipped deterministic action. Dependency-free C ABI so the control loop
// needs neither Python nor JAX on the robot; ~26k MACs per step runs in
// single-digit microseconds on any embedded CPU.
// Gate order matches CustomerLstmNN/models/lstm.py: [i | f | o | c~],
// c' = sig(f)*c + sig(i)*tanh(c~), h' = sig(o)*tanh(c').
// ---------------------------------------------------------------------------
struct IrrlPolicy {
  int obs_dim = 0, act_dim = 0;
  int n[2] = {0, 0};                      // LSTM layer widths
  std::vector<float> wx[2], wh[2], b[2];  // (in,4n) row-major / (n,4n) / (4n)
  std::vector<float> pi_w, pi_b;          // (n1,act) / (act)
  std::vector<float> h[2], c[2];          // recurrent state
  std::vector<float> g;                   // gate scratch (max 4n)
};

static bool irrl_load_mat(const std::string& path, std::vector<float>& out,
                          long* rows, long* cols) {
  long n = irrl_table_load(path.c_str(), nullptr, 0, rows, cols);
  if (n <= 0) return false;
  out.resize(static_cast<size_t>(n));
  return irrl_table_load(path.c_str(), out.data(), n, rows, cols) == n;
}

// Loads a bp5-format CSV directory; returns nullptr if any file is missing
// or the shapes are inconsistent.
void* irrl_policy_create(const char* dir) {
  auto* p = new IrrlPolicy();
  std::string d(dir);
  long r = 0, cN = 0;
  bool ok = true;
  for (int i = 0; i < 2 && ok; ++i) {
    char idx = static_cast<char>('0' + i);
    ok = irrl_load_mat(d + "/lstm_wx" + idx + ".csv", p->wx[i], &r, &cN);
    if (!ok) break;
    if (i == 0) p->obs_dim = static_cast<int>(r);
    p->n[i] = static_cast<int>(cN / 4);
    ok = irrl_load_mat(d + "/lstm_wh" + idx + ".csv", p->wh[i], &r, &cN) &&
         r == p->n[i] && cN == 4L * p->n[i];
    if (!ok) break;
    ok = irrl_load_mat(d + "/lstm_b" + idx + ".csv", p->b[i], &r, &cN) &&
         static_cast<long>(p->b[i].size()) == 4L * p->n[i];
  }
  ok = ok && irrl_load_mat(d + "/pi_w.csv", p->pi_w, &r, &cN) && r == p->n[1];
  if (ok) p->act_dim = static_cast<int>(cN);
  ok = ok && irrl_load_mat(d + "/pi_b.csv", p->pi_b, &r, &cN) &&
       static_cast<long>(p->pi_b.size()) == p->act_dim;
  // layer-1 input must be layer-0's hidden state
  ok = ok && static_cast<long>(p->wx[1].size()) == 4L * p->n[0] * p->n[1];
  if (!ok) { delete p; return nullptr; }
  for (int i = 0; i < 2; ++i) {
    p->h[i].assign(p->n[i], 0.0f);
    p->c[i].assign(p->n[i], 0.0f);
  }
  p->g.resize(4 * std::max(p->n[0], p->n[1]));
  return p;
}

int irrl_policy_obs_dim(void* h) { return static_cast<IrrlPolicy*>(h)->obs_dim; }
int irrl_policy_act_dim(void* h) { return static_cast<IrrlPolicy*>(h)->act_dim; }

// Zero the recurrent state (episode boundary / robot power-on).
void irrl_policy_reset(void* hp) {
  auto* p = static_cast<IrrlPolicy*>(hp);
  for (int i = 0; i < 2; ++i) {
    std::fill(p->h[i].begin(), p->h[i].end(), 0.0f);
    std::fill(p->c[i].begin(), p->c[i].end(), 0.0f);
  }
}

// Expose the recurrent state for checkpointing a live control session:
// out must hold 2*(n0+n1) floats, layout [c0|h0|c1|h1] (matches
// models/lstm.state_size's per-layer [c|h] packing).
long irrl_policy_state(void* hp, float* out) {
  auto* p = static_cast<IrrlPolicy*>(hp);
  if (out == nullptr) return 2L * (p->n[0] + p->n[1]);
  long k = 0;
  for (int i = 0; i < 2; ++i) {
    std::memcpy(out + k, p->c[i].data(), p->n[i] * sizeof(float)); k += p->n[i];
    std::memcpy(out + k, p->h[i].data(), p->n[i] * sizeof(float)); k += p->n[i];
  }
  return k;
}

static inline float irrl_sig(float x) { return 1.0f / (1.0f + std::exp(-x)); }

// One 500 Hz control step: obs (obs_dim, already normalized like
// CustomerLstmNN's caller does) -> act (act_dim, clipped to [-1, 1]).
// Updates the internal recurrent state.
void irrl_policy_act(void* hp, const float* obs, float* act) {
  auto* p = static_cast<IrrlPolicy*>(hp);
  const float* x = obs;
  int in_dim = p->obs_dim;
  for (int l = 0; l < 2; ++l) {
    const int n = p->n[l], n4 = 4 * n;
    float* g = p->g.data();
    std::memcpy(g, p->b[l].data(), n4 * sizeof(float));
    const float* wx = p->wx[l].data();
    for (int k = 0; k < in_dim; ++k) {
      const float xk = x[k];
      if (xk == 0.0f) continue;
      const float* row = wx + static_cast<size_t>(k) * n4;
      for (int j = 0; j < n4; ++j) g[j] += xk * row[j];
    }
    const float* wh = p->wh[l].data();
    for (int k = 0; k < n; ++k) {
      const float hk = p->h[l][k];
      if (hk == 0.0f) continue;
      const float* row = wh + static_cast<size_t>(k) * n4;
      for (int j = 0; j < n4; ++j) g[j] += hk * row[j];
    }
    for (int j = 0; j < n; ++j) {
      const float ig = irrl_sig(g[j]);
      const float fg = irrl_sig(g[n + j]);
      const float og = irrl_sig(g[2 * n + j]);
      const float cg = std::tanh(g[3 * n + j]);
      p->c[l][j] = fg * p->c[l][j] + ig * cg;
      p->h[l][j] = og * std::tanh(p->c[l][j]);
    }
    x = p->h[l].data();
    in_dim = n;
  }
  const int n1 = p->n[1], a = p->act_dim;
  for (int j = 0; j < a; ++j) act[j] = p->pi_b[j];
  const float* pw = p->pi_w.data();
  for (int k = 0; k < n1; ++k) {
    const float hk = p->h[1][k];
    const float* row = pw + static_cast<size_t>(k) * a;
    for (int j = 0; j < a; ++j) act[j] += hk * row[j];
  }
  for (int j = 0; j < a; ++j)
    act[j] = std::min(1.0f, std::max(-1.0f, act[j]));
}

void irrl_policy_destroy(void* hp) { delete static_cast<IrrlPolicy*>(hp); }

}  // extern "C"
