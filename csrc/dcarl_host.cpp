// DCARL host runtime — native C++ support library.
//
// TPU-native counterpart of the reference's native components
// (SURVEY.md §2.6): the Cython geometry kernels
// (software/src/library/src/zzz_common/geometry.pyx), the
// libspatialindex R-tree backing the on-vehicle confidence store
// (deepq/RLS.py:61-76), and the append-only text persistence
// (visited_state.txt / visited_value.txt).  The TPU handles the batched
// hot path (Pallas kernel); this library serves the host side: dataset
// ingest/replay tooling, checkpoint import/export, and single-query
// lookups without device round-trips.
//
// C ABI, consumed from Python via ctypes (dcarl_tpu/utils/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// Geometry (geometry.pyx parity)
// ---------------------------------------------------------------------------

double dcarl_wrap_angle(double theta) {
  const double two_pi = 2.0 * M_PI;
  double w = std::fmod(theta + M_PI, two_pi);
  if (w < 0) w += two_pi;
  return w - M_PI;
}

// line: [n][2] row-major. Returns number of output points written
// (<= max_out); sizing rule num = round(total_len / resolution) matches
// dense_polyline2d (geometry.pyx:153-202).
int dcarl_dense_polyline2d(const double* line, int n, double resolution,
                           double* out, int max_out) {
  if (n < 2) return 0;
  std::vector<double> s(n, 0.0);
  for (int i = 1; i < n; ++i) {
    double dx = line[2 * i] - line[2 * (i - 1)];
    double dy = line[2 * i + 1] - line[2 * (i - 1) + 1];
    s[i] = s[i - 1] + std::sqrt(dx * dx + dy * dy);
  }
  int num = (int)std::lround(s[n - 1] / resolution);
  if (num < 2) num = 2;
  if (num > max_out) num = max_out;
  int seg = 0;
  for (int k = 0; k < num; ++k) {
    double sk = s[n - 1] * k / (num - 1);
    while (seg < n - 2 && s[seg + 1] < sk) ++seg;
    double denom = s[seg + 1] - s[seg];
    double t = denom > 0 ? (sk - s[seg]) / denom : 0.0;
    out[2 * k] = line[2 * seg] + t * (line[2 * (seg + 1)] - line[2 * seg]);
    out[2 * k + 1] =
        line[2 * seg + 1] + t * (line[2 * (seg + 1) + 1] - line[2 * seg + 1]);
  }
  return num;
}

static void seg_dists(double x0, double y0, double x1, double y1, double x2,
                      double y2, double* dl, double* d1, double* d2) {
  double l = std::hypot(x2 - x1, y2 - y1);
  if (l == 0) {
    *dl = std::hypot(x0 - x1, y0 - y1);
    *d1 = 0;
    *d2 = 0;
    return;
  }
  *dl = ((y2 - y1) * x0 - (x2 - x1) * y0 + x2 * y1 - x1 * y2) / l;
  *d1 = (x1 * x1 + x0 * (x2 - x1) - x1 * x2 + y1 * y1 + y0 * (y2 - y1) -
         y1 * y2) /
        l;
  *d2 = (x2 * x2 - x0 * (x2 - x1) - x1 * x2 + y2 * y2 - y0 * (y2 - y1) -
         y1 * y2) /
        l;
}

// result[5] = {signed_dist, closest_idx, closest_type, dist_start, dist_end}
// 8-case logic of dist_from_point_to_polyline2d (geometry.pyx:53-151).
void dcarl_project_point_to_polyline(double x0, double y0, const double* line,
                                     int n, double* result) {
  int ci = 0;
  double best = 1e300;
  for (int i = 0; i < n; ++i) {
    double d = std::hypot(line[2 * i] - x0, line[2 * i + 1] - y0);
    if (d < best) {
      best = d;
      ci = i;
    }
  }
  double dl_p = 0, d1_p = 0, d2_p = 0, dl_n = 0, d1_n = 0, d2_n = 0;
  int ctype = 0;
  double dist = best;
  if (ci == 0) {
    seg_dists(x0, y0, line[0], line[1], line[2], line[3], &dl_n, &d1_n, &d2_n);
    if (d1_n < 0) {
      dist = dl_n >= 0 ? best : -best;
    } else {
      dist = dl_n;
      ctype = 1;
    }
  } else if (ci == n - 1) {
    seg_dists(x0, y0, line[2 * (n - 2)], line[2 * (n - 2) + 1],
              line[2 * (n - 1)], line[2 * (n - 1) + 1], &dl_p, &d1_p, &d2_p);
    if (d2_p < 0) {
      dist = dl_p >= 0 ? best : -best;
    } else {
      dist = dl_p;
      ctype = -1;
    }
  } else {
    seg_dists(x0, y0, line[2 * (ci - 1)], line[2 * (ci - 1) + 1], line[2 * ci],
              line[2 * ci + 1], &dl_p, &d1_p, &d2_p);
    seg_dists(x0, y0, line[2 * ci], line[2 * ci + 1], line[2 * (ci + 1)],
              line[2 * (ci + 1) + 1], &dl_n, &d1_n, &d2_n);
    if (d2_p < 0 && d1_n < 0) {
      dist = best;
      double corner_dl, u1, u2;
      seg_dists(line[2 * (ci + 1)], line[2 * (ci + 1) + 1], line[2 * (ci - 1)],
                line[2 * (ci - 1) + 1], line[2 * ci], line[2 * ci + 1],
                &corner_dl, &u1, &u2);
      if (corner_dl > 0) dist = -dist;
    } else if (d2_p < 0) {
      dist = dl_n;
      ctype = 1;
    } else if (d1_n < 0) {
      dist = dl_p;
      ctype = -1;
    } else if (std::fabs(dl_n) > std::fabs(dl_p)) {
      dist = dl_p;
      ctype = -1;
    } else {
      dist = dl_n;
      ctype = 1;
    }
  }
  std::vector<double> cum(n, 0.0);
  for (int i = 1; i < n; ++i)
    cum[i] = cum[i - 1] + std::hypot(line[2 * i] - line[2 * (i - 1)],
                                     line[2 * i + 1] - line[2 * (i - 1) + 1]);
  double total = cum[n - 1], ds, de;
  if (ctype == 1) {
    ds = d1_n + cum[ci];
    de = d2_n + total - cum[ci + 1];
  } else if (ctype == -1) {
    ds = d1_p + cum[ci - 1];
    de = d2_p + total - cum[ci];
  } else {
    ds = cum[ci];
    de = total - cum[ci];
  }
  result[0] = dist;
  result[1] = ci;
  result[2] = ctype;
  result[3] = ds;
  result[4] = de;
}

// ---------------------------------------------------------------------------
// Box store: grid-hashed spatial index (R-tree replacement, host side)
// ---------------------------------------------------------------------------
//
// Stored entries are boxes key +- half_width (uniform widths, like
// RLS.visited_state_dist).  A query point matches entries with
// |key_d - q_d| <= w_d for all d.  Index: uniform grid hash on the two
// most selective dimensions (smallest half-width relative to data
// spread), cell size = 2*w; a query probes the 3x3 neighborhood and
// exact-checks candidates — O(matches) instead of O(N).

struct BoxStore {
  int dim;
  std::vector<double> widths;
  std::vector<double> keys;    // [n][dim]
  std::vector<double> actions;
  std::vector<double> values;
  int g0, g1;  // grid dims
  std::unordered_multimap<uint64_t, int> grid;

  uint64_t cell(const double* key) const {
    int64_t c0 = (int64_t)std::floor(key[g0] / (2.0 * widths[g0]));
    int64_t c1 = (int64_t)std::floor(key[g1] / (2.0 * widths[g1]));
    return ((uint64_t)(uint32_t)c0 << 32) | (uint32_t)c1;
  }
  uint64_t cell_of(int64_t c0, int64_t c1) const {
    return ((uint64_t)(uint32_t)c0 << 32) | (uint32_t)c1;
  }
};

void* dcarl_boxstore_new(int dim, const double* half_widths) {
  BoxStore* s = new BoxStore();
  s->dim = dim;
  s->widths.assign(half_widths, half_widths + dim);
  // pick the two smallest half-width dims as grid axes
  int a = 0, b = 1;
  for (int i = 0; i < dim; ++i) {
    if (s->widths[i] < s->widths[a]) a = i;
  }
  b = (a == 0) ? 1 : 0;
  for (int i = 0; i < dim; ++i) {
    if (i != a && s->widths[i] < s->widths[b]) b = i;
  }
  s->g0 = a;
  s->g1 = b;
  return s;
}

void dcarl_boxstore_free(void* h) { delete (BoxStore*)h; }

int dcarl_boxstore_insert(void* h, const double* key, double action,
                          double value) {
  BoxStore* s = (BoxStore*)h;
  int id = (int)(s->keys.size() / s->dim);
  s->keys.insert(s->keys.end(), key, key + s->dim);
  s->actions.push_back(action);
  s->values.push_back(value);
  s->grid.emplace(s->cell(key), id);
  return id;
}

int dcarl_boxstore_size(void* h) {
  BoxStore* s = (BoxStore*)h;
  return (int)s->actions.size();
}

// out3 = {count, mean, var}; count 0 -> mean/var = -1 (RLS sentinel).
void dcarl_boxstore_query(void* h, const double* q, double* out3) {
  BoxStore* s = (BoxStore*)h;
  int64_t q0 = (int64_t)std::floor(q[s->g0] / (2.0 * s->widths[s->g0]));
  int64_t q1 = (int64_t)std::floor(q[s->g1] / (2.0 * s->widths[s->g1]));
  double cnt = 0, sum = 0, sumsq = 0;
  for (int64_t a = q0 - 1; a <= q0 + 1; ++a) {
    for (int64_t b = q1 - 1; b <= q1 + 1; ++b) {
      auto range = s->grid.equal_range(s->cell_of(a, b));
      for (auto it = range.first; it != range.second; ++it) {
        const double* key = &s->keys[(size_t)it->second * s->dim];
        bool inside = true;
        for (int d = 0; d < s->dim; ++d) {
          if (std::fabs(key[d] - q[d]) > s->widths[d]) {
            inside = false;
            break;
          }
        }
        if (inside) {
          double v = s->values[it->second];
          cnt += 1;
          sum += v;
          sumsq += v * v;
        }
      }
    }
  }
  if (cnt == 0) {
    out3[0] = 0;
    out3[1] = -1;
    out3[2] = -1;
  } else {
    double mean = sum / cnt;
    double var = sumsq / cnt - mean * mean;
    out3[0] = cnt;
    out3[1] = mean;
    out3[2] = var < 0 ? 0 : var;
  }
}

// Bulk exact scan (oracle / no-index path), also used for testing.
void dcarl_boxstore_query_bruteforce(void* h, const double* q, double* out3) {
  BoxStore* s = (BoxStore*)h;
  double cnt = 0, sum = 0, sumsq = 0;
  int n = (int)s->actions.size();
  for (int i = 0; i < n; ++i) {
    const double* key = &s->keys[(size_t)i * s->dim];
    bool inside = true;
    for (int d = 0; d < s->dim; ++d) {
      if (std::fabs(key[d] - q[d]) > s->widths[d]) {
        inside = false;
        break;
      }
    }
    if (inside) {
      double v = s->values[i];
      cnt += 1;
      sum += v;
      sumsq += v * v;
    }
  }
  if (cnt == 0) {
    out3[0] = 0;
    out3[1] = -1;
    out3[2] = -1;
  } else {
    double mean = sum / cnt;
    double var = sumsq / cnt - mean * mean;
    out3[0] = cnt;
    out3[1] = mean;
    out3[2] = var < 0 ? 0 : var;
  }
}

int dcarl_boxstore_save(void* h, const char* path) {
  BoxStore* s = (BoxStore*)h;
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int n = (int)s->actions.size();
  std::fwrite(&s->dim, sizeof(int), 1, f);
  std::fwrite(&n, sizeof(int), 1, f);
  std::fwrite(s->widths.data(), sizeof(double), s->dim, f);
  std::fwrite(s->keys.data(), sizeof(double), (size_t)n * s->dim, f);
  std::fwrite(s->actions.data(), sizeof(double), n, f);
  std::fwrite(s->values.data(), sizeof(double), n, f);
  std::fclose(f);
  return 0;
}

void* dcarl_boxstore_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  int dim = 0, n = 0;
  if (std::fread(&dim, sizeof(int), 1, f) != 1 ||
      std::fread(&n, sizeof(int), 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  std::vector<double> widths(dim);
  if (std::fread(widths.data(), sizeof(double), dim, f) != (size_t)dim) {
    std::fclose(f);
    return nullptr;
  }
  BoxStore* s = (BoxStore*)dcarl_boxstore_new(dim, widths.data());
  std::vector<double> key(dim);
  std::vector<double> keys((size_t)n * dim), actions(n), values(n);
  bool ok = std::fread(keys.data(), sizeof(double), keys.size(), f) ==
                keys.size() &&
            std::fread(actions.data(), sizeof(double), n, f) == (size_t)n &&
            std::fread(values.data(), sizeof(double), n, f) == (size_t)n;
  std::fclose(f);
  if (!ok) {
    delete s;
    return nullptr;
  }
  for (int i = 0; i < n; ++i)
    dcarl_boxstore_insert(s, &keys[(size_t)i * dim], actions[i], values[i]);
  return s;
}

// ---------------------------------------------------------------------------
// Append-only binary record log (text-log replacement)
// ---------------------------------------------------------------------------

struct RecordLog {
  FILE* f;
  int width;
};

void* dcarl_log_open(const char* path, int width) {
  FILE* f = std::fopen(path, "ab");
  if (!f) return nullptr;
  RecordLog* log = new RecordLog{f, width};
  return log;
}

void dcarl_log_append(void* h, const double* rec, int count) {
  RecordLog* log = (RecordLog*)h;
  std::fwrite(rec, sizeof(double), (size_t)count * log->width, log->f);
}

void dcarl_log_flush(void* h) { std::fflush(((RecordLog*)h)->f); }

void dcarl_log_close(void* h) {
  RecordLog* log = (RecordLog*)h;
  std::fclose(log->f);
  delete log;
}

int64_t dcarl_log_read(const char* path, int width, double* out,
                       int64_t max_records) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  int64_t n = (int64_t)std::fread(out, sizeof(double) * width,
                                  (size_t)max_records, f);
  std::fclose(f);
  return n;
}

// ---------------------------------------------------------------------------
// Async line writer: background-thread batched appends
// ---------------------------------------------------------------------------
//
// The reference appends record.txt / collected_data.txt /
// driving_record.txt synchronously inside the decision loop
// (TestScenario_Town03.py:321-343, RLS.py:217-241) — at TPU step rates
// that blocks the host thread that should be feeding the device.  This
// writer enqueues lines under a mutex and drains them to disk on a
// dedicated thread, batching bursts into single fwrite calls.

struct AsyncWriter {
  FILE* f;
  std::thread th;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<std::string> q;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> written{0};

  void run() {
    std::string batch;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !q.empty(); });
        if (q.empty() && stop.load()) break;
        batch.clear();
        int64_t n = 0;
        while (!q.empty()) {
          batch += q.front();
          q.pop_front();
          ++n;
        }
        written += n;
      }
      if (!batch.empty()) {
        std::fwrite(batch.data(), 1, batch.size(), f);
        std::fflush(f);
      }
    }
  }
};

void* dcarl_writer_open(const char* path) {
  FILE* f = std::fopen(path, "ab");
  if (!f) return nullptr;
  AsyncWriter* w = new AsyncWriter();
  w->f = f;
  w->th = std::thread([w] { w->run(); });
  return w;
}

// Enqueue one line (newline appended if missing). Never blocks on disk.
void dcarl_writer_append(void* h, const char* line, int len) {
  AsyncWriter* w = (AsyncWriter*)h;
  std::string s(line, (size_t)len);
  if (s.empty() || s.back() != '\n') s.push_back('\n');
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->q.push_back(std::move(s));
  }
  w->cv.notify_one();
}

// Block until everything enqueued so far is on disk.
void dcarl_writer_flush(void* h) {
  AsyncWriter* w = (AsyncWriter*)h;
  for (;;) {
    {
      std::lock_guard<std::mutex> lk(w->mu);
      if (w->q.empty()) break;
    }
    std::this_thread::yield();
  }
  std::fflush(w->f);
}

int64_t dcarl_writer_lines_written(void* h) {
  return ((AsyncWriter*)h)->written.load();
}

void dcarl_writer_close(void* h) {
  AsyncWriter* w = (AsyncWriter*)h;
  w->stop.store(true);
  w->cv.notify_one();
  w->th.join();
  std::fclose(w->f);
  delete w;
}

// ---------------------------------------------------------------------------
// NPY mmap loader + background prefetch stream (native data loader)
// ---------------------------------------------------------------------------
//
// The reference's datasets are .npy files streamed tuple-by-tuple in
// Python (test_DCARL.py:73).  This loader mmaps v1.x .npy files
// (C-order, little-endian numeric dtypes) for zero-copy host access,
// and the stream variant reads fixed-size row chunks ahead on a
// background thread (double-buffered) so device feeding overlaps disk.

struct NpyFile {
  int fd = -1;
  void* map = nullptr;
  size_t map_len = 0;
  const char* data = nullptr;  // first element
  int64_t shape[8] = {0};
  int ndim = 0;
  int dtype_code = 0;  // 1=f32 2=f64 3=i32 4=i64 5=u8
  int64_t itemsize = 0;
};

static int parse_npy_header(const char* buf, size_t len, NpyFile* f,
                            size_t* data_off) {
  if (len < 10 || std::memcmp(buf, "\x93NUMPY", 6) != 0) return -1;
  int major = buf[6];
  size_t hlen, off;
  if (major == 1) {
    hlen = (size_t)(uint8_t)buf[8] | ((size_t)(uint8_t)buf[9] << 8);
    off = 10;
  } else {
    uint32_t h;
    std::memcpy(&h, buf + 8, 4);
    hlen = h;
    off = 12;
  }
  if (off + hlen > len) return -1;
  std::string hdr(buf + off, hlen);
  *data_off = off + hlen;

  // dtype
  size_t dp = hdr.find("'descr'");
  if (dp == std::string::npos) return -1;
  size_t q1 = hdr.find('\'', dp + 7);
  size_t q2 = hdr.find('\'', q1 + 1);
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4") { f->dtype_code = 1; f->itemsize = 4; }
  else if (descr == "<f8") { f->dtype_code = 2; f->itemsize = 8; }
  else if (descr == "<i4") { f->dtype_code = 3; f->itemsize = 4; }
  else if (descr == "<i8") { f->dtype_code = 4; f->itemsize = 8; }
  else if (descr == "|u1") { f->dtype_code = 5; f->itemsize = 1; }
  else return -2;  // unsupported dtype

  if (hdr.find("'fortran_order': True") != std::string::npos) return -3;

  size_t sp = hdr.find("'shape'");
  if (sp == std::string::npos) return -1;
  size_t p1 = hdr.find('(', sp);
  size_t p2 = hdr.find(')', p1);
  std::string shape = hdr.substr(p1 + 1, p2 - p1 - 1);
  f->ndim = 0;
  const char* c = shape.c_str();
  while (*c && f->ndim < 8) {
    while (*c == ' ' || *c == ',') ++c;
    if (!*c) break;
    f->shape[f->ndim++] = std::strtoll(c, (char**)&c, 10);
  }
  if (f->ndim == 0) {  // scalar "()"
    f->ndim = 1;
    f->shape[0] = 1;
  }
  return 0;
}

void* dcarl_npy_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 16) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  NpyFile* f = new NpyFile();
  f->fd = fd;
  f->map = map;
  f->map_len = (size_t)st.st_size;
  size_t data_off = 0;
  if (parse_npy_header((const char*)map, f->map_len, f, &data_off) != 0) {
    munmap(map, f->map_len);
    ::close(fd);
    delete f;
    return nullptr;
  }
  f->data = (const char*)map + data_off;
  return f;
}

// shape_out: caller buffer of >= 8 int64; returns ndim (or -1).
int dcarl_npy_info(void* h, int64_t* shape_out, int* dtype_code) {
  NpyFile* f = (NpyFile*)h;
  for (int i = 0; i < f->ndim; ++i) shape_out[i] = f->shape[i];
  *dtype_code = f->dtype_code;
  return f->ndim;
}

const void* dcarl_npy_data(void* h) { return ((NpyFile*)h)->data; }

void dcarl_npy_close(void* h) {
  NpyFile* f = (NpyFile*)h;
  munmap(f->map, f->map_len);
  ::close(f->fd);
  delete f;
}

struct NpyStream {
  NpyFile* file;
  int64_t row_bytes;
  int64_t rows_total;
  int64_t chunk_rows;
  int64_t next_row = 0;   // next row the prefetcher will load
  std::thread th;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::deque<std::pair<int64_t, std::vector<char>>> ready;  // (rows, bytes)
  size_t max_ready;
  std::atomic<bool> stop{false};
  bool eof_queued = false;

  void run() {
    for (;;) {
      if (stop.load()) return;
      int64_t rows = std::min(chunk_rows, rows_total - next_row);
      std::vector<char> buf;
      if (rows > 0) {
        buf.assign(file->data + next_row * row_bytes,
                   file->data + (next_row + rows) * row_bytes);
        next_row += rows;
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_full.wait(lk, [&] { return stop.load() || ready.size() < max_ready; });
        if (stop.load()) return;
        ready.emplace_back(rows, std::move(buf));
        if (rows == 0) eof_queued = true;
      }
      cv_empty.notify_one();
      if (rows == 0) return;  // EOF sentinel queued
    }
  }
};

// chunk_rows rows per chunk, n_buffers chunks of read-ahead.
void* dcarl_stream_open(const char* path, int64_t chunk_rows, int n_buffers) {
  NpyFile* f = (NpyFile*)dcarl_npy_open(path);
  if (!f) return nullptr;
  NpyStream* s = new NpyStream();
  s->file = f;
  int64_t rb = f->itemsize;
  for (int i = 1; i < f->ndim; ++i) rb *= f->shape[i];
  s->row_bytes = rb;
  s->rows_total = f->shape[0];
  s->chunk_rows = chunk_rows;
  s->max_ready = (size_t)std::max(1, n_buffers);
  s->th = std::thread([s] { s->run(); });
  return s;
}

// Copies the next chunk into dst; returns rows copied (0 = EOF, -1 err).
int64_t dcarl_stream_next(void* h, void* dst, int64_t max_bytes) {
  NpyStream* s = (NpyStream*)h;
  std::unique_lock<std::mutex> lk(s->mu);
  s->cv_empty.wait(lk, [&] { return !s->ready.empty(); });
  auto& front = s->ready.front();
  int64_t rows = front.first;
  int64_t bytes = rows * s->row_bytes;
  if (bytes > max_bytes) return -1;
  if (rows > 0) std::memcpy(dst, front.second.data(), (size_t)bytes);
  if (rows > 0 || !s->eof_queued || s->ready.size() > 1) s->ready.pop_front();
  lk.unlock();
  s->cv_full.notify_one();
  return rows;
}

int64_t dcarl_stream_row_bytes(void* h) { return ((NpyStream*)h)->row_bytes; }
int64_t dcarl_stream_total_rows(void* h) { return ((NpyStream*)h)->rows_total; }

void dcarl_stream_close(void* h) {
  NpyStream* s = (NpyStream*)h;
  s->stop.store(true);
  s->cv_full.notify_all();
  s->th.join();
  dcarl_npy_close(s->file);
  delete s;
}

}  // extern "C"
