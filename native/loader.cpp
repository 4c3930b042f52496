// msfno_tpu native data loader.
//
// The reference feeds its trainer from xarray/zarr via torch DataLoader CPU
// worker *processes* (MSFNO/Models/train.py:513-519) — its only native IO is
// inside those dependencies.  This framework's host-side loader is native
// C++: a thread pool that reads .npy timestep files straight into one
// preallocated, page-aligned host buffer (ready for a single
// jax.device_put), avoiding per-worker pickling and buffer copies.
//
// Exposed C ABI (consumed by msfno_tpu/data/native_loader.py via ctypes):
//   msfno_npy_info(path, shape_out[8], &ndim, &word_size) -> 0 | -errno
//   msfno_load_npy_batch(paths, n, out, per_item_elems, n_threads) -> 0 | -k
//
// Only the npy v1/v2 little-endian float32/float64 C-order subset is
// supported — exactly what the framework's offline tooling writes.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

enum NpyDtype { DT_F4, DT_F8, DT_I4, DT_I8 };

struct NpyHeader {
  std::vector<int64_t> shape;
  int word_size = 0;   // bytes per element
  NpyDtype dtype = DT_F4;
  bool fortran = false;
  int64_t data_offset = 0;
};

// Parse an npy header from an open file. Returns 0 on success.
int parse_npy_header(FILE* f, NpyHeader* out) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return -1;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return -2;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return -3;
    header_len = b[0] | (b[1] << 8);
    out->data_offset = 10 + header_len;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return -3;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
    out->data_offset = 12 + header_len;
  }
  // real numpy headers are < 64 KiB; a corrupt length field must not turn
  // into a multi-GB allocation (std::bad_alloc would unwind through the
  // C ABI into ctypes and abort the process instead of returning an error)
  if (header_len == 0 || header_len > (1u << 20)) return -9;
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return -4;

  // descr
  auto dpos = header.find("'descr'");
  if (dpos == std::string::npos) return -5;
  auto q1 = header.find('\'', dpos + 7);
  auto q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4" || descr == "|f4") { out->word_size = 4; out->dtype = DT_F4; }
  else if (descr == "<f8") { out->word_size = 8; out->dtype = DT_F8; }
  else if (descr == "<i8") { out->word_size = 8; out->dtype = DT_I8; }
  else if (descr == "<i4") { out->word_size = 4; out->dtype = DT_I4; }
  else return -6;  // unsupported dtype

  // fortran_order
  out->fortran = header.find("'fortran_order': True") != std::string::npos;
  if (out->fortran) return -7;

  // shape
  auto spos = header.find("'shape'");
  if (spos == std::string::npos) return -8;
  auto p1 = header.find('(', spos);
  auto p2 = header.find(')', p1);
  std::string tup = header.substr(p1 + 1, p2 - p1 - 1);
  out->shape.clear();
  const char* s = tup.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') ++s;
    if (!*s) break;
    out->shape.push_back(strtoll(s, const_cast<char**>(&s), 10));
  }
  return 0;
}

// chunked read of `elems` values of SrcT, converted to float.
template <typename SrcT>
int read_converted(FILE* f, float* dst, int64_t elems) {
  std::vector<SrcT> tmp(std::min<int64_t>(elems, 1 << 16));
  int64_t done = 0;
  while (done < elems) {
    int64_t take = std::min<int64_t>(elems - done, (int64_t)tmp.size());
    if (fread(tmp.data(), sizeof(SrcT), take, f) != static_cast<size_t>(take))
      return -11;
    for (int64_t i = 0; i < take; ++i) dst[done + i] = float(tmp[i]);
    done += take;
  }
  return 0;
}

int load_one(const char* path, float* dst, int64_t expected_elems) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyHeader h;
  int rc = parse_npy_header(f, &h);
  if (rc != 0) { fclose(f); return rc; }
  int64_t elems = 1;
  for (int64_t d : h.shape) elems *= d;
  // EXACT element-count match: a short file must error like the numpy
  // fallback's reshape would, not partially fill an uninitialized buffer
  if (elems != expected_elems) { fclose(f); return -9; }
  if (fseek(f, static_cast<long>(h.data_offset), SEEK_SET) != 0) {
    fclose(f); return -10;
  }
  // int dtypes are VALUE-converted to float (like the fallback's astype);
  // reinterpreting their raw bits as float would be silent corruption
  switch (h.dtype) {
    case DT_F4:
      rc = (fread(dst, 4, elems, f) == static_cast<size_t>(elems)) ? 0 : -11;
      break;
    case DT_F8: rc = read_converted<double>(f, dst, elems); break;
    case DT_I4: rc = read_converted<int32_t>(f, dst, elems); break;
    case DT_I8: rc = read_converted<int64_t>(f, dst, elems); break;
  }
  fclose(f);
  return rc;
}

}  // namespace

extern "C" {

int msfno_npy_info(const char* path, int64_t* shape_out, int* ndim_out,
                   int* word_size_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyHeader h;
  int rc = parse_npy_header(f, &h);
  fclose(f);
  if (rc != 0) return rc;
  if (h.shape.size() > 8) return -12;
  for (size_t i = 0; i < h.shape.size(); ++i) shape_out[i] = h.shape[i];
  *ndim_out = static_cast<int>(h.shape.size());
  *word_size_out = h.word_size;
  return 0;
}

// Load n npy files into `out` (n * per_item_elems floats) with a thread pool.
// Returns 0 on success or -(index+1) of the first failing file.
int msfno_load_npy_batch(const char** paths, int n, float* out,
                         int64_t per_item_elems, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) return;
      int rc = load_one(paths[i], out + int64_t(i) * per_item_elems,
                        per_item_elems);
      if (rc != 0) failed.store(-(i + 1));
    }
  };
  std::vector<std::thread> pool;
  int workers = std::min(n_threads, n);
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(work);
  for (auto& t : pool) t.join();
  return failed.load();
}

}  // extern "C"
