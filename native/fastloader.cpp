// fastloader: parallel .npy batch reader with fused crop/scale.
//
// The reference feeds training through torch DataLoader worker *processes*
// (datasets/datamodule.py:69-88) — fork overhead + pickling per batch.  Here
// the host side is a C++ thread pool that parses .npy headers, reads, crops
// and rescales straight into one preallocated batch buffer (no GIL, no IPC,
// one memcpy).  Exposed as a tiny C ABI consumed via ctypes
// (melspec_gpt_vqvae_tpu/data/native.py).
//
// Supported dtypes: <f4, <f8 (converted to f32), <i8, <i4 (to i32).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  int64_t rows = 0, cols = 0;
  char kind = 0;   // 'f' or 'i'
  int itemsize = 0;
  long data_offset = 0;
  bool fortran = false;
};

// Parse a v1.0/v2.0 .npy header. Returns false on malformed input.
bool parse_npy_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    hlen = b[0] | (b[1] << 8);
    info->data_offset = 10 + hlen;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    info->data_offset = 12 + hlen;
  }
  std::string header(hlen, '\0');
  if (fread(&header[0], 1, hlen, f) != hlen) return false;

  auto find_val = [&](const char* key) -> std::string {
    size_t p = header.find(key);
    if (p == std::string::npos) return "";
    p = header.find(':', p);
    if (p == std::string::npos) return "";
    size_t end = header.find(',', p);
    // shape tuples contain commas; handle separately below
    return header.substr(p + 1, end - p - 1);
  };

  std::string descr = find_val("'descr'");
  size_t q1 = descr.find('\'');
  size_t q2 = descr.find('\'', q1 + 1);
  if (q1 == std::string::npos || q2 == std::string::npos) return false;
  std::string dt = descr.substr(q1 + 1, q2 - q1 - 1);
  if (dt.size() < 3 || (dt[0] != '<' && dt[0] != '|')) return false;
  info->kind = dt[1];
  info->itemsize = atoi(dt.c_str() + 2);

  info->fortran = header.find("'fortran_order': True") != std::string::npos;

  size_t sp = header.find("'shape'");
  if (sp == std::string::npos) return false;
  sp = header.find('(', sp);
  size_t ep = header.find(')', sp);
  if (sp == std::string::npos || ep == std::string::npos) return false;
  std::string shape = header.substr(sp + 1, ep - sp - 1);
  long dims[4] = {0, 0, 0, 0};
  int nd = 0;
  const char* s = shape.c_str();
  while (*s && nd < 4) {
    while (*s == ' ' || *s == ',') ++s;
    if (!*s) break;
    dims[nd++] = strtol(s, const_cast<char**>(&s), 10);
  }
  if (nd == 1) { info->rows = dims[0]; info->cols = 1; }
  else if (nd == 2) { info->rows = dims[0]; info->cols = dims[1]; }
  else return false;
  return true;
}

// Load one 2D npy, center/offset-crop to (crop_h, crop_w), write
// scale*x + shift into out (f32, row-major). Returns 0 on success.
int load_one_f32(const char* path, float* out, int crop_h, int crop_w,
                 float scale, float shift) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  NpyInfo info;
  if (!parse_npy_header(f, &info) || info.fortran ||
      info.kind != 'f' || (info.itemsize != 4 && info.itemsize != 8) ||
      info.rows < crop_h || info.cols < crop_w) {
    fclose(f);
    return 2;
  }
  const long top = (info.rows - crop_h) / 2;
  const long left = (info.cols - crop_w) / 2;
  std::vector<unsigned char> rowbuf(info.cols * info.itemsize);
  for (int r = 0; r < crop_h; ++r) {
    long off = info.data_offset +
               ((top + r) * info.cols) * (long)info.itemsize;
    if (fseek(f, off, SEEK_SET) != 0 ||
        fread(rowbuf.data(), info.itemsize, info.cols, f) !=
            (size_t)info.cols) {
      fclose(f);
      return 3;
    }
    float* dst = out + (long)r * crop_w;
    if (info.itemsize == 4) {
      const float* src = reinterpret_cast<const float*>(rowbuf.data()) + left;
      for (int c = 0; c < crop_w; ++c) dst[c] = scale * src[c] + shift;
    } else {
      const double* src =
          reinterpret_cast<const double*>(rowbuf.data()) + left;
      for (int c = 0; c < crop_w; ++c)
        dst[c] = scale * (float)src[c] + shift;
    }
  }
  fclose(f);
  return 0;
}

int load_one_i32(const char* path, int32_t* out, int rows, int cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  NpyInfo info;
  if (!parse_npy_header(f, &info) || info.fortran || info.kind != 'i' ||
      info.rows != rows || info.cols != cols) {
    fclose(f);
    return 2;
  }
  const long n = (long)rows * cols;
  if (info.itemsize == 4) {
    if (fseek(f, info.data_offset, SEEK_SET) != 0 ||
        fread(out, 4, n, f) != (size_t)n) {
      fclose(f);
      return 3;
    }
  } else if (info.itemsize == 8) {
    std::vector<int64_t> buf(n);
    if (fseek(f, info.data_offset, SEEK_SET) != 0 ||
        fread(buf.data(), 8, n, f) != (size_t)n) {
      fclose(f);
      return 3;
    }
    for (long i = 0; i < n; ++i) out[i] = (int32_t)buf[i];
  } else {
    fclose(f);
    return 2;
  }
  fclose(f);
  return 0;
}

template <typename Fn>
int parallel_for(int n, int nthreads, Fn fn) {
  std::atomic<int> next(0), err(0);
  auto work = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int e = fn(i);
      if (e) err.store(e);
    }
  };
  if (nthreads <= 1) {
    work();
  } else {
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; ++t) ts.emplace_back(work);
    for (auto& t : ts) t.join();
  }
  return err.load();
}

}  // namespace

extern "C" {

// Batch of 2D float spectrograms -> (n, crop_h, crop_w) f32 with
// out = scale * crop(x) + shift.  Returns 0 or the first error code.
int fl_load_spec_batch(const char** paths, int n, float* out, int crop_h,
                       int crop_w, float scale, float shift, int nthreads) {
  const long stride = (long)crop_h * crop_w;
  return parallel_for(n, nthreads, [&](int i) {
    return load_one_f32(paths[i], out + (long)i * stride, crop_h, crop_w,
                        scale, shift);
  });
}

// Batch of integer code grids -> (n, rows, cols) i32.
int fl_load_codes_batch(const char** paths, int n, int32_t* out, int rows,
                        int cols, int nthreads) {
  const long stride = (long)rows * cols;
  return parallel_for(n, nthreads, [&](int i) {
    return load_one_i32(paths[i], out + (long)i * stride, rows, cols);
  });
}

// Probe a single npy: fills rows/cols, returns 0 if parseable.
int fl_probe_npy(const char* path, int64_t* rows, int64_t* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  NpyInfo info;
  bool ok = parse_npy_header(f, &info);
  fclose(f);
  if (!ok) return 2;
  *rows = info.rows;
  *cols = info.cols;
  return 0;
}

}  // extern "C"
