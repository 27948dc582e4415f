// Native host-preprocessing runtime for minipig_gan_tpu.
//
// This is the C++ replacement for the third-party native layers the reference
// leans on for its data path — ITK 5.1.2's NIfTI IO and ResampleImageFilter
// (/root/reference/code/GAN/transforms.py:15,164-184; see SURVEY.md §2
// "Native components the TPU build must re-implement"). It accelerates the
// cache-build hot loop (gzip inflate -> dtype convert -> physical-space
// trilinear resample -> percentile window), releases the GIL (pure C ABI via
// ctypes), and parallelizes across slices with std::thread.
//
// Build: make -C native  (g++ -O3 -shared -fPIC, links zlib)
// Python binding: minipig_gan_tpu/data/native.py (ctypes).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// file read (+ transparent gunzip)
// ---------------------------------------------------------------------------

// Reads a file; if gzip-magic, inflates. Returns malloc'd buffer in *out and
// its size, or -1 on error. Caller frees with mp_free.
long mp_read_file(const char* path, unsigned char** out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize <= 0) {
    std::fclose(f);
    return -1;
  }
  std::vector<unsigned char> raw((size_t)fsize);
  if (std::fread(raw.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  if (fsize >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    // gzip: streaming inflate into a growing buffer
    z_stream strm;
    std::memset(&strm, 0, sizeof(strm));
    if (inflateInit2(&strm, 16 + MAX_WBITS) != Z_OK) return -1;
    size_t cap = (size_t)fsize * 4 + (1 << 20);
    unsigned char* buf = (unsigned char*)std::malloc(cap);
    if (!buf) {
      inflateEnd(&strm);
      return -1;
    }
    strm.next_in = raw.data();
    strm.avail_in = (uInt)fsize;
    size_t total = 0;
    int ret = Z_OK;
    while (ret != Z_STREAM_END) {
      if (total == cap) {
        cap *= 2;
        unsigned char* nb = (unsigned char*)std::realloc(buf, cap);
        if (!nb) {
          std::free(buf);
          inflateEnd(&strm);
          return -1;
        }
        buf = nb;
      }
      strm.next_out = buf + total;
      strm.avail_out = (uInt)(cap - total);
      ret = inflate(&strm, Z_NO_FLUSH);
      if (ret != Z_OK && ret != Z_STREAM_END) {
        std::free(buf);
        inflateEnd(&strm);
        return -1;
      }
      total = cap - strm.avail_out;
    }
    inflateEnd(&strm);
    *out = buf;
    return (long)total;
  }

  unsigned char* buf = (unsigned char*)std::malloc((size_t)fsize);
  if (!buf) return -1;
  std::memcpy(buf, raw.data(), (size_t)fsize);
  *out = buf;
  return fsize;
}

void mp_free(void* p) { std::free(p); }

}  // extern "C"

// ---------------------------------------------------------------------------
// voxel dtype conversion (NIfTI datatype codes), optional byte swap
// ---------------------------------------------------------------------------

template <typename T>
static void convert(const unsigned char* src, long n, int swap, float* dst) {
  const T* s = reinterpret_cast<const T*>(src);
  if (!swap || sizeof(T) == 1) {
    for (long i = 0; i < n; ++i) dst[i] = (float)s[i];
    return;
  }
  for (long i = 0; i < n; ++i) {
    T v = s[i];
    unsigned char* b = reinterpret_cast<unsigned char*>(&v);
    for (size_t j = 0; j < sizeof(T) / 2; ++j) std::swap(b[j], b[sizeof(T) - 1 - j]);
    dst[i] = (float)v;
  }
}

extern "C" {

// code: NIfTI datatype; returns 0 ok, -1 unsupported.
int mp_convert_to_float(const unsigned char* src, int code, long n, int swap,
                        float* dst) {
  switch (code) {
    case 2:    convert<uint8_t>(src, n, swap, dst); return 0;
    case 4:    convert<int16_t>(src, n, swap, dst); return 0;
    case 8:    convert<int32_t>(src, n, swap, dst); return 0;
    case 16:   convert<float>(src, n, swap, dst); return 0;
    case 64:   convert<double>(src, n, swap, dst); return 0;
    case 256:  convert<int8_t>(src, n, swap, dst); return 0;
    case 512:  convert<uint16_t>(src, n, swap, dst); return 0;
    case 768:  convert<uint32_t>(src, n, swap, dst); return 0;
    case 1024: convert<int64_t>(src, n, swap, dst); return 0;
    default:   return -1;
  }
}

// ---------------------------------------------------------------------------
// trilinear physical-space resample (general affine, zero pad outside)
// matrix/offset map output (x,y,z) index -> input continuous (x,y,z) index,
// exactly ops/resample.py's resample_affine fold.
// ---------------------------------------------------------------------------

void mp_resample_trilinear(const float* vol, int nz, int ny, int nx,
                           const double* m /*9 row-major*/, const double* t /*3*/,
                           float* out, int zo, int yo, int xo, int n_threads) {
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  auto work = [&](int z0, int z1) {
    for (int z = z0; z < z1; ++z) {
      for (int y = 0; y < yo; ++y) {
        float* row = out + ((size_t)z * yo + y) * xo;
        // coords are affine in x: precompute base at x=0 and per-x increment
        double cx = m[1] * y + m[2] * z + t[0];
        double cy = m[4] * y + m[5] * z + t[1];
        double cz = m[7] * y + m[8] * z + t[2];
        for (int x = 0; x < xo; ++x, cx += m[0], cy += m[3], cz += m[6]) {
          if (cx < 0.0 || cx > nx - 1.0 || cy < 0.0 || cy > ny - 1.0 ||
              cz < 0.0 || cz > nz - 1.0) {
            row[x] = 0.0f;
            continue;
          }
          int x0 = (int)cx, y0 = (int)cy, z0i = (int)cz;
          if (x0 > nx - 2) x0 = nx - 2;
          if (y0 > ny - 2) y0 = ny - 2;
          if (z0i > nz - 2) z0i = nz - 2;
          if (x0 < 0) x0 = 0;
          if (y0 < 0) y0 = 0;
          if (z0i < 0) z0i = 0;
          double fx = cx - x0, fy = cy - y0, fz = cz - z0i;
          const size_t base = ((size_t)z0i * ny + y0) * nx + x0;
          const size_t zs = (size_t)ny * nx;
          // clamp +1 offsets on the high edge (weights there are 0)
          const size_t dx = (x0 + 1 < nx) ? 1 : 0;
          const size_t dy = (y0 + 1 < ny) ? (size_t)nx : 0;
          const size_t dz = (z0i + 1 < nz) ? zs : 0;
          double c00 = vol[base] * (1 - fx) + vol[base + dx] * fx;
          double c01 = vol[base + dy] * (1 - fx) + vol[base + dy + dx] * fx;
          double c10 = vol[base + dz] * (1 - fx) + vol[base + dz + dx] * fx;
          double c11 = vol[base + dz + dy] * (1 - fx) + vol[base + dz + dy + dx] * fx;
          double c0 = c00 * (1 - fy) + c01 * fy;
          double c1 = c10 * (1 - fy) + c11 * fy;
          row[x] = (float)(c0 * (1 - fz) + c1 * fz);
        }
      }
    }
  };
  if (n_threads == 1 || zo < 2 * n_threads) {
    work(0, zo);
    return;
  }
  std::vector<std::thread> threads;
  int chunk = (zo + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads; ++i) {
    int a = i * chunk, b = std::min(zo, a + chunk);
    if (a >= b) break;
    threads.emplace_back(work, a, b);
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// percentile windowing (MONAI ScaleIntensityRangePercentilesd semantics,
// np.percentile linear interpolation) — in place.
// ---------------------------------------------------------------------------

}  // extern "C"

static double percentile_linear(std::vector<float>& tmp, double pct) {
  // np.percentile 'linear': idx = pct/100*(n-1); interpolate neighbors
  size_t n = tmp.size();
  double idx = pct / 100.0 * (double)(n - 1);
  size_t lo = (size_t)idx;
  size_t hi = std::min(lo + 1, n - 1);
  std::nth_element(tmp.begin(), tmp.begin() + lo, tmp.end());
  float vlo = tmp[lo];
  std::nth_element(tmp.begin() + lo, tmp.begin() + hi, tmp.end());
  float vhi = tmp[hi];
  return vlo + (idx - (double)lo) * ((double)vhi - (double)vlo);
}

extern "C" {

void mp_percentile_scale(float* vol, long n, double lower_pct, double upper_pct,
                         double b_min, double b_max, int clip) {
  if (n <= 0) return;
  std::vector<float> tmp(vol, vol + n);
  double a_min = percentile_linear(tmp, lower_pct);
  double a_max = percentile_linear(tmp, upper_pct);
  double denom = a_max - a_min;
  if (denom == 0.0) denom = 1.0;
  double scale = (b_max - b_min) / denom;
  float lo = (float)std::min(b_min, b_max), hi = (float)std::max(b_min, b_max);
  for (long i = 0; i < n; ++i) {
    float v = (float)((vol[i] - a_min) * scale + b_min);
    if (clip) v = std::max(lo, std::min(hi, v));
    vol[i] = v;
  }
}

}  // extern "C"
