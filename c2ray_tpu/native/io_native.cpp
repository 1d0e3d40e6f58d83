// Native (C++) binary-cube I/O for the TPU C2-Ray framework.
//
// The runtime equivalent of the reference's Fortran binary readers
// (/root/reference/read_sm3d.f90, density_module.F90:203-243): production
// density/clumping/LLS slices are multi-GB Fortran-ordered cubes read once
// per redshift slice.  This loader mmaps the file and performs the
// Fortran->C order transpose plus the fused unit-conversion/empty-cell-floor
// (density_module.F90:275-282) with a blocked multithreaded kernel, feeding
// pinned host buffers for the device transfer.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: see Makefile (g++ -O3 -shared -fPIC -pthread).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr int kBlock = 64;  // cache-blocked transpose tile

// Transpose a Fortran-ordered (n1,n2,n3) float32 cube into C order with an
// optional affine conversion out = max(src*conv, floor_val) fused in.
void transpose_block(const float* src, float* dst, int64_t n1, int64_t n2,
                     int64_t n3, double conv, double floor_val, int64_t i_lo,
                     int64_t i_hi) {
  for (int64_t ib = i_lo; ib < i_hi; ib += kBlock) {
    int64_t ie = std::min(ib + int64_t(kBlock), i_hi);
    for (int64_t kb = 0; kb < n3; kb += kBlock) {
      int64_t ke = std::min(kb + int64_t(kBlock), n3);
      for (int64_t j = 0; j < n2; ++j) {
        for (int64_t i = ib; i < ie; ++i) {
          const float* s = src + i + n1 * j;
          float* d = dst + (i * n2 + j) * n3;
          for (int64_t k = kb; k < ke; ++k) {
            double v = double(s[n1 * n2 * k]) * conv;
            if (v <= 0.0) v = floor_val;
            d[k] = float(v);
          }
        }
      }
    }
  }
}

int n_threads() {
  unsigned hc = std::thread::hardware_concurrency();
  return hc ? int(hc) : 4;
}

}  // namespace

extern "C" {

// Read a stream-access float32 cube (optional 3x int32 mesh header),
// Fortran order on disk -> C order in `out`, with fused conversion
// out = max(v * conv, floor_val) (floor applied where v <= 0, matching
// density_module.F90:281 "empty cells get 0.1 particles").
// Returns 0 on success; negative errno-style codes otherwise.
int read_cube_f32(const char* path, int64_t n1, int64_t n2, int64_t n3,
                  int header, double conv, double floor_val, float* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -2;
  }
  int64_t offset = header ? 12 : 0;
  int64_t need = offset + n1 * n2 * n3 * int64_t(sizeof(float));
  if (st.st_size < need) {
    close(fd);
    return -3;
  }
  void* map = mmap(nullptr, size_t(need), PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED) return -4;
  if (header) {
    const int32_t* m = reinterpret_cast<const int32_t*>(map);
    if (m[0] != n1 || m[1] != n2 || m[2] != n3) {
      munmap(map, size_t(need));
      return -5;  // mesh-header validation (density_module.F90:217-223)
    }
  }
  const float* src =
      reinterpret_cast<const float*>(static_cast<const char*>(map) + offset);

  int nt = n_threads();
  std::vector<std::thread> ts;
  int64_t chunk = (n1 + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(lo + chunk, n1);
    if (lo >= hi) break;
    ts.emplace_back(transpose_block, src, out, n1, n2, n3, conv, floor_val,
                    lo, hi);
  }
  for (auto& t : ts) t.join();
  munmap(map, size_t(need));
  return 0;
}

// Write a C-ordered float32 cube to disk in Fortran order (+optional header).
int write_cube_f32(const char* path, int64_t n1, int64_t n2, int64_t n3,
                   int header, const float* data) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  if (header) {
    int32_t m[3] = {int32_t(n1), int32_t(n2), int32_t(n3)};
    if (fwrite(m, 4, 3, f) != 3) {
      fclose(f);
      return -2;
    }
  }
  // transpose to Fortran order in slabs of k
  std::vector<float> slab(size_t(n1) * size_t(n2));
  for (int64_t k = 0; k < n3; ++k) {
    for (int64_t j = 0; j < n2; ++j)
      for (int64_t i = 0; i < n1; ++i)
        slab[size_t(i + n1 * j)] = data[(i * n2 + j) * n3 + k];
    if (fwrite(slab.data(), sizeof(float), slab.size(), f) != slab.size()) {
      fclose(f);
      return -3;
    }
  }
  fclose(f);
  return 0;
}

}  // extern "C"
