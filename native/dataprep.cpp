// Native data-preparation kernels for the training pipeline.
//
// The reference's data loader does npz bit-unpacking and 8-fold symmetry
// augmentation on the host per batch (python/katago/train/
// data_processing_pytorch.py:28-299, backed by torch CPU ops). Feeding a
// TPU at full rate makes this the host-side hot loop, so these are plain
// C++ (OpenMP-free, thread-safe, no allocations) routines exposed through
// ctypes (katago_tpu/dataio/native.py):
//
//   kt_unpack_bits_nchw:  uint8 bit-packed [N, C, ceil(area/8)] ->
//                         float32 [N, C, area]
//   kt_apply_symmetry_planes: float32 [N, C, H, W] dihedral transform
//                         in-place-free (dst buffer), symmetry 0..7
//                         encoded as (transpose<<2) | (flip_y<<1) | flip_x
//   kt_apply_symmetry_policy: float32 [N, area+1] policy rows (pass slot
//                         fixed), same symmetry encoding
//
// Build: native/build.sh (g++ -O3 -shared -fPIC). The Python wrapper
// falls back to numpy when the shared library is absent.

#include <cstdint>
#include <cstring>

extern "C" {

// 256-entry byte -> 8 floats table, built once (single pass over the
// output vs numpy's unpack + slice-copy + float-convert three passes)
static float g_unpack_lut[256][8];
static bool g_lut_ready = false;

static void build_lut() {
  for (int v = 0; v < 256; v++) {
    for (int bit = 0; bit < 8; bit++) {
      g_unpack_lut[v][bit] = ((v >> (7 - bit)) & 1) ? 1.0f : 0.0f;
    }
  }
  g_lut_ready = true;
}

void kt_unpack_bits_nchw(const uint8_t* packed, float* out,
                         int64_t n, int64_t channels, int64_t area) {
  if (!g_lut_ready) build_lut();
  const int64_t packed_w = (area + 7) / 8;
  const int64_t full_bytes = area / 8;
  const int64_t tail_bits = area - full_bytes * 8;
  for (int64_t i = 0; i < n * channels; i++) {
    const uint8_t* src = packed + i * packed_w;
    float* dst = out + i * area;
    for (int64_t b = 0; b < full_bytes; b++) {
      std::memcpy(dst + b * 8, g_unpack_lut[src[b]], 8 * sizeof(float));
    }
    if (tail_bits > 0) {
      std::memcpy(dst + full_bytes * 8, g_unpack_lut[src[full_bytes]],
                  tail_bits * sizeof(float));
    }
  }
}

static inline int64_t sym_index(int64_t y, int64_t x, int64_t h, int64_t w,
                                int sym) {
  if (sym & 2) y = h - 1 - y;   // flip_y
  if (sym & 1) x = w - 1 - x;   // flip_x
  if (sym & 4) {                // transpose (requires h == w)
    int64_t t = y; y = x; x = t;
  }
  return y * w + x;
}

void kt_apply_symmetry_planes(const float* src, float* dst,
                              int64_t n, int64_t channels,
                              int64_t h, int64_t w, int sym) {
  const int64_t area = h * w;
  for (int64_t i = 0; i < n * channels; i++) {
    const float* s = src + i * area;
    float* d = dst + i * area;
    for (int64_t y = 0; y < h; y++) {
      for (int64_t x = 0; x < w; x++) {
        d[sym_index(y, x, h, w, sym)] = s[y * w + x];
      }
    }
  }
}

void kt_apply_symmetry_policy(const float* src, float* dst,
                              int64_t n, int64_t h, int64_t w, int sym) {
  const int64_t area = h * w;
  for (int64_t i = 0; i < n; i++) {
    const float* s = src + i * (area + 1);
    float* d = dst + i * (area + 1);
    for (int64_t y = 0; y < h; y++) {
      for (int64_t x = 0; x < w; x++) {
        d[sym_index(y, x, h, w, sym)] = s[y * w + x];
      }
    }
    d[area] = s[area];  // pass slot is symmetry-invariant
  }
}

}  // extern "C"
