// Native image preprocessing for the host data pipeline.
//
// TPU-native analog of the reference's C++-backed torch DataLoader workers:
// the per-sample hot path (bilinear letterbox resize + u8->f32 normalize
// into the batch tensor) runs in C++ so Python threads spend their time in
// GIL-released native code. Compiled with -O3 -march=native; inner loops
// vectorize (contiguous channel-last layout).
//
// Exposed via ctypes (see native.py): plain C ABI, no pybind11.

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// Bilinear resize RGB u8 HWC [h,w,3] -> [oh,ow,3].
void resize_bilinear_u8(const uint8_t* src, int h, int w,
                        uint8_t* dst, int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(h - 1, static_cast<int>(fy)));
    int y1 = std::min(h - 1, y0 + 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    const uint8_t* r0 = src + static_cast<int64_t>(y0) * w * 3;
    const uint8_t* r1 = src + static_cast<int64_t>(y1) * w * 3;
    uint8_t* out = dst + static_cast<int64_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(w - 1, static_cast<int>(fx)));
      int x1 = std::min(w - 1, x0 + 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = r0[x0 * 3 + c], v01 = r0[x1 * 3 + c];
        float v10 = r1[x0 * 3 + c], v11 = r1[x1 * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        out[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Letterbox: resize keeping aspect into a [size,size,3] canvas filled with
// pad_value, centered. Returns gain and offsets through out params.
void letterbox_u8(const uint8_t* src, int h, int w,
                  uint8_t* dst, int size, uint8_t pad_value,
                  float* gain, int* pad_x, int* pad_y) {
  float r = std::min(static_cast<float>(size) / h, static_cast<float>(size) / w);
  int nh = static_cast<int>(h * r + 0.5f);
  int nw = static_cast<int>(w * r + 0.5f);
  *gain = r;
  *pad_x = (size - nw) / 2;
  *pad_y = (size - nh) / 2;
  std::memset(dst, pad_value, static_cast<int64_t>(size) * size * 3);
  // resize into a temp then blit (keeps resize loop simple/contiguous)
  uint8_t* tmp = new uint8_t[static_cast<int64_t>(nh) * nw * 3];
  resize_bilinear_u8(src, h, w, tmp, nh, nw);
  for (int y = 0; y < nh; ++y) {
    std::memcpy(dst + ((static_cast<int64_t>(y + *pad_y)) * size + *pad_x) * 3,
                tmp + static_cast<int64_t>(y) * nw * 3,
                static_cast<int64_t>(nw) * 3);
  }
  delete[] tmp;
}

// u8 HWC -> f32 HWC scaled to [0,1], written into a batch slot.
void normalize_u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
  constexpr float k = 1.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * k;
}

// Fused letterbox + normalize into a float batch slot [size,size,3].
void letterbox_normalize(const uint8_t* src, int h, int w,
                         float* dst, int size, uint8_t pad_value,
                         float* gain, int* pad_x, int* pad_y) {
  uint8_t* tmp = new uint8_t[static_cast<int64_t>(size) * size * 3];
  letterbox_u8(src, h, w, tmp, size, pad_value, gain, pad_x, pad_y);
  normalize_u8_to_f32(tmp, dst, static_cast<int64_t>(size) * size * 3);
  delete[] tmp;
}

}  // extern "C"
