// Native COLMAP binary model parser.
//
// The reference links against pycolmap's C++ reader (gs_load_colmap.py:127);
// this is our native equivalent: a dependency-free reader for the documented
// COLMAP binary format, exposed through a C ABI for ctypes. The Python
// fallback (data/colmap.py) is ~50x slower on points3D.bin because of the
// per-point variable-length track skipping; here it is a single streaming
// pass.
//
// Format (little endian):
//   cameras.bin : u64 n; { i32 camera_id, i32 model_id, u64 w, u64 h,
//                          f64 params[nparams(model)] }
//   images.bin  : u64 n; { i32 image_id, f64 qvec[4] (w,x,y,z), f64 tvec[3],
//                          i32 camera_id, cstr name, u64 n2d,
//                          { f64 x, f64 y, i64 pid } [n2d] }
//   points3D.bin: u64 n; { u64 pid, f64 xyz[3], u8 rgb[3], f64 err,
//                          u64 tlen, { i32, i32 } [tlen] }
//
// Build: g++ -O2 -shared -fPIC -o libcolmap_parser.so colmap_parser.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

struct Buf {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
  bool ok = true;

  template <typename T>
  T get() {
    if (off + sizeof(T) > n) {
      ok = false;
      return T{};
    }
    T v;
    std::memcpy(&v, p + off, sizeof(T));
    off += sizeof(T);
    return v;
  }
  bool skip(size_t k) {
    if (off + k > n) {
      ok = false;
      return false;
    }
    off += k;
    return true;
  }
};

int num_params_for_model(int32_t model_id) {
  switch (model_id) {
    case 0: return 3;   // SIMPLE_PINHOLE
    case 1: return 4;   // PINHOLE
    case 2: return 4;   // SIMPLE_RADIAL
    case 3: return 5;   // RADIAL
    case 4: return 8;   // OPENCV
    case 5: return 8;   // OPENCV_FISHEYE
    case 6: return 12;  // FULL_OPENCV
    case 7: return 5;   // FOV
    case 8: return 4;   // SIMPLE_RADIAL_FISHEYE
    case 9: return 5;   // RADIAL_FISHEYE
    case 10: return 12; // THIN_PRISM_FISHEYE
    default: return -1;
  }
}

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz < 0) {
    std::fclose(f);
    return false;
  }
  out.resize(static_cast<size_t>(sz));
  size_t rd = sz ? std::fread(out.data(), 1, out.size(), f) : 0;
  std::fclose(f);
  return rd == out.size();
}

}  // namespace

extern "C" {

// ---- points3D.bin ----
// Pass 1 (out_xyz == nullptr): returns point count, or -1 on error.
// Pass 2: fills out_xyz (n*3 f32) and out_rgb (n*3 u8); returns n.
long long colmap_read_points3d(const char* path, float* out_xyz,
                               uint8_t* out_rgb, long long capacity) {
  std::vector<uint8_t> data;
  if (!read_file(path, data)) return -1;
  Buf b{data.data(), data.size()};
  uint64_t n = b.get<uint64_t>();
  if (!b.ok) return -1;
  if (out_xyz == nullptr) {
    return static_cast<long long>(n);
  }
  if (capacity < static_cast<long long>(n)) return -1;
  for (uint64_t i = 0; i < n; ++i) {
    b.skip(8);  // point id
    double x = b.get<double>();
    double y = b.get<double>();
    double z = b.get<double>();
    uint8_t r = b.get<uint8_t>();
    uint8_t g = b.get<uint8_t>();
    uint8_t bl = b.get<uint8_t>();
    b.skip(8);  // error
    uint64_t tlen = b.get<uint64_t>();
    b.skip(tlen * 8);  // track (i32, i32)
    if (!b.ok) return -1;
    out_xyz[i * 3 + 0] = static_cast<float>(x);
    out_xyz[i * 3 + 1] = static_cast<float>(y);
    out_xyz[i * 3 + 2] = static_cast<float>(z);
    out_rgb[i * 3 + 0] = r;
    out_rgb[i * 3 + 1] = g;
    out_rgb[i * 3 + 2] = bl;
  }
  return static_cast<long long>(n);
}

// ---- cameras.bin ----
// Fills per-camera rows: ids (i32), model_ids (i32), wh (2xi32),
// fxfycxcy (4xf64). Pass nullptr outs for count-only. Single-focal models
// (SIMPLE_PINHOLE/SIMPLE_RADIAL/...) map params (f, cx, cy) -> (f, f, cx, cy)
// — note the reference misreads RADIAL as (fx, fy, cx, cy)
// (gs_load_colmap.py:102-106); we use the real layout.
long long colmap_read_cameras(const char* path, int32_t* out_ids,
                              int32_t* out_model, int32_t* out_wh,
                              double* out_k, long long capacity) {
  std::vector<uint8_t> data;
  if (!read_file(path, data)) return -1;
  Buf b{data.data(), data.size()};
  uint64_t n = b.get<uint64_t>();
  if (!b.ok) return -1;
  if (out_ids == nullptr) return static_cast<long long>(n);
  if (capacity < static_cast<long long>(n)) return -1;
  for (uint64_t i = 0; i < n; ++i) {
    int32_t cam_id = b.get<int32_t>();
    int32_t model_id = b.get<int32_t>();
    uint64_t w = b.get<uint64_t>();
    uint64_t h = b.get<uint64_t>();
    int np = num_params_for_model(model_id);
    if (np < 0 || !b.ok) return -1;
    double params[12] = {0};
    for (int k = 0; k < np; ++k) params[k] = b.get<double>();
    if (!b.ok) return -1;
    bool single_focal = (model_id == 0 || model_id == 2 || model_id == 3 ||
                         model_id == 8 || model_id == 9);
    out_ids[i] = cam_id;
    out_model[i] = model_id;
    out_wh[i * 2 + 0] = static_cast<int32_t>(w);
    out_wh[i * 2 + 1] = static_cast<int32_t>(h);
    if (single_focal) {
      out_k[i * 4 + 0] = params[0];
      out_k[i * 4 + 1] = params[0];
      out_k[i * 4 + 2] = params[1];
      out_k[i * 4 + 3] = params[2];
    } else {
      out_k[i * 4 + 0] = params[0];
      out_k[i * 4 + 1] = params[1];
      out_k[i * 4 + 2] = params[2];
      out_k[i * 4 + 3] = params[3];
    }
  }
  return static_cast<long long>(n);
}

// ---- images.bin ----
// Fills per-image: image_id (i32), qvec (4xf64 w,x,y,z), tvec (3xf64),
// camera_id (i32), names (concatenated '\0'-separated, cap name_capacity).
long long colmap_read_images(const char* path, int32_t* out_image_id,
                             double* out_qvec,
                             double* out_tvec, int32_t* out_cam_id,
                             char* out_names, long long capacity,
                             long long name_capacity) {
  std::vector<uint8_t> data;
  if (!read_file(path, data)) return -1;
  Buf b{data.data(), data.size()};
  uint64_t n = b.get<uint64_t>();
  if (!b.ok) return -1;
  if (out_qvec == nullptr) return static_cast<long long>(n);
  if (capacity < static_cast<long long>(n)) return -1;
  long long name_off = 0;
  for (uint64_t i = 0; i < n; ++i) {
    out_image_id[i] = b.get<int32_t>();
    for (int k = 0; k < 4; ++k) out_qvec[i * 4 + k] = b.get<double>();
    for (int k = 0; k < 3; ++k) out_tvec[i * 3 + k] = b.get<double>();
    out_cam_id[i] = b.get<int32_t>();
    // name: copy until NUL
    while (b.ok) {
      uint8_t c = b.get<uint8_t>();
      if (name_off >= name_capacity) return -1;
      out_names[name_off++] = static_cast<char>(c);
      if (c == 0) break;
    }
    uint64_t n2d = b.get<uint64_t>();
    b.skip(n2d * 24);
    if (!b.ok) return -1;
  }
  return static_cast<long long>(n);
}

}  // extern "C"
