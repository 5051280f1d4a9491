// Native data-loading core: threaded image decode + fused dequantize.
//
// TPU-native analogue of the reference's native data path (torch
// DataLoader C++ workers + mmcv's cv2-backed image ops): a pthread worker
// pool that decodes camera JPEGs (libjpeg) and 16-bit sensor PNGs
// (libpng), fusing the sensor dequantization (v / scale - shift, see
// `mmdet/datasets/pipelines/loading.py:303-310`) and camera normalization
// into the decode pass so the Python loader only does geometry.
//
// Exposed via a C ABI for ctypes (hrfuser_tpu/data/native.py).
//
// Build: g++ -O3 -shared -fPIC loader.cpp -o libhrfuser_loader.so \
//            -lpng -ljpeg -lpthread

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG (any bit depth; returns uint16 buffer, HWC)
// ---------------------------------------------------------------------------

// Returns 0 on success. Caller provides out buffer of h*w*c uint16
// (query dimensions first with png16_shape).
int png16_shape(const char* path, int* h, int* w, int* c) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  *c = png_get_channels(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

int decode_png16(const char* path, uint16_t* out, int h, int w, int c) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  if ((int)png_get_image_height(png, info) != h ||
      (int)png_get_image_width(png, info) != w ||
      (int)png_get_channels(png, info) != c) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  int depth = png_get_bit_depth(png, info);
  if (depth < 16) png_set_expand_16(png);
  // PNG stores 16-bit big-endian; swap to host little-endian
  png_set_swap(png);
  // match cv2 conventions: 3/4-channel images come back BGR(A)
  if (c >= 3) png_set_bgr(png);
  png_read_update_info(png, info);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = reinterpret_cast<png_bytep>(out + (size_t)y * w * c);
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Decode + dequantize + normalize in one pass:
//   out[c] = (png[c] / scale - shift - mean[c]) / std[c]
int decode_sensor_png(const char* path, float* out, int h, int w, int c,
                      float scale, float shift, const float* mean,
                      const float* stdv) {
  std::vector<uint16_t> raw((size_t)h * w * c);
  int rc = decode_png16(path, raw.data(), h, w, c);
  if (rc) return rc;
  const float inv_scale = 1.0f / scale;
  for (int ch = 0; ch < c; ++ch) {
    const float m = mean ? mean[ch] : 0.0f;
    const float is = stdv ? 1.0f / stdv[ch] : 1.0f;
    for (size_t i = ch; i < raw.size(); i += c) {
      out[i] = ((float)raw[i] * inv_scale - shift - m) * is;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG (8-bit, returns BGR uint8 to match cv2 conventions)
// ---------------------------------------------------------------------------

struct JErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jerr_exit(j_common_ptr cinfo) {
  JErr* e = reinterpret_cast<JErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

int jpeg_shape(const char* path, int* h, int* w, int* c) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  *c = cinfo.num_components;
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

int decode_jpeg_bgr(const char* path, uint8_t* out, int h, int w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_EXT_BGR;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != h || (int)cinfo.output_width != w) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// Worker pool: parallel fused sensor decode for a batch of files
// ---------------------------------------------------------------------------

struct SensorJob {
  const char* path;
  float* out;
  int h, w, c;
  float scale, shift;
  const float* mean;
  const float* stdv;
};

// Decodes `n` sensor PNGs with `num_threads` workers; returns the number
// of failures (rc != 0).
int decode_sensor_batch(const SensorJob* jobs, int n, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::mutex mu;
  int next = 0;
  int failures = 0;
  auto worker = [&]() {
    for (;;) {
      int i;
      {
        std::lock_guard<std::mutex> lk(mu);
        if (next >= n) return;
        i = next++;
      }
      const SensorJob& j = jobs[i];
      int rc = decode_sensor_png(j.path, j.out, j.h, j.w, j.c, j.scale,
                                 j.shift, j.mean, j.stdv);
      if (rc) {
        std::lock_guard<std::mutex> lk(mu);
        failures++;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures;
}

}  // extern "C"
