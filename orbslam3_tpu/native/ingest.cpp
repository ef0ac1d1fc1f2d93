// Native dataset ingest runtime: threaded PNG decode + undistortion remap
// + ordered bounded queue.
//
// Parity target: the reference's ROS 2 ingestion node (SURVEY L9,
// ros2_ws/src/mono-inertial/include/image_grabber.hpp:96-110 — GPU
// remap-undistort -> resize -> grayscale pipeline feeding the tracker
// through queues).  Here the same role is played by a C++ thread pool that
// decodes PNG frames and applies the (precomputed) bilinear remap off the
// Python GIL, handing ready frames to the host loop in order; the TPU
// consumes them via jax.device_put.
//
// Exposed C ABI (used from Python via ctypes — no pybind11 in this image):
//   ingest_create(paths, n, remap, h, w, sw, sh, threads, queue_cap)
//   ingest_next(handle, out_frame, out_index)  -> 1 ok, 0 end
//   ingest_destroy(handle)
//
// Build: orbslam3_tpu/native/build.sh (g++ -O3 -march=native -shared).

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> data;
  int index = -1;
};

struct Ingest {
  std::vector<std::string> paths;
  std::vector<float> remap;  // (h*w*2) source coords (x, y); empty = none
  int out_h = 0, out_w = 0;  // output (undistorted) size
  int src_h = 0, src_w = 0;  // source image size
  int queue_cap = 8;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::map<int, Frame> ready;   // decoded frames by index
  std::atomic<int> next_to_fetch{0};
  int next_to_emit = 0;
  std::atomic<bool> stop{false};
  std::atomic<int> n_failed{0};
};

bool decode_png_gray(const char* path, std::vector<float>* out, int* w,
                     int* h) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray(png, 1, -1.0, -1.0);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  std::vector<png_byte> row((*w));
  out->resize(static_cast<size_t>(*w) * (*h));
  for (int y = 0; y < *h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->data() + static_cast<size_t>(y) * (*w);
    for (int x = 0; x < *w; ++x) dst[x] = static_cast<float>(row[x]);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

void apply_remap(const std::vector<float>& src, int sh, int sw,
                 const std::vector<float>& remap, int oh, int ow,
                 std::vector<float>* dst) {
  dst->resize(static_cast<size_t>(oh) * ow);
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      const size_t i = static_cast<size_t>(y) * ow + x;
      float mx = remap[i * 2];
      float my = remap[i * 2 + 1];
      if (mx < 0) mx = 0;
      if (my < 0) my = 0;
      if (mx > sw - 1.001f) mx = sw - 1.001f;
      if (my > sh - 1.001f) my = sh - 1.001f;
      const int x0 = static_cast<int>(mx);
      const int y0 = static_cast<int>(my);
      const float fx = mx - x0;
      const float fy = my - y0;
      const float* r0 = src.data() + static_cast<size_t>(y0) * sw;
      const float* r1 = r0 + sw;
      (*dst)[i] = (r0[x0] * (1 - fx) + r0[x0 + 1] * fx) * (1 - fy) +
                  (r1[x0] * (1 - fx) + r1[x0 + 1] * fx) * fy;
    }
  }
}

void worker(Ingest* ing) {
  while (!ing->stop.load()) {
    const int idx = ing->next_to_fetch.fetch_add(1);
    if (idx >= static_cast<int>(ing->paths.size())) return;
    std::vector<float> img;
    int w = 0, h = 0;
    Frame f;
    f.index = idx;
    if (decode_png_gray(ing->paths[idx].c_str(), &img, &w, &h)) {
      if (!ing->remap.empty()) {
        apply_remap(img, h, w, ing->remap, ing->out_h, ing->out_w, &f.data);
      } else if (w == ing->out_w && h == ing->out_h) {
        f.data = std::move(img);
      } else {
        // decoded size != declared output size: treat as a failed frame
        // (a larger image would otherwise overflow the caller's buffer)
        ing->n_failed.fetch_add(1);
        f.data.assign(static_cast<size_t>(ing->out_h) * ing->out_w, 0.0f);
      }
    } else {
      ing->n_failed.fetch_add(1);
      f.data.assign(static_cast<size_t>(ing->out_h) * ing->out_w, 0.0f);
    }
    std::unique_lock<std::mutex> lk(ing->mu);
    ing->cv_space.wait(lk, [&] {
      return ing->stop.load() ||
             static_cast<int>(ing->ready.size()) < ing->queue_cap ||
             idx < ing->next_to_emit + ing->queue_cap;
    });
    if (ing->stop.load()) return;
    ing->ready.emplace(idx, std::move(f));
    ing->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

void* ingest_create(const char** paths, int n_paths, const float* remap,
                    int out_h, int out_w, int src_h, int src_w,
                    int n_threads, int queue_cap) {
  auto* ing = new Ingest();
  ing->paths.reserve(n_paths);
  for (int i = 0; i < n_paths; ++i) ing->paths.emplace_back(paths[i]);
  if (remap != nullptr) {
    ing->remap.assign(remap, remap + static_cast<size_t>(out_h) * out_w * 2);
  }
  ing->out_h = out_h;
  ing->out_w = out_w;
  ing->src_h = src_h;
  ing->src_w = src_w;
  ing->queue_cap = queue_cap > 1 ? queue_cap : 2;
  const int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i) ing->workers.emplace_back(worker, ing);
  return ing;
}

int ingest_next(void* handle, float* out, int* out_index) {
  auto* ing = static_cast<Ingest*>(handle);
  std::unique_lock<std::mutex> lk(ing->mu);
  const int want = ing->next_to_emit;
  if (want >= static_cast<int>(ing->paths.size())) return 0;
  ing->cv_ready.wait(lk, [&] { return ing->ready.count(want) > 0; });
  Frame f = std::move(ing->ready[want]);
  ing->ready.erase(want);
  ing->next_to_emit++;
  ing->cv_space.notify_all();
  lk.unlock();
  // belt-and-braces: never copy more than the caller's declared buffer
  const size_t cap = static_cast<size_t>(ing->out_h) * ing->out_w;
  const size_t n = f.data.size() < cap ? f.data.size() : cap;
  std::memcpy(out, f.data.data(), n * sizeof(float));
  if (n < cap) std::memset(out + n, 0, (cap - n) * sizeof(float));
  *out_index = f.index;
  return 1;
}

int ingest_failed_count(void* handle) {
  return static_cast<Ingest*>(handle)->n_failed.load();
}

void ingest_destroy(void* handle) {
  auto* ing = static_cast<Ingest*>(handle);
  ing->stop.store(true);
  ing->cv_space.notify_all();
  ing->cv_ready.notify_all();
  for (auto& t : ing->workers) t.join();
  delete ing;
}

}  // extern "C"
