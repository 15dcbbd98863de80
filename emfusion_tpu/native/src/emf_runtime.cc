// emf_runtime: native runtime tier of the TPU EM-Fusion framework.
//
// C API (ctypes-friendly) over:
//   * image codecs (exr.cc, png_io.cc)
//   * a multi-worker frame prefetcher — the native equivalent of the
//     reference's reader thread (src/utils/RGBDReader.cpp:72-117), but with
//     a decode worker pool and in-order slot ring instead of a single
//     producer thread + mutex/condvar queue
//   * an async result writer — the reference buffers all results in RAM and
//     writes at exit on the main thread (src/core/EMFusion.cpp:991-1313);
//     here exports stream to disk off the critical path.
//
// Build: see Makefile (g++ -O3 -shared -fPIC ... -lpng -lz -lpthread).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace emf {
float* exr_read(const char* path, int* width, int* height, int* n_channels);
int exr_write(const char* path, const float* data, int width, int height,
              int compression, int as_half);
uint8_t* png_read_rgb8(const char* path, int* width, int* height);
uint16_t* png_read_gray16(const char* path, int* width, int* height);
int png_write_rgb8(const char* path, const uint8_t* data, int width,
                   int height);
int png_write_gray16(const char* path, const uint16_t* data, int width,
                     int height);
}  // namespace emf

extern "C" {

// ---------------------------------------------------------------- codecs

float* emf_exr_read(const char* path, int* w, int* h, int* c) {
  return emf::exr_read(path, w, h, c);
}

int emf_exr_write(const char* path, const float* data, int w, int h,
                  int compression, int as_half) {
  return emf::exr_write(path, data, w, h, compression, as_half);
}

uint8_t* emf_png_read_rgb8(const char* path, int* w, int* h) {
  return emf::png_read_rgb8(path, w, h);
}

uint16_t* emf_png_read_gray16(const char* path, int* w, int* h) {
  return emf::png_read_gray16(path, w, h);
}

int emf_png_write_rgb8(const char* path, const uint8_t* d, int w, int h) {
  return emf::png_write_rgb8(path, d, w, h);
}

int emf_png_write_gray16(const char* path, const uint16_t* d, int w, int h) {
  return emf::png_write_gray16(path, d, w, h);
}

void emf_free(void* p) { std::free(p); }

}  // extern "C"

// ------------------------------------------------------------- prefetcher

namespace {

struct Slot {
  std::vector<uint8_t> rgb;
  std::vector<float> depth;
  long index = -1;  // which frame currently occupies the slot
  bool ready = false;
  bool failed = false;
};

// Decodes one frame pair into rgb (h*w*3 u8; zero-filled if no rgb path)
// and depth (h*w f32, meters, 0 = invalid).
bool decode_frame(const std::string& rgb_path, const std::string& depth_path,
                  float depth_scale, float depth_clamp, int want_w, int want_h,
                  std::vector<uint8_t>* rgb, std::vector<float>* depth) {
  int w = 0, h = 0;
  rgb->assign((size_t)want_w * want_h * 3, 0);
  if (!rgb_path.empty()) {
    uint8_t* p = emf::png_read_rgb8(rgb_path.c_str(), &w, &h);
    if (!p || w != want_w || h != want_h) {
      std::free(p);
      return false;
    }
    std::memcpy(rgb->data(), p, (size_t)w * h * 3);
    std::free(p);
  }
  depth->assign((size_t)want_w * want_h, 0.0f);
  size_t n = depth_path.size();
  if (n > 4 && depth_path.compare(n - 4, 4, ".exr") == 0) {
    int c = 0;
    float* p = emf::exr_read(depth_path.c_str(), &w, &h, &c);
    if (!p || w != want_w || h != want_h) {
      std::free(p);
      return false;
    }
    for (size_t i = 0; i < (size_t)w * h; i++) {
      float d = p[i * c];  // first channel
      // >100 m clamp, reference ImageReader.cpp:116
      (*depth)[i] = (d > depth_clamp || d != d) ? 0.0f : d;
    }
    std::free(p);
  } else {
    uint16_t* p = emf::png_read_gray16(depth_path.c_str(), &w, &h);
    if (!p || w != want_w || h != want_h) {
      std::free(p);
      return false;
    }
    for (size_t i = 0; i < (size_t)w * h; i++)
      (*depth)[i] = (float)p[i] * depth_scale;
    std::free(p);
  }
  return true;
}

struct Prefetcher {
  std::vector<std::string> rgb_paths, depth_paths;
  float depth_scale, depth_clamp;
  int width = 0, height = 0;
  int capacity;
  std::vector<Slot> slots;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::atomic<long> next_job{0};
  long next_consume = 0;
  bool stop = false;
  std::vector<std::thread> workers;

  void worker_loop() {
    while (true) {
      long i = next_job.fetch_add(1);
      if (i >= (long)rgb_paths.size()) return;
      std::vector<uint8_t> rgb;
      std::vector<float> depth;
      bool ok = decode_frame(rgb_paths[i], depth_paths[i], depth_scale,
                             depth_clamp, width, height, &rgb, &depth);
      Slot& s = slots[i % capacity];
      std::unique_lock<std::mutex> lk(mu);
      // wait until the consumer has freed this slot's previous occupant
      cv_free.wait(lk, [&] {
        return stop || (!s.ready && next_consume > (long)(i - capacity));
      });
      if (stop) return;
      s.rgb = std::move(rgb);
      s.depth = std::move(depth);
      s.index = i;
      s.ready = true;
      s.failed = !ok;
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// Creates a prefetcher over n frame pairs. rgb_paths[i] may be "" (depth
// only). Decodes frame 0 synchronously to fix dimensions. Returns nullptr
// on failure.
void* emf_prefetch_create(const char** rgb_paths, const char** depth_paths,
                          long n, int n_workers, int capacity,
                          float depth_scale, float depth_clamp) {
  if (n <= 0) return nullptr;
  auto* p = new Prefetcher();
  p->depth_scale = depth_scale;
  p->depth_clamp = depth_clamp;
  p->capacity = capacity < 2 ? 2 : capacity;
  for (long i = 0; i < n; i++) {
    p->rgb_paths.emplace_back(rgb_paths[i] ? rgb_paths[i] : "");
    p->depth_paths.emplace_back(depth_paths[i]);
  }
  // probe frame 0 for dimensions
  int w = 0, h = 0;
  const std::string& d0 = p->depth_paths[0];
  if (d0.size() > 4 && d0.compare(d0.size() - 4, 4, ".exr") == 0) {
    int c;
    float* buf = emf::exr_read(d0.c_str(), &w, &h, &c);
    if (!buf) {
      delete p;
      return nullptr;
    }
    std::free(buf);
  } else {
    uint16_t* buf = emf::png_read_gray16(d0.c_str(), &w, &h);
    if (!buf) {
      delete p;
      return nullptr;
    }
    std::free(buf);
  }
  p->width = w;
  p->height = h;
  p->slots.resize(p->capacity);
  int nw = n_workers < 1 ? 1 : n_workers;
  for (int i = 0; i < nw; i++)
    p->workers.emplace_back([p] { p->worker_loop(); });
  return p;
}

void emf_prefetch_dims(void* handle, int* width, int* height, long* n) {
  auto* p = (Prefetcher*)handle;
  *width = p->width;
  *height = p->height;
  *n = (long)p->rgb_paths.size();
}

// Blocks until the next in-order frame is decoded, copies it out.
// Returns frame index, or -1 past the end, -2 on decode failure.
long emf_prefetch_next(void* handle, uint8_t* rgb_out, float* depth_out) {
  auto* p = (Prefetcher*)handle;
  if (p->next_consume >= (long)p->rgb_paths.size()) return -1;
  long i = p->next_consume;
  Slot& s = p->slots[i % p->capacity];
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_ready.wait(lk, [&] { return s.ready && s.index == i; });
  bool failed = s.failed;
  if (!failed) {
    if (rgb_out) std::memcpy(rgb_out, s.rgb.data(), s.rgb.size());
    if (depth_out)
      std::memcpy(depth_out, s.depth.data(), s.depth.size() * sizeof(float));
  }
  s.ready = false;
  p->next_consume = i + 1;
  p->cv_free.notify_all();
  return failed ? -2 : i;
}

void emf_prefetch_destroy(void* handle) {
  auto* p = (Prefetcher*)handle;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
    p->next_job.store((long)p->rgb_paths.size());
    p->cv_free.notify_all();
  }
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"

// ----------------------------------------------------------- async writer

namespace {

struct Writer {
  std::deque<std::function<void()>> jobs;
  std::mutex mu;
  std::condition_variable cv;
  bool stop = false;
  std::atomic<long> pending{0};
  std::atomic<long> errors{0};
  std::thread thread;

  void loop() {
    while (true) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop || !jobs.empty(); });
        if (jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      job();
      pending.fetch_sub(1);
      cv.notify_all();
    }
  }

  void submit(std::function<void()> job) {
    pending.fetch_add(1);
    std::lock_guard<std::mutex> lk(mu);
    jobs.emplace_back(std::move(job));
    cv.notify_all();
  }
};

void write_ply_file(const std::string& path, const std::vector<float>& verts,
                    const std::vector<float>& normals,
                    const std::vector<int32_t>& tris, long nv, long nt,
                    std::atomic<long>* errors) {
  // ASCII PLY with VTK-style polygon rows, matching the reference writer
  // (src/core/EMFusion.cpp:1263-1300) and io/writers.py.
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) {
    errors->fetch_add(1);
    return;
  }
  std::fprintf(f,
               "ply\nformat ascii 1.0\nelement vertex %ld\n"
               "property float x\nproperty float y\nproperty float z\n"
               "property float nx\nproperty float ny\nproperty float nz\n"
               "element face %ld\n"
               "property list uchar int vertex_indices\nend_header\n",
               nv, nt);
  for (long i = 0; i < nv; i++)
    std::fprintf(f, "%g %g %g %g %g %g\n", verts[i * 3], verts[i * 3 + 1],
                 verts[i * 3 + 2], normals[i * 3], normals[i * 3 + 1],
                 normals[i * 3 + 2]);
  for (long i = 0; i < nt; i++)
    std::fprintf(f, "3 %d %d %d\n", tris[i * 3], tris[i * 3 + 1],
                 tris[i * 3 + 2]);
  std::fclose(f);
}

void write_volume_file(const std::string& path, const std::vector<float>& vol,
                       int rx, int ry, int rz, float voxel_size,
                       std::atomic<long>* errors) {
  // Reference binary volume format (src/core/EMFusion.cpp:1302-1313):
  // 3x int32 resolution, size_t element size, float voxel size, raw data.
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) {
    errors->fetch_add(1);
    return;
  }
  int32_t res[3] = {rx, ry, rz};
  size_t elem = sizeof(float);
  std::fwrite(res, 4, 3, f);
  std::fwrite(&elem, sizeof(size_t), 1, f);
  std::fwrite(&voxel_size, 4, 1, f);
  std::fwrite(vol.data(), 4, vol.size(), f);
  std::fclose(f);
}

}  // namespace

extern "C" {

void* emf_writer_create() {
  auto* w = new Writer();
  w->thread = std::thread([w] { w->loop(); });
  return w;
}

void emf_writer_submit_ply(void* handle, const char* path, const float* verts,
                           const float* normals, long nv, const int32_t* tris,
                           long nt) {
  auto* w = (Writer*)handle;
  std::string p(path);
  std::vector<float> v(verts, verts + nv * 3);
  std::vector<float> n(normals, normals + nv * 3);
  std::vector<int32_t> t(tris, tris + nt * 3);
  auto* errs = &w->errors;
  w->submit([p, v = std::move(v), n = std::move(n), t = std::move(t), nv, nt,
             errs] { write_ply_file(p, v, n, t, nv, nt, errs); });
}

void emf_writer_submit_volume(void* handle, const char* path,
                              const float* data, int rx, int ry, int rz,
                              float voxel_size) {
  auto* w = (Writer*)handle;
  std::string p(path);
  std::vector<float> vol(data, data + (size_t)rx * ry * rz);
  auto* errs = &w->errors;
  w->submit([p, vol = std::move(vol), rx, ry, rz, voxel_size, errs] {
    write_volume_file(p, vol, rx, ry, rz, voxel_size, errs);
  });
}

void emf_writer_submit_png16(void* handle, const char* path,
                             const uint16_t* data, int w_, int h_) {
  auto* w = (Writer*)handle;
  std::string p(path);
  std::vector<uint16_t> img(data, data + (size_t)w_ * h_);
  auto* errs = &w->errors;
  w->submit([p, img = std::move(img), w_, h_, errs] {
    if (emf::png_write_gray16(p.c_str(), img.data(), w_, h_) != 0)
      errs->fetch_add(1);
  });
}

void emf_writer_submit_png8(void* handle, const char* path,
                            const uint8_t* data, int w_, int h_) {
  auto* w = (Writer*)handle;
  std::string p(path);
  std::vector<uint8_t> img(data, data + (size_t)w_ * h_ * 3);
  auto* errs = &w->errors;
  w->submit([p, img = std::move(img), w_, h_, errs] {
    if (emf::png_write_rgb8(p.c_str(), img.data(), w_, h_) != 0)
      errs->fetch_add(1);
  });
}

// Blocks until all submitted jobs are written. Returns error count so far.
long emf_writer_wait(void* handle) {
  auto* w = (Writer*)handle;
  std::unique_lock<std::mutex> lk(w->mu);
  w->cv.wait(lk, [&] { return w->pending.load() == 0; });
  return w->errors.load();
}

void emf_writer_destroy(void* handle) {
  auto* w = (Writer*)handle;
  {
    std::unique_lock<std::mutex> lk(w->mu);
    w->cv.wait(lk, [&] { return w->pending.load() == 0; });
    w->stop = true;
    w->cv.notify_all();
  }
  w->thread.join();
  delete w;
}

}  // extern "C"
