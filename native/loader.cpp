// Native data loader for the TPU optical-flow framework.
//
// The reference decodes JPEGs on the Python side with PIL, serially, per
// pair (Code/Parallel/OpticalFlowCalculation.py:66-71) — fine when each
// C++ solve takes seconds, but a TPU chip finishing a pair in tens of
// milliseconds starves on single-threaded Python JPEG decode.  This library
// is the production ingest path: a worker-thread pool that decodes frame
// pairs ahead of the consumer DIRECTLY INTO caller-owned float32 buffers
// (zero internal copies), normalized to [0, 1] and laid out channels-first
// (C, H, W) ready for device transfer.
//
// C API (ctypes-friendly), see python wrapper
// papteam_opticalflow_tpu/data/native_loader.py:
//   ofl_decode          — synchronous single-file decode
//   ofl_create/ofl_destroy — loader with N worker threads
//   ofl_submit          — enqueue a pair of paths + destination buffers
//   ofl_wait            — block until that ticket is decoded; returns dims
//
// Build: native/build.sh -> libofloader.so (links -ljpeg).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jump;
  char message[JMSG_LENGTH_MAX];
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, err->message);
  std::longjmp(err->jump, 1);
}

// Decode one JPEG into caller memory: CHW float32 [0,1] (out != null) or
// CHW uint8 raw (out_u8 != null).  The uint8 mode exists for the serving
// path: the TPU normalizes on device (u8/255 traced divide), and shipping
// u8 avoids both 4x the link bytes AND the ~47 ms/frame host-side
// float->u8 conversion that otherwise serializes inside the sweep loop
// (measured r5, tools/overlap_probe.py).
bool decode_jpeg_impl(const std::string& path, float* out, uint8_t* out_u8,
                      int64_t max_elems, int* h, int* w, int* c,
                      std::string* error) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    *error = "cannot open " + path;
    return false;
  }
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    // Corrupt stream: libjpeg error trampolines here.
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    *error = std::string("jpeg error: ") + jerr.message + " in " + path;
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    *error = "bad jpeg header: " + path;
    return false;
  }
  jpeg_start_decompress(&cinfo);
  const int W = cinfo.output_width;
  const int H = cinfo.output_height;
  const int C = cinfo.output_components;
  *h = H;
  *w = W;
  *c = C;
  if ((int64_t)H * W * C > max_elems) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    *error = "destination buffer too small for " + path;
    return false;
  }
  std::vector<unsigned char> row((size_t)W * C);
  unsigned char* rowp = row.data();
  const float inv = 1.0f / 255.0f;
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    // interleaved row -> planar CHW
    for (int k = 0; k < C; ++k) {
      const unsigned char* src = rowp + k;
      if (out) {
        float* dst = out + (size_t)k * H * W + (size_t)y * W;
        for (int x = 0; x < W; ++x) dst[x] = (float)src[(size_t)x * C] * inv;
      } else {
        uint8_t* dst = out_u8 + (size_t)k * H * W + (size_t)y * W;
        for (int x = 0; x < W; ++x) dst[x] = src[(size_t)x * C];
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool decode_jpeg(const std::string& path, float* out, int64_t max_elems,
                 int* h, int* w, int* c, std::string* error) {
  return decode_jpeg_impl(path, out, nullptr, max_elems, h, w, c, error);
}

bool decode_jpeg_u8(const std::string& path, uint8_t* out, int64_t max_elems,
                    int* h, int* w, int* c, std::string* error) {
  return decode_jpeg_impl(path, nullptr, out, max_elems, h, w, c, error);
}

struct Job {
  int ticket;
  std::string path_a, path_b;
  float* out_a = nullptr;       // f32 mode
  float* out_b = nullptr;
  uint8_t* out_a_u8 = nullptr;  // u8 mode (serving path)
  uint8_t* out_b_u8 = nullptr;
  int64_t max_elems;
};

struct Result {
  int h = 0, w = 0, c = 0;
  bool ok = false;
  std::string error;
};

struct Loader {
  std::vector<std::thread> workers;
  std::deque<Job> queue;
  std::map<int, Result> results;
  std::mutex mu;
  std::condition_variable cv_submit, cv_done;
  bool stopping = false;
  int next_ticket = 0;

  explicit Loader(int n_threads) {
    if (n_threads < 1) n_threads = 1;
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { this->run(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv_submit.notify_all();
    for (auto& t : workers) t.join();
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_submit.wait(lk, [this] { return stopping || !queue.empty(); });
        if (stopping && queue.empty()) return;
        job = std::move(queue.front());
        queue.pop_front();
      }
      Result r;
      r.ok = decode_jpeg_impl(job.path_a, job.out_a, job.out_a_u8,
                              job.max_elems, &r.h, &r.w, &r.c, &r.error);
      if (r.ok) {
        int h2, w2, c2;
        r.ok = decode_jpeg_impl(job.path_b, job.out_b, job.out_b_u8,
                                job.max_elems, &h2, &w2, &c2, &r.error);
        if (r.ok && (h2 != r.h || w2 != r.w || c2 != r.c)) {
          r.ok = false;
          r.error = "frame size mismatch in pair";
        }
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        results[job.ticket] = std::move(r);
      }
      cv_done.notify_all();
    }
  }

  int submit(const char* a, const char* b, float* out_a, float* out_b,
             uint8_t* out_a_u8, uint8_t* out_b_u8, int64_t max_elems) {
    std::lock_guard<std::mutex> lk(mu);
    if (stopping) return -1;
    int t = next_ticket++;
    Job job;
    job.ticket = t;
    job.path_a = a;
    job.path_b = b;
    job.out_a = out_a;
    job.out_b = out_b;
    job.out_a_u8 = out_a_u8;
    job.out_b_u8 = out_b_u8;
    job.max_elems = max_elems;
    queue.push_back(std::move(job));
    cv_submit.notify_one();
    return t;
  }

  int wait(int ticket, int* h, int* w, int* c, char* errbuf, int errlen) {
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [&] { return results.count(ticket) > 0; });
    Result r = std::move(results[ticket]);
    results.erase(ticket);
    lk.unlock();
    if (!r.ok) {
      if (errbuf && errlen > 0) std::snprintf(errbuf, errlen, "%s", r.error.c_str());
      return -1;
    }
    *h = r.h;
    *w = r.w;
    *c = r.c;
    return 0;
  }
};

}  // namespace

extern "C" {

int ofl_decode(const char* path, float* out, int* h, int* w, int* c,
               int64_t max_elems, char* errbuf, int errlen) {
  std::string err;
  if (!decode_jpeg(path, out, max_elems, h, w, c, &err)) {
    if (errbuf && errlen > 0) std::snprintf(errbuf, errlen, "%s", err.c_str());
    return -1;
  }
  return 0;
}

void* ofl_create(int n_threads) { return new Loader(n_threads); }

void ofl_destroy(void* loader) { delete static_cast<Loader*>(loader); }

int ofl_submit(void* loader, const char* path_a, const char* path_b,
               float* out_a, float* out_b, int64_t max_elems) {
  return static_cast<Loader*>(loader)->submit(path_a, path_b, out_a, out_b,
                                              nullptr, nullptr, max_elems);
}

int ofl_decode_u8(const char* path, uint8_t* out, int* h, int* w, int* c,
                  int64_t max_elems, char* errbuf, int errlen) {
  std::string err;
  if (!decode_jpeg_u8(path, out, max_elems, h, w, c, &err)) {
    if (errbuf && errlen > 0) std::snprintf(errbuf, errlen, "%s", err.c_str());
    return -1;
  }
  return 0;
}

int ofl_submit_u8(void* loader, const char* path_a, const char* path_b,
                  uint8_t* out_a, uint8_t* out_b, int64_t max_elems) {
  return static_cast<Loader*>(loader)->submit(path_a, path_b, nullptr, nullptr,
                                              out_a, out_b, max_elems);
}

int ofl_wait(void* loader, int ticket, int* h, int* w, int* c, char* errbuf,
             int errlen) {
  return static_cast<Loader*>(loader)->wait(ticket, h, w, c, errbuf, errlen);
}
}
