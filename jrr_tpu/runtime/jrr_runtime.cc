// jrr_tpu native runtime: packed-dataset reader, bilinear similarity warp,
// and a threaded batch assembler for the host input pipeline.
//
// Role: the reference delegates its host-side hot path (image decode + crop
// warp) to torch DataLoader workers and torch C++ kernels
// (reference: scripts/data.py:90-160, scripts/sampling_helper.py:15-69,
// torch F.grid_sample). Here the equivalent native component is this library:
// frames live in one memory-mapped pack file; worker threads bilinear-warp
// the bbox crop directly from the mmap into pinned float32 batch buffers with
// zero Python in the loop. Exposed through a plain C ABI consumed via ctypes
// (jrr_tpu/runtime/__init__.py).
//
// Warp semantics match jrr_tpu.ops.sampling exactly (and therefore torch
// grid_sample bilinear/zeros/align_corners=False): output mesh is an
// inclusive linspace(-1, 1) per axis, transformed by a 3x3 homography with
// perspective divide; source pixel = ((g + 1) * size - 1) / 2; out-of-bounds
// taps contribute zero.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct ThreadPool {
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void Submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// Bilinear sample of a uint8 HWC image at float pixel coords, zero padding.
inline void SampleBilinear(const uint8_t* img, int h, int w, int c, float x,
                           float y, float* out /* c values */) {
  const int x0 = static_cast<int>(std::floor(x));
  const int y0 = static_cast<int>(std::floor(y));
  const float dx = x - x0, dy = y - y0;
  const float w00 = (1 - dx) * (1 - dy), w01 = dx * (1 - dy);
  const float w10 = (1 - dx) * dy, w11 = dx * dy;
  for (int ch = 0; ch < c; ++ch) out[ch] = 0.f;
  auto tap = [&](int xi, int yi, float wgt) {
    if (wgt == 0.f || xi < 0 || xi >= w || yi < 0 || yi >= h) return;
    const uint8_t* p = img + (static_cast<int64_t>(yi) * w + xi) * c;
    for (int ch = 0; ch < c; ++ch) out[ch] += wgt * p[ch];
  };
  tap(x0, y0, w00);
  tap(x0 + 1, y0, w01);
  tap(x0, y0 + 1, w10);
  tap(x0 + 1, y0 + 1, w11);
}

struct PackHeader {
  uint64_t magic;  // 'JRRPACK1'
  uint64_t num_frames;
  uint32_t img_h, img_w, img_c;
  uint32_t mask_h, mask_w;
};
constexpr uint64_t kMagic = 0x314b434150525252ull;  // "RRRPACK1" LE-ish tag

struct Pack {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  PackHeader hdr;
  size_t frame_bytes = 0;
  const uint8_t* FrameImage(int64_t i) const {
    return base + sizeof(PackHeader) + i * frame_bytes;
  }
  const uint8_t* FrameMask(int64_t i) const {
    return FrameImage(i) +
           static_cast<size_t>(hdr.img_h) * hdr.img_w * hdr.img_c;
  }
};

ThreadPool* g_pool = nullptr;
int g_pool_size = 0;

void EnsurePool(int n) {
  if (g_pool && g_pool_size == n) return;
  delete g_pool;
  g_pool = new ThreadPool(n);
  g_pool_size = n;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Warp: batch similarity/homography warp, uint8 HWC -> float32 CHW, /255.
// images: (B, H, W, C) uint8; homo: (B, 3, 3) row-major; out: (B, C, OH, OW).
// ---------------------------------------------------------------------------
void jrr_warp_batch(const uint8_t* images, int64_t b, int h, int w, int c,
                    const float* homo, float* out, int oh, int ow,
                    int num_threads) {
  EnsurePool(num_threads > 0 ? num_threads : 1);
  std::atomic<int64_t> done{0};
  std::mutex mu;
  std::condition_variable cv;

  for (int64_t i = 0; i < b; ++i) {
    g_pool->Submit([&, i] {
      const uint8_t* img = images + i * static_cast<int64_t>(h) * w * c;
      const float* m = homo + i * 9;
      float* dst = out + i * static_cast<int64_t>(c) * oh * ow;
      std::vector<float> px(c);
      for (int r = 0; r < oh; ++r) {
        const float gy = oh > 1 ? -1.f + 2.f * r / (oh - 1) : 0.f;
        for (int col = 0; col < ow; ++col) {
          const float gx = ow > 1 ? -1.f + 2.f * col / (ow - 1) : 0.f;
          const float zx = m[0] * gx + m[1] * gy + m[2];
          const float zy = m[3] * gx + m[4] * gy + m[5];
          const float zz = m[6] * gx + m[7] * gy + m[8] + 1e-8f;
          const float sx = zx / zz, sy = zy / zz;
          // grid -> source pixels, align_corners=False.
          const float fx = ((sx + 1.f) * w - 1.f) * 0.5f;
          const float fy = ((sy + 1.f) * h - 1.f) * 0.5f;
          SampleBilinear(img, h, w, c, fx, fy, px.data());
          for (int ch = 0; ch < c; ++ch) {
            dst[(static_cast<int64_t>(ch) * oh + r) * ow + col] =
                px[ch] / 255.f;
          }
        }
      }
      if (done.fetch_add(1) + 1 == b) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == b; });
}

// ---------------------------------------------------------------------------
// Pack file: open / close / query.
// ---------------------------------------------------------------------------
void* jrr_pack_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  auto* p = new Pack();
  p->fd = fd;
  p->base = static_cast<const uint8_t*>(base);
  p->size = st.st_size;
  std::memcpy(&p->hdr, base, sizeof(PackHeader));
  if (p->hdr.magic != kMagic) {
    munmap(base, st.st_size);
    close(fd);
    delete p;
    return nullptr;
  }
  p->frame_bytes =
      static_cast<size_t>(p->hdr.img_h) * p->hdr.img_w * p->hdr.img_c +
      static_cast<size_t>(p->hdr.mask_h) * p->hdr.mask_w;
  return p;
}

int64_t jrr_pack_num_frames(void* pack) {
  return static_cast<Pack*>(pack)->hdr.num_frames;
}

void jrr_pack_close(void* pack) {
  auto* p = static_cast<Pack*>(pack);
  munmap(const_cast<uint8_t*>(p->base), p->size);
  close(p->fd);
  delete p;
}

// ---------------------------------------------------------------------------
// Batch assembly: for each requested frame, warp the square bbox crop to the
// SPIN crop (spin_res²) and the image crop (img_res²), and copy the mask.
// bboxes: (B, 4) float (min_y, min_x, max_y, max_x) in source pixels.
// Outputs: spin (B, C, spin_res, spin_res), image (B, C, img_res, img_res),
// mask (B, mask_h, mask_w) float in [0, 1],
// crop_meta (B, 3) = (min_x_px, min_y_px, scale_norm).
// ---------------------------------------------------------------------------
void jrr_pack_load_batch(void* pack, const int64_t* indices, int64_t b,
                         const float* bboxes, float* spin_out, int spin_res,
                         float* image_out, int img_res, float* mask_out,
                         float* crop_meta, int num_threads) {
  auto* p = static_cast<Pack*>(pack);
  EnsurePool(num_threads > 0 ? num_threads : 1);
  std::atomic<int64_t> done{0};
  std::mutex mu;
  std::condition_variable cv;

  const int h = p->hdr.img_h, w = p->hdr.img_w, c = p->hdr.img_c;
  const int mh = p->hdr.mask_h, mw = p->hdr.mask_w;
  const float half = w / 2.0f;

  for (int64_t i = 0; i < b; ++i) {
    g_pool->Submit([&, i] {
      const int64_t fi = indices[i];
      const uint8_t* img = p->FrameImage(fi);
      const uint8_t* msk = p->FrameMask(fi);
      const float min_y = bboxes[i * 4 + 0], min_x = bboxes[i * 4 + 1];
      const float max_y = bboxes[i * 4 + 2], max_x = bboxes[i * 4 + 3];
      // Normalized crop math (reference: scripts/data.py:220-247).
      const float nminx = (min_x - half) / half, nmaxx = (max_x - half) / half;
      const float nminy = (min_y - half) / half, nmaxy = (max_y - half) / half;
      const float ax = (nminx + nmaxx) * 0.5f, ay = (nminy + nmaxy) * 0.5f;
      float scale = std::max(nmaxx - nminx, nmaxy - nminy) * 0.5f;
      // Similarity matrix R(0)·S(s,s)·T(ax/s, ay/s) = [[s,0,ax],[0,s,ay],[0,0,1]].
      const float m[9] = {scale, 0.f, ax, 0.f, scale, ay, 0.f, 0.f, 1.f};

      std::vector<float> px(c);
      auto warp_to = [&](float* dst, int res) {
        for (int r = 0; r < res; ++r) {
          const float gy = -1.f + 2.f * r / (res - 1);
          for (int col = 0; col < res; ++col) {
            const float gx = -1.f + 2.f * col / (res - 1);
            const float sx = m[0] * gx + m[2];
            const float sy = m[4] * gy + m[5];
            const float fx = ((sx + 1.f) * w - 1.f) * 0.5f;
            const float fy = ((sy + 1.f) * h - 1.f) * 0.5f;
            SampleBilinear(img, h, w, c, fx, fy, px.data());
            for (int ch = 0; ch < c; ++ch) {
              dst[(static_cast<int64_t>(ch) * res + r) * res + col] =
                  px[ch] / 255.f;
            }
          }
        }
      };
      warp_to(spin_out + i * static_cast<int64_t>(c) * spin_res * spin_res,
              spin_res);
      warp_to(image_out + i * static_cast<int64_t>(c) * img_res * img_res,
              img_res);

      float* mdst = mask_out + i * static_cast<int64_t>(mh) * mw;
      for (int64_t k = 0; k < static_cast<int64_t>(mh) * mw; ++k) {
        mdst[k] = msk[k] / 255.f;
      }
      crop_meta[i * 3 + 0] = (ax - scale) * half + half;  // min_x px
      crop_meta[i * 3 + 1] = (ay - scale) * half + half;  // min_y px
      crop_meta[i * 3 + 2] = scale;

      if (done.fetch_add(1) + 1 == b) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == b; });
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Pre-warped pack (v2): decode+warp paid ONCE at pack build; steady-state
// load is a straight u8→f32 conversion (effectively a memcpy) per crop.
//
// Layout: Pack2Header, then per frame
//   spin  crop  uint8 (C, spin_res, spin_res)   [CHW, warp already applied]
//   image crop  uint8 (C, img_res, img_res)
//   mask        uint8 (mask_h, mask_w)
//   meta        float32[3] = (min_x_px, min_y_px, scale_norm)
// The bbox is baked in at build time (the product's bboxes are static
// dataset tensors); u8 quantization of the warped crop costs ≤1/510 in
// [0,1] pixel units — the same LSB the source u8 frames already carry.
// ---------------------------------------------------------------------------

namespace {

struct Pack2Header {
  uint64_t magic;  // 'JRRPACK2'
  uint64_t num_frames;
  uint32_t spin_res, img_res, img_c;
  uint32_t mask_h, mask_w;
};
constexpr uint64_t kMagic2 = 0x324b434150525252ull;

struct Pack2 {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  Pack2Header hdr;
  size_t frame_bytes = 0;
  const uint8_t* Frame(int64_t i) const {
    return base + sizeof(Pack2Header) + i * frame_bytes;
  }
};

}  // namespace

extern "C" {

void* jrr_pack2_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  auto* p = new Pack2();
  p->fd = fd;
  p->base = static_cast<const uint8_t*>(base);
  p->size = st.st_size;
  std::memcpy(&p->hdr, base, sizeof(Pack2Header));
  if (p->hdr.magic != kMagic2) {
    munmap(base, st.st_size);
    close(fd);
    delete p;
    return nullptr;
  }
  const auto& h = p->hdr;
  p->frame_bytes =
      static_cast<size_t>(h.img_c) * h.spin_res * h.spin_res +
      static_cast<size_t>(h.img_c) * h.img_res * h.img_res +
      static_cast<size_t>(h.mask_h) * h.mask_w + 3 * sizeof(float);
  return p;
}

int64_t jrr_pack2_num_frames(void* pack) {
  return static_cast<Pack2*>(pack)->hdr.num_frames;
}

void jrr_pack2_close(void* pack) {
  auto* p = static_cast<Pack2*>(pack);
  munmap(const_cast<uint8_t*>(p->base), p->size);
  close(p->fd);
  delete p;
}

void jrr_pack2_load_batch(void* pack, const int64_t* indices, int64_t b,
                          float* spin_out, float* image_out, float* mask_out,
                          float* crop_meta, int num_threads) {
  auto* p = static_cast<Pack2*>(pack);
  EnsurePool(num_threads > 0 ? num_threads : 1);
  std::atomic<int64_t> done{0};
  std::mutex mu;
  std::condition_variable cv;

  const auto& h = p->hdr;
  const int64_t spin_n = static_cast<int64_t>(h.img_c) * h.spin_res * h.spin_res;
  const int64_t img_n = static_cast<int64_t>(h.img_c) * h.img_res * h.img_res;
  const int64_t mask_n = static_cast<int64_t>(h.mask_h) * h.mask_w;

  for (int64_t i = 0; i < b; ++i) {
    g_pool->Submit([&, i] {
      const uint8_t* f = p->Frame(indices[i]);
      const uint8_t* sp = f;
      const uint8_t* im = sp + spin_n;
      const uint8_t* mk = im + img_n;
      const float* mt = reinterpret_cast<const float*>(mk + mask_n);
      float* sdst = spin_out + i * spin_n;
      for (int64_t k = 0; k < spin_n; ++k) sdst[k] = sp[k] * (1.f / 255.f);
      float* idst = image_out + i * img_n;
      for (int64_t k = 0; k < img_n; ++k) idst[k] = im[k] * (1.f / 255.f);
      float* mdst = mask_out + i * mask_n;
      for (int64_t k = 0; k < mask_n; ++k) mdst[k] = mk[k] * (1.f / 255.f);
      std::memcpy(crop_meta + i * 3, mt, 3 * sizeof(float));
      if (done.fetch_add(1) + 1 == b) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == b; });
}

}  // extern "C"
