// avsumio — native media runtime for the avsum_tpu framework.
//
// Host-side hot path: Y4M demux (mmap, zero-copy plane views), YUV420->RGB
// conversion, and a background prefetch thread that decodes frame blocks
// while the TPU consumes the previous block. This is the TPU-native
// analogue of the reference's cv2/ffmpeg decode layer (which the single
// host core would otherwise serialize against device compute).
//
// C ABI (consumed via ctypes from avsum_tpu/io/native.py):
//   avsumio_y4m_open / info / read_rgb / close
//   avsumio_prefetch_start / next / stop

#include <atomic>
#include <cctype>
#include <cerrno>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Block {
  long first_index = 0;
  long count = 0;
  std::vector<uint8_t> rgb;  // [count, H, W, 3]
};

struct Y4M {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_size = 0;

  int width = 0;
  int height = 0;
  double fps = 30.0;
  long n_frames = 0;
  size_t data_start = 0;
  size_t ysize = 0;
  size_t csize = 0;
  size_t frame_bytes = 0;  // includes "FRAME\n"
  int chroma_div_h = 2, chroma_div_w = 2;
  // log2 of the divs (1/2/4 only): per-pixel x / chroma_div_w lowers to
  // a hardware idiv (~20-40 cycles) — a shift keeps decode vectorizable
  int chroma_shift_h = 1, chroma_shift_w = 1;

  // prefetch state
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::deque<Block> queue;
  std::atomic<bool> stop_flag{false};
  bool running = false;
  long pf_block = 0, pf_start = 0, pf_stop = 0, pf_stride = 1;
};

// BT.601 full-range YCbCr -> RGB with 16.16 fixed point.
inline void yuv_to_rgb_row(const uint8_t* y, const uint8_t* u_row,
                           const uint8_t* v_row, int width, int chroma_shift_w,
                           uint8_t* out) {
  for (int x = 0; x < width; ++x) {
    int Y = y[x];
    int U = u_row[x >> chroma_shift_w] - 128;
    int V = v_row[x >> chroma_shift_w] - 128;
    // r = Y + 1.402 V ; g = Y - 0.344136 U - 0.714136 V ; b = Y + 1.772 U
    int r = Y + ((91881 * V) >> 16);
    int g = Y - ((22554 * U + 46802 * V) >> 16);
    int b = Y + ((116130 * U) >> 16);
    out[3 * x + 0] = (uint8_t)(r < 0 ? 0 : (r > 255 ? 255 : r));
    out[3 * x + 1] = (uint8_t)(g < 0 ? 0 : (g > 255 ? 255 : g));
    out[3 * x + 2] = (uint8_t)(b < 0 ? 0 : (b > 255 ? 255 : b));
  }
}

void decode_frame(const Y4M* r, long index, uint8_t* out) {
  const uint8_t* frame = r->map + r->data_start + (size_t)index * r->frame_bytes;
  // skip "FRAME" line (may carry params, ends with \n)
  const uint8_t* nl =
      (const uint8_t*)memchr(frame, '\n', r->frame_bytes);
  const uint8_t* yp = nl + 1;
  const uint8_t* up = yp + r->ysize;
  const uint8_t* vp = up + r->csize;
  int cw = r->width / r->chroma_div_w;
  for (int row = 0; row < r->height; ++row) {
    const uint8_t* u_row = up + (size_t)(row >> r->chroma_shift_h) * cw;
    const uint8_t* v_row = vp + (size_t)(row >> r->chroma_shift_h) * cw;
    yuv_to_rgb_row(yp + (size_t)row * r->width, u_row, v_row, r->width,
                   r->chroma_shift_w, out + (size_t)row * r->width * 3);
  }
}

// Nearest-neighbor scaled decode (PySceneDetect-style downscale: frames
// are subsampled, not filtered, before content scoring).
void decode_frame_scaled(const Y4M* r, long index, int scale, uint8_t* out) {
  const uint8_t* frame = r->map + r->data_start + (size_t)index * r->frame_bytes;
  const uint8_t* nl = (const uint8_t*)memchr(frame, '\n', r->frame_bytes);
  const uint8_t* yp = nl + 1;
  const uint8_t* up = yp + r->ysize;
  const uint8_t* vp = up + r->csize;
  int cw = r->width / r->chroma_div_w;
  int oh = r->height / scale, ow = r->width / scale;
  for (int row = 0; row < oh; ++row) {
    int src_row = row * scale;
    const uint8_t* y_row = yp + (size_t)src_row * r->width;
    const uint8_t* u_row = up + (size_t)(src_row >> r->chroma_shift_h) * cw;
    const uint8_t* v_row = vp + (size_t)(src_row >> r->chroma_shift_h) * cw;
    uint8_t* o = out + (size_t)row * ow * 3;
    for (int x = 0; x < ow; ++x) {
      int sx = x * scale;
      int Y = y_row[sx];
      int U = u_row[sx >> r->chroma_shift_w] - 128;
      int V = v_row[sx >> r->chroma_shift_w] - 128;
      int rr = Y + ((91881 * V) >> 16);
      int gg = Y - ((22554 * U + 46802 * V) >> 16);
      int bb = Y + ((116130 * U) >> 16);
      o[3 * x + 0] = (uint8_t)(rr < 0 ? 0 : (rr > 255 ? 255 : rr));
      o[3 * x + 1] = (uint8_t)(gg < 0 ? 0 : (gg > 255 ? 255 : gg));
      o[3 * x + 2] = (uint8_t)(bb < 0 ? 0 : (bb > 255 ? 255 : bb));
    }
  }
}

void prefetch_main(Y4M* r) {
  const size_t frame_rgb = (size_t)r->height * r->width * 3;
  long index = r->pf_start;
  while (!r->stop_flag.load() && index < r->pf_stop) {
    Block block;
    block.first_index = index;
    long count = 0;
    block.rgb.resize((size_t)r->pf_block * frame_rgb);
    while (count < r->pf_block && index < r->pf_stop) {
      decode_frame(r, index, block.rgb.data() + (size_t)count * frame_rgb);
      index += r->pf_stride;
      ++count;
    }
    block.count = count;
    std::unique_lock<std::mutex> lock(r->mu);
    r->cv_space.wait(lock, [r] {
      return r->queue.size() < 4 || r->stop_flag.load();
    });
    if (r->stop_flag.load()) return;
    r->queue.push_back(std::move(block));
    r->cv_ready.notify_one();
  }
  std::unique_lock<std::mutex> lock(r->mu);
  Block sentinel;  // count == 0 marks end-of-stream
  r->queue.push_back(std::move(sentinel));
  r->cv_ready.notify_one();
}

// OpenCV-convention HSV from RGB (float, H in [0,180), S/V in [0,255]) —
// must match avsum_tpu/ops/color.py::rgb_to_hsv_channels.
inline void rgb_to_hsv(float r, float g, float b, float* h, float* s,
                       float* v) {
  // Branchless (ternaries lower to vector selects under -O3): matches
  // avsum_tpu/ops/color.py::rgb_to_hsv_channels bit-for-bit semantics.
  float mx = r > g ? (r > b ? r : b) : (g > b ? g : b);
  float mn = r < g ? (r < b ? r : b) : (g < b ? g : b);
  float delta = mx - mn;
  *v = mx;
  *s = mx > 0.f ? 255.f * delta / mx : 0.f;
  float inv = delta > 0.f ? 60.f / delta : 0.f;
  float hh = mx == r ? (g - b) * inv
                     : (mx == g ? 120.f + (b - r) * inv
                                : 240.f + (r - g) * inv);
  hh = hh < 0.f ? hh + 360.f : hh;
  *h = delta > 0.f ? hh * 0.5f : 0.f;
}

// Planar scaled decode: YUV420 -> float R,G,B planes. The interleaved-u8
// rgb[3*i] gather of decode_frame_scaled defeats auto-vectorization of the
// HSV consumer; planar float outputs make the scoring loop below a
// textbook SIMD loop (measured ~3x on the coarse detection pass).
void decode_frame_scaled_planar(const Y4M* r, long index, int scale,
                                float* R, float* G, float* B,
                                uint8_t* row_scratch /* >= 3*(width/scale) */) {
  const uint8_t* frame = r->map + r->data_start + (size_t)index * r->frame_bytes;
  const uint8_t* nl = (const uint8_t*)memchr(frame, '\n', r->frame_bytes);
  const uint8_t* yp = nl + 1;
  const uint8_t* up = yp + r->ysize;
  const uint8_t* vp = up + r->csize;
  int cw = r->width / r->chroma_div_w;
  int oh = r->height / scale, ow = r->width / scale;
  uint8_t* ys = row_scratch;
  uint8_t* us = row_scratch + ow;
  uint8_t* vs = row_scratch + 2 * ow;
  for (int row = 0; row < oh; ++row) {
    int src_row = row * scale;
    const uint8_t* y_row = yp + (size_t)src_row * r->width;
    const uint8_t* u_row = up + (size_t)(src_row >> r->chroma_shift_h) * cw;
    const uint8_t* v_row = vp + (size_t)(src_row >> r->chroma_shift_h) * cw;
    // phase 1: subsample into contiguous row buffers (cheap byte copies)
    for (int x = 0; x < ow; ++x) {
      int sx = x * scale;
      ys[x] = y_row[sx];
      int cx = sx >> r->chroma_shift_w;
      us[x] = u_row[cx];
      vs[x] = v_row[cx];
    }
    // phase 2: contiguous YUV -> planar float RGB (SIMD: unit-stride u8
    // loads, integer math, converts — this is where the per-pixel work is)
    size_t o = (size_t)row * ow;
#pragma omp simd
    for (int x = 0; x < ow; ++x) {
      int Y = ys[x];
      int U = us[x] - 128;
      int V = vs[x] - 128;
      int rr = Y + ((91881 * V) >> 16);
      int gg = Y - ((22554 * U + 46802 * V) >> 16);
      int bb = Y + ((116130 * U) >> 16);
      R[o + x] = (float)(rr < 0 ? 0 : (rr > 255 ? 255 : rr));
      G[o + x] = (float)(gg < 0 ? 0 : (gg > 255 ? 255 : gg));
      B[o + x] = (float)(bb < 0 ? 0 : (bb > 255 ? 255 : bb));
    }
  }
}

// Host-side ContentDetector scores: decode (scaled), HSV, mean |diff| per
// channel vs previous frame, average channels. Runs at memory bandwidth on
// the host so NO frame bytes cross the (slow) host->TPU link for shot
// detection. out[0] = 0, out[t] = score of frame start+t.
//
// The HSV+diff pass is fused and written without trapping divides (safe
// denominators: s = delta * (255/max(mx,1)) is exact-zero whenever the
// guarded form is, same for hue) so gcc -O3 -march=native vectorizes the
// whole loop (vdivps + blends). Scores can differ from the guarded scalar
// form by ~1 ulp; cut decisions are pinned exact in
// tests/test_fast_paths.py::test_native_content_scores_same_cuts_as_device.
int content_scores_impl(Y4M* r, long start, long stop, int scale,
                        float* out) {
  if (stop > r->n_frames) stop = r->n_frames;
  if (start < 0 || start >= stop || scale < 1) return -1;
  int oh = r->height / scale, ow = r->width / scale;
  size_t npix = (size_t)oh * ow;
  std::vector<float> R(npix), G(npix), B(npix);
  std::vector<uint8_t> scratch((size_t)ow * 3);
  std::vector<float> prev_h(npix, 0.f), prev_s(npix, 0.f), prev_v(npix, 0.f);
  std::vector<float> cur_h(npix), cur_s(npix), cur_v(npix);
  for (long t = start; t < stop; ++t) {
    decode_frame_scaled_planar(r, t, scale, R.data(), G.data(), B.data(),
                               scratch.data());
    // fused HSV + |diff| (float partials summed into doubles per 4K chunk
    // to keep accumulation error bounded; first frame's diff is discarded)
    double total = 0.0;
    float* __restrict ch = cur_h.data();
    float* __restrict cs = cur_s.data();
    float* __restrict cv = cur_v.data();
    const float* __restrict ph = prev_h.data();
    const float* __restrict ps = prev_s.data();
    const float* __restrict pv = prev_v.data();
    const float* __restrict Rp = R.data();
    const float* __restrict Gp = G.data();
    const float* __restrict Bp = B.data();
    for (size_t base = 0; base < npix; base += 4096) {
      size_t end = base + 4096 < npix ? base + 4096 : npix;
      float part = 0.f;
      // simd reduction: gcc will not vectorize a float sum without an
      // explicit associativity grant (-fopenmp-simd + this pragma)
#pragma omp simd reduction(+ : part)
      for (size_t i = base; i < end; ++i) {
        float rf = Rp[i], gf = Gp[i], bf = Bp[i];
        float mx = rf > gf ? (rf > bf ? rf : bf) : (gf > bf ? gf : bf);
        float mn = rf < gf ? (rf < bf ? rf : bf) : (gf < bf ? gf : bf);
        float delta = mx - mn;
        float s = delta * (255.f / (mx > 0.f ? mx : 1.f));
        float inv = 60.f / (delta > 0.f ? delta : 1.f);
        float hh = mx == rf ? (gf - bf) * inv
                            : (mx == gf ? 120.f + (bf - rf) * inv
                                        : 240.f + (rf - gf) * inv);
        hh = hh < 0.f ? hh + 360.f : hh;
        float h = delta > 0.f ? hh * 0.5f : 0.f;
        ch[i] = h; cs[i] = s; cv[i] = mx;
        part += fabsf(h - ph[i]) + fabsf(s - ps[i]) + fabsf(mx - pv[i]);
      }
      total += part;
    }
    out[t - start] = t == start ? 0.f : (float)(total / (3.0 * (double)npix));
    cur_h.swap(prev_h); cur_s.swap(prev_s); cur_v.swap(prev_v);
  }
  return 0;
}

}  // namespace

extern "C" {

void* avsumio_y4m_open(const char* path) {
  Y4M* r = new Y4M();
  r->fd = open(path, O_RDONLY);
  if (r->fd < 0) {
    delete r;
    return nullptr;
  }
  struct stat st;
  if (fstat(r->fd, &st) != 0) {
    close(r->fd);
    delete r;
    return nullptr;
  }
  r->map_size = (size_t)st.st_size;
  r->map = (const uint8_t*)mmap(nullptr, r->map_size, PROT_READ, MAP_PRIVATE,
                                r->fd, 0);
  if (r->map == MAP_FAILED) {
    close(r->fd);
    delete r;
    return nullptr;
  }
  madvise((void*)r->map, r->map_size, MADV_SEQUENTIAL);

  const uint8_t* nl = (const uint8_t*)memchr(r->map, '\n', r->map_size);
  if (!nl) {
    munmap((void*)r->map, r->map_size);
    close(r->fd);
    delete r;
    return nullptr;
  }
  std::string header((const char*)r->map, (size_t)(nl - r->map));
  if (header.rfind("YUV4MPEG2", 0) != 0) {
    munmap((void*)r->map, r->map_size);
    close(r->fd);
    delete r;
    return nullptr;
  }
  r->chroma_div_h = 2;
  r->chroma_div_w = 2;
  size_t pos = 0;
  while (pos < header.size()) {
    size_t sp = header.find(' ', pos);
    std::string tok = header.substr(pos, sp == std::string::npos
                                             ? std::string::npos
                                             : sp - pos);
    if (!tok.empty()) {
      switch (tok[0]) {
        case 'W': r->width = atoi(tok.c_str() + 1); break;
        case 'H': r->height = atoi(tok.c_str() + 1); break;
        case 'F': {
          long num = 0, den = 1;
          sscanf(tok.c_str() + 1, "%ld:%ld", &num, &den);
          if (den > 0) r->fps = (double)num / (double)den;
          break;
        }
        case 'C':
          if (tok.rfind("C422", 0) == 0) { r->chroma_div_h = 1; r->chroma_div_w = 2; }
          else if (tok.rfind("C444", 0) == 0) { r->chroma_div_h = 1; r->chroma_div_w = 1; }
          r->chroma_shift_h = r->chroma_div_h == 2 ? 1 : 0;
          r->chroma_shift_w = r->chroma_div_w == 2 ? 1 : 0;
          break;
        default: break;
      }
    }
    if (sp == std::string::npos) break;
    pos = sp + 1;
  }
  if (r->width <= 0 || r->height <= 0) {
    munmap((void*)r->map, r->map_size);
    close(r->fd);
    delete r;
    return nullptr;
  }
  r->ysize = (size_t)r->width * r->height;
  r->csize = (size_t)(r->width / r->chroma_div_w) * (r->height / r->chroma_div_h);
  r->data_start = (size_t)(nl - r->map) + 1;
  // frame markers may carry params ("FRAME <params>\n"); fixed-stride seek
  // requires a constant header length — measure it from the first frame
  // (matches avsum_tpu/io/y4m.py; mixed-length headers are unsupported)
  const uint8_t* first = r->map + r->data_start;
  const uint8_t* fnl = (const uint8_t*)memchr(
      first, '\n', r->map_size - r->data_start);
  if (!fnl || memcmp(first, "FRAME", 5) != 0) {
    munmap((void*)r->map, r->map_size);
    close(r->fd);
    delete r;
    return nullptr;
  }
  size_t marker_len = (size_t)(fnl - first) + 1;
  r->frame_bytes = marker_len + r->ysize + 2 * r->csize;
  r->n_frames = (long)((r->map_size - r->data_start) / r->frame_bytes);
  return r;
}

void avsumio_y4m_info(void* handle, int* width, int* height, long* n_frames,
                      double* fps) {
  Y4M* r = (Y4M*)handle;
  *width = r->width;
  *height = r->height;
  *n_frames = r->n_frames;
  *fps = r->fps;
}

int avsumio_y4m_read_rgb(void* handle, const long* indices, long count,
                         void* out) {
  Y4M* r = (Y4M*)handle;
  const size_t frame_rgb = (size_t)r->height * r->width * 3;
  uint8_t* dst = (uint8_t*)out;
  for (long i = 0; i < count; ++i) {
    long idx = indices[i];
    if (idx < 0 || idx >= r->n_frames) return -1;
    decode_frame(r, idx, dst + (size_t)i * frame_rgb);
  }
  return 0;
}

int avsumio_y4m_read_rgb_scaled(void* handle, const long* indices, long count,
                                int scale, void* out) {
  Y4M* r = (Y4M*)handle;
  if (scale < 1) return -2;
  if (scale == 1) return avsumio_y4m_read_rgb(handle, indices, count, out);
  const size_t frame_rgb =
      (size_t)(r->height / scale) * (r->width / scale) * 3;
  uint8_t* dst = (uint8_t*)out;
  for (long i = 0; i < count; ++i) {
    long idx = indices[i];
    if (idx < 0 || idx >= r->n_frames) return -1;
    decode_frame_scaled(r, idx, scale, dst + (size_t)i * frame_rgb);
  }
  return 0;
}

int avsumio_content_scores(void* handle, long start, long stop, int scale,
                           float* out) {
  return content_scores_impl((Y4M*)handle, start, stop, scale, out);
}

// Raw YUV420 plane extraction (pure memcpy — no color conversion). The
// device does YUV->RGB; shipping planes instead of RGB halves the bytes
// over the host->TPU link. Buffers: y [count,H,W], u/v [count,H/2,W/2].
int avsumio_y4m_read_yuv(void* handle, const long* indices, long count,
                         void* y_out, void* u_out, void* v_out) {
  Y4M* r = (Y4M*)handle;
  if (r->chroma_div_h != 2 || r->chroma_div_w != 2) return -3;  // C420 only
  uint8_t* yd = (uint8_t*)y_out;
  uint8_t* ud = (uint8_t*)u_out;
  uint8_t* vd = (uint8_t*)v_out;
  for (long i = 0; i < count; ++i) {
    long idx = indices[i];
    if (idx < 0 || idx >= r->n_frames) return -1;
    const uint8_t* frame =
        r->map + r->data_start + (size_t)idx * r->frame_bytes;
    const uint8_t* nl = (const uint8_t*)memchr(frame, '\n', r->frame_bytes);
    const uint8_t* yp = nl + 1;
    memcpy(yd + (size_t)i * r->ysize, yp, r->ysize);
    memcpy(ud + (size_t)i * r->csize, yp + r->ysize, r->csize);
    memcpy(vd + (size_t)i * r->csize, yp + r->ysize + r->csize, r->csize);
  }
  return 0;
}

// Bilinear plane resize, half-pixel-centers convention (matches
// jax.image.resize(method="bilinear")), 8.8 fixed point weights.
static void build_resize_lut(int src, int dst, std::vector<int>& i0,
                             std::vector<int>& i1, std::vector<int>& w) {
  i0.resize(dst);
  i1.resize(dst);
  w.resize(dst);
  for (int x = 0; x < dst; ++x) {
    float sx = (x + 0.5f) * (float)src / (float)dst - 0.5f;
    if (sx < 0.f) sx = 0.f;
    int a = (int)sx;
    if (a > src - 1) a = src - 1;
    int b = a + 1 < src ? a + 1 : src - 1;
    i0[x] = a;
    i1[x] = b;
    w[x] = (int)((sx - (float)a) * 256.0f + 0.5f);
  }
}

static void resize_plane(const uint8_t* src, int sw, uint8_t* dst, int dw,
                         int dh, const std::vector<int>& x0,
                         const std::vector<int>& x1, const std::vector<int>& xw,
                         const std::vector<int>& y0, const std::vector<int>& y1,
                         const std::vector<int>& yw) {
  for (int y = 0; y < dh; ++y) {
    const uint8_t* r0 = src + (size_t)y0[y] * sw;
    const uint8_t* r1 = src + (size_t)y1[y] * sw;
    int wy = yw[y];
    uint8_t* o = dst + (size_t)y * dw;
    for (int x = 0; x < dw; ++x) {
      int wx = xw[x];
      int a = r0[x0[x]] * (256 - wx) + r0[x1[x]] * wx;
      int b = r1[x0[x]] * (256 - wx) + r1[x1[x]] * wx;
      o[x] = (uint8_t)((a * (256 - wy) + b * wy + 32768) >> 16);
    }
  }
}

// Resized YUV420 plane extraction: bilinear host resize to (out_w, out_h)
// BEFORE the host->TPU link — the backbones resize to 224/299 anyway, so
// shipping ~304x304 planes instead of full frames cuts transferred bytes
// by the source/target area ratio with no information the model would use.
// out_w/out_h must be even. Buffers: y [count,out_h,out_w],
// u/v [count,out_h/2,out_w/2].
int avsumio_y4m_read_yuv_resized(void* handle, const long* indices, long count,
                                 int out_w, int out_h, void* y_out,
                                 void* u_out, void* v_out) {
  Y4M* r = (Y4M*)handle;
  if (r->chroma_div_h != 2 || r->chroma_div_w != 2) return -3;  // C420 only
  if (out_w < 2 || out_h < 2 || (out_w % 2) || (out_h % 2)) return -2;
  int cw = r->width / 2, chh = r->height / 2;
  int ocw = out_w / 2, och = out_h / 2;
  std::vector<int> yx0, yx1, yxw, yy0, yy1, yyw;
  std::vector<int> cx0, cx1, cxw, cy0, cy1, cyw;
  build_resize_lut(r->width, out_w, yx0, yx1, yxw);
  build_resize_lut(r->height, out_h, yy0, yy1, yyw);
  build_resize_lut(cw, ocw, cx0, cx1, cxw);
  build_resize_lut(chh, och, cy0, cy1, cyw);
  const size_t oy = (size_t)out_w * out_h, oc = (size_t)ocw * och;
  uint8_t* yd = (uint8_t*)y_out;
  uint8_t* ud = (uint8_t*)u_out;
  uint8_t* vd = (uint8_t*)v_out;
  for (long i = 0; i < count; ++i) {
    long idx = indices[i];
    if (idx < 0 || idx >= r->n_frames) return -1;
    const uint8_t* frame =
        r->map + r->data_start + (size_t)idx * r->frame_bytes;
    const uint8_t* nl = (const uint8_t*)memchr(frame, '\n', r->frame_bytes);
    const uint8_t* yp = nl + 1;
    resize_plane(yp, r->width, yd + i * oy, out_w, out_h, yx0, yx1, yxw,
                 yy0, yy1, yyw);
    resize_plane(yp + r->ysize, cw, ud + i * oc, ocw, och, cx0, cx1, cxw,
                 cy0, cy1, cyw);
    resize_plane(yp + r->ysize + r->csize, cw, vd + i * oc, ocw, och, cx0,
                 cx1, cxw, cy0, cy1, cyw);
  }
  return 0;
}

int avsumio_prefetch_start(void* handle, long block_frames, long start,
                           long stop, long stride) {
  Y4M* r = (Y4M*)handle;
  if (r->running) return -1;
  if (block_frames <= 0 || stride <= 0) return -2;
  if (stop > r->n_frames) stop = r->n_frames;
  r->pf_block = block_frames;
  r->pf_start = start;
  r->pf_stop = stop;
  r->pf_stride = stride;
  r->stop_flag.store(false);
  r->queue.clear();
  r->worker = std::thread(prefetch_main, r);
  r->running = true;
  return 0;
}

long avsumio_prefetch_next(void* handle, void* out, long* first_index) {
  Y4M* r = (Y4M*)handle;
  if (!r->running) return -1;
  Block block;
  {
    std::unique_lock<std::mutex> lock(r->mu);
    r->cv_ready.wait(lock, [r] { return !r->queue.empty(); });
    block = std::move(r->queue.front());
    r->queue.pop_front();
    r->cv_space.notify_one();
  }
  if (block.count == 0) return 0;  // end of stream
  *first_index = block.first_index;
  memcpy(out, block.rgb.data(), block.rgb.size());
  return block.count;
}

void avsumio_prefetch_stop(void* handle) {
  Y4M* r = (Y4M*)handle;
  if (!r->running) return;
  r->stop_flag.store(true);
  r->cv_space.notify_all();
  if (r->worker.joinable()) r->worker.join();
  std::unique_lock<std::mutex> lock(r->mu);
  r->queue.clear();
  r->running = false;
}

void avsumio_y4m_close(void* handle) {
  Y4M* r = (Y4M*)handle;
  avsumio_prefetch_stop(r);
  if (r->map && r->map != MAP_FAILED) munmap((void*)r->map, r->map_size);
  if (r->fd >= 0) close(r->fd);
  delete r;
}

}  // extern "C"
