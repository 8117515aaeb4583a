// Native shard data loader for esa_pose_estimation_tpu.
//
// Role: the host-side input runtime.  The reference feeds training from
// per-image PNG reads in forked DataLoader workers (main.py:273,
// data_load4.py:47-51); for TPU-rate serving (>1k img/s of 1920x1200
// frames) the host path must be a packed sequential format with
// multithreaded decode.  This library reads "SPD1" shards (written by
// data/shards.py): a fixed-size record header per frame plus either raw
// uint8 pixels or a PNG payload, decoded here with libpng into
// caller-provided batch buffers.  A bounded producer/consumer pipeline of
// decode workers keeps batches ready ahead of the device step.
//
// C ABI (ctypes-friendly):
//   loader_open(path, batch, threads, shuffle, seed, drop_last) -> handle
//   loader_open2(..., crop_size)           -> handle (host-crop mode)
//   loader_meta(handle, out[6])            -> n, h, w, n_kp, compressed, bpr
//   loader_next(handle, frames, bbox, kp2d, quat, trans, names) -> count|0
//   loader_next_cropped(handle, crops, rate, origin, bbox, kp2d, quat,
//                       trans, names)      -> count|0 (crop mode)
//   loader_reset(handle, seed)             -> new epoch
//   loader_close(handle)
//
// Host-crop mode (crop_size > 0) moves the detector-box -> square crop ->
// bilinear resize stage onto the loader's worker threads (the reference
// puts the same stage in its CPU DataLoader, data_load4.py:110-166) and
// hands out (B, crop, crop) f32 crops + rate/origin.  That shrinks the
// host->device transfer ~36x (65 KB vs 2.3 MB per 1920x1200 frame), which
// matters whenever the host link — not the chip — is the bottleneck; raw
// shards additionally pread only the crop's row block off disk.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 shard_loader.cpp -lpng -lz -lpthread

#include <fcntl.h>
#include <png.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x31445053;  // "SPD1" little-endian
constexpr int kNameLen = 64;

#pragma pack(push, 1)
struct ShardHeader {
  uint32_t magic;
  uint32_t n_records;
  uint32_t height;
  uint32_t width;
  uint32_t n_kp;
  uint8_t compressed;  // 0 = raw uint8, 1 = PNG payload
};

struct RecordHeader {
  char name[kNameLen];
  float bbox[4];
  float quat[4];
  float trans[3];
  uint32_t payload_size;
};
#pragma pack(pop)

struct RecordIndex {
  uint64_t offset;  // file offset of RecordHeader
};

struct MemReader {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t count) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + count > r->size) {
    png_error(png, "png: read past end of payload");
  }
  std::memcpy(out, r->data + r->pos, count);
  r->pos += count;
}

// Decode an 8-bit grayscale PNG payload into dst (h*w bytes).
bool decode_png_gray(const uint8_t* payload, size_t size, uint8_t* dst,
                     uint32_t h, uint32_t w) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  MemReader reader{payload, size, 0};
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);

  png_uint_32 iw = png_get_image_width(png, info);
  png_uint_32 ih = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE) {
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  }
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  if (iw > w || ih > h) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  std::vector<png_bytep> rows(ih);
  // decode into the top-left corner of the dst frame (frames are padded
  // to the shard-wide h x w, mirroring BatchLoader._assemble).
  std::memset(dst, 0, static_cast<size_t>(h) * w);
  for (png_uint_32 y = 0; y < ih; ++y) rows[y] = dst + static_cast<size_t>(y) * w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

struct Batch {
  std::vector<uint8_t> frames;
  std::vector<float> crops;   // crop mode: (count, crop, crop) f32
  std::vector<float> rate;    // crop mode: (count,)
  std::vector<float> origin;  // crop mode: (count, 2) [x_new, y_new]
  std::vector<float> bbox;
  std::vector<float> kp2d;
  std::vector<float> quat;
  std::vector<float> trans;
  std::vector<char> names;
  int count = 0;
};

// ESA crop-box rule with exact Python-float semantics (C++ double IS the
// reference's f64, so no lookup-table tricks are needed here — contrast
// ops/crop.py:_kmul_table, which exists only because f32-on-device can't
// reproduce f64 truncation).  Mirrors ops/crop.py:adjust_bbox /
// reference data_load4.py:110-146.
struct CropBox {
  int x0, y0;      // origin
  int xs, ys;      // crop extent inside the frame
  int size;        // padded square side (rate = out / size)
};

CropBox esa_crop_box(const float* bbox, int img_w, int img_h, double k) {
  double x1 = bbox[0], y1 = bbox[1], x2 = bbox[2], y2 = bbox[3];
  long long c0 = static_cast<long long>((x1 + x2) / 2.0);
  long long c1 = static_cast<long long>((y1 + y2) / 2.0);
  long long half = static_cast<long long>(std::max(x2 - x1, y2 - y1) / 2.0);
  long long x_new = static_cast<long long>(c0 - k * static_cast<double>(half));
  long long y_new = static_cast<long long>(c1 - k * static_cast<double>(half));
  long long w_new = static_cast<long long>(c0 + k * static_cast<double>(half));
  long long h_new = static_cast<long long>(c1 + k * static_cast<double>(half));
  if (w_new - x_new != h_new - y_new) h_new = y_new + (w_new - x_new);
  if (x_new < 0) { w_new -= x_new; x_new = 0; }
  if (y_new < 0) { h_new -= y_new; y_new = 0; }
  if (w_new > img_w) { x_new = std::max<long long>(x_new + img_w - w_new, 0); w_new = img_w; }
  if (h_new > img_h) { y_new = std::max<long long>(y_new + img_h - h_new, 0); h_new = img_h; }
  CropBox cb;
  cb.x0 = static_cast<int>(x_new);
  cb.y0 = static_cast<int>(y_new);
  cb.xs = static_cast<int>(w_new - x_new);
  cb.ys = static_cast<int>(h_new - y_new);
  // Degenerate (zero-area / inverted / out-of-frame) boxes must not
  // produce negative extents: scale 0 and xs-1 == -1 would index before
  // the buffer in resample_crop (the Python tent-weight path is finite
  // on the same input).  Clamp to a 1px in-frame window.
  cb.x0 = std::min(std::max(cb.x0, 0), img_w - 1);
  cb.y0 = std::min(std::max(cb.y0, 0), img_h - 1);
  cb.xs = std::min(std::max(cb.xs, 1), img_w - cb.x0);
  cb.ys = std::min(std::max(cb.ys, 1), img_h - cb.y0);
  cb.size = std::max(cb.xs, cb.ys);
  return cb;
}

// Bilinear-resample the crop window to (out, out) f32, edge-clamped —
// identical sampling rule to ops/crop.py:crop_resize_from_boxes (cv2
// INTER_LINEAR half-pixel convention; clamping reproduces edge padding).
// Non-square clamped windows reproduce the reference's SWAPPED pad
// widths exactly (np.pad(image, ((0, size-xsize), (0, size-ysize))),
// data_load4.py:151 — rows padded by the width deficit): each axis is
// scaled by its own padded extent and edge-clamped to the true extent.
// src points at row y0 of the frame (row stride = width).
void resample_crop(const uint8_t* src, int width, const CropBox& cb,
                   int out, float* dst) {
  std::vector<int> xi0(out), xi1(out), yi0(out), yi1(out);
  std::vector<float> xf(out), yf(out);
  double pad_w = static_cast<double>(cb.xs + (cb.size - cb.ys));
  double pad_h = static_cast<double>(cb.ys + (cb.size - cb.xs));
  double scale_x = pad_w / out;
  double scale_y = pad_h / out;
  for (int i = 0; i < out; ++i) {
    double gx = (i + 0.5) * scale_x - 0.5;
    double gy = (i + 0.5) * scale_y - 0.5;
    double sx = std::min(std::max(gx, 0.0), static_cast<double>(cb.xs - 1));
    double sy = std::min(std::max(gy, 0.0), static_cast<double>(cb.ys - 1));
    int fx = static_cast<int>(sx), fy = static_cast<int>(sy);
    xi0[i] = fx;
    xi1[i] = std::min(fx + 1, cb.xs - 1);
    xf[i] = static_cast<float>(sx - fx);
    yi0[i] = fy;
    yi1[i] = std::min(fy + 1, cb.ys - 1);
    yf[i] = static_cast<float>(sy - fy);
  }
  for (int y = 0; y < out; ++y) {
    const uint8_t* r0 = src + static_cast<size_t>(yi0[y]) * width + cb.x0;
    const uint8_t* r1 = src + static_cast<size_t>(yi1[y]) * width + cb.x0;
    float wy = yf[y];
    float* o = dst + static_cast<size_t>(y) * out;
    for (int x = 0; x < out; ++x) {
      float wx = xf[x];
      float top = r0[xi0[x]] * (1.0f - wx) + r0[xi1[x]] * wx;
      float bot = r1[xi0[x]] * (1.0f - wx) + r1[xi1[x]] * wx;
      o[x] = top * (1.0f - wy) + bot * wy;
    }
  }
}

// Read exactly n bytes at offset via positional reads (thread-safe on one
// fd, no seek state, no mutex — lets every decode worker read its own
// records in parallel).
bool pread_full(int fd, void* dst, size_t n, uint64_t off) {
  uint8_t* p = static_cast<uint8_t*>(dst);
  while (n > 0) {
    ssize_t got = ::pread(fd, p, n, static_cast<off_t>(off));
    if (got <= 0) return false;
    p += got;
    off += static_cast<uint64_t>(got);
    n -= static_cast<size_t>(got);
  }
  return true;
}

class Loader {
 public:
  Loader(int fd, ShardHeader hdr, std::vector<RecordIndex> index,
         int batch_size, int n_threads, bool shuffle, uint64_t seed,
         bool drop_last, int crop_size = 0)
      : fd_(fd),
        hdr_(hdr),
        index_(std::move(index)),
        batch_size_(batch_size),
        n_threads_(std::max(1, n_threads)),
        shuffle_(shuffle),
        drop_last_(drop_last),
        crop_size_(crop_size) {
    reset(seed);
  }

  ~Loader() { stop(); ::close(fd_); }

  const ShardHeader& header() const { return hdr_; }
  int batch_size() const { return batch_size_; }

  void reset(uint64_t seed) {
    stop();
    order_.resize(index_.size());
    for (size_t i = 0; i < order_.size(); ++i) order_[i] = i;
    if (shuffle_) {
      std::mt19937_64 rng(seed);
      std::shuffle(order_.begin(), order_.end(), rng);
    }
    next_batch_start_ = 0;
    epoch_done_ = false;
    stopping_ = false;
    error_ = false;
    producer_ = std::thread([this] { produce(); });
  }

  // Returns the number of records copied (0 = epoch finished).
  int next(uint8_t* frames, float* bbox, float* kp2d, float* quat,
           float* trans, char* names) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_ready_.wait(lk, [this] { return !ready_.empty() || epoch_done_; });
    if (ready_.empty()) return error_ ? -1 : 0;
    std::unique_ptr<Batch> b = std::move(ready_.front());
    ready_.pop();
    lk.unlock();
    cv_space_.notify_one();

    size_t frame_bytes = static_cast<size_t>(hdr_.height) * hdr_.width;
    int count = b->count;
    std::memcpy(frames, b->frames.data(), count * frame_bytes);
    std::memcpy(bbox, b->bbox.data(), count * 4 * sizeof(float));
    std::memcpy(kp2d, b->kp2d.data(),
                count * hdr_.n_kp * 2 * sizeof(float));
    std::memcpy(quat, b->quat.data(), count * 4 * sizeof(float));
    std::memcpy(trans, b->trans.data(), count * 3 * sizeof(float));
    std::memcpy(names, b->names.data(), count * kNameLen);
    {
      // recycle the buffers for the producer
      std::lock_guard<std::mutex> lk2(mu_);
      if (free_.size() < 4) free_.push_back(std::move(b));
    }
    return count;
  }

  // Crop-mode variant: hands out host-resampled (count, crop, crop) f32
  // crops plus rate/origin instead of full frames.
  int next_cropped(float* crops, float* rate, float* origin, float* bbox,
                   float* kp2d, float* quat, float* trans, char* names) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_ready_.wait(lk, [this] { return !ready_.empty() || epoch_done_; });
    if (ready_.empty()) return error_ ? -1 : 0;
    std::unique_ptr<Batch> b = std::move(ready_.front());
    ready_.pop();
    lk.unlock();
    cv_space_.notify_one();

    size_t crop_px = static_cast<size_t>(crop_size_) * crop_size_;
    int count = b->count;
    std::memcpy(crops, b->crops.data(), count * crop_px * sizeof(float));
    std::memcpy(rate, b->rate.data(), count * sizeof(float));
    std::memcpy(origin, b->origin.data(), count * 2 * sizeof(float));
    std::memcpy(bbox, b->bbox.data(), count * 4 * sizeof(float));
    std::memcpy(kp2d, b->kp2d.data(),
                count * hdr_.n_kp * 2 * sizeof(float));
    std::memcpy(quat, b->quat.data(), count * 4 * sizeof(float));
    std::memcpy(trans, b->trans.data(), count * 3 * sizeof(float));
    std::memcpy(names, b->names.data(), count * kNameLen);
    {
      std::lock_guard<std::mutex> lk2(mu_);
      if (free_.size() < 4) free_.push_back(std::move(b));
    }
    return count;
  }

 private:
  void stop() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stopping_ = true;
    }
    cv_space_.notify_all();
    cv_ready_.notify_all();
    if (producer_.joinable()) producer_.join();
    std::queue<std::unique_ptr<Batch>>().swap(ready_);
    std::vector<std::unique_ptr<Batch>>().swap(free_);
  }

  // Grab a recycled batch buffer or allocate one (capacity persists across
  // the epoch, so the big frame buffer is touched once, not re-zeroed per
  // batch — the old per-batch vector churn measured ~6x slower than disk).
  std::unique_ptr<Batch> acquire_batch(size_t count, size_t frame_bytes) {
    std::unique_ptr<Batch> b;
    {
      std::lock_guard<std::mutex> lk(mu_);
      if (!free_.empty()) {
        b = std::move(free_.back());
        free_.pop_back();
      }
    }
    if (!b) b = std::make_unique<Batch>();
    b->count = static_cast<int>(count);
    if (crop_size_ > 0) {
      b->crops.resize(count * static_cast<size_t>(crop_size_) * crop_size_);
      b->rate.resize(count);
      b->origin.resize(count * 2);
    } else {
      b->frames.resize(count * frame_bytes);
    }
    b->bbox.resize(count * 4);
    b->kp2d.resize(count * hdr_.n_kp * 2);
    b->quat.resize(count * 4);
    b->trans.resize(count * 3);
    b->names.resize(count * kNameLen);
    return b;
  }

  void produce() {
    size_t n = order_.size();
    size_t frame_bytes = static_cast<size_t>(hdr_.height) * hdr_.width;
    size_t kp_bytes = static_cast<size_t>(hdr_.n_kp) * 2 * sizeof(float);
    for (size_t start = 0; start < n; start += batch_size_) {
      size_t count = std::min<size_t>(batch_size_, n - start);
      if (drop_last_ && count < static_cast<size_t>(batch_size_)) break;

      std::unique_ptr<Batch> b = acquire_batch(count, frame_bytes);

      // Every worker preads + decodes its own records: positional reads
      // need no file mutex, and the raw-uint8 path lands pixels straight
      // in the batch frame buffer (zero intermediate copies).
      std::atomic<size_t> cursor{0};
      std::atomic<bool> io_error{false};
      auto work = [&] {
        std::vector<uint8_t> scratch;        // PNG payloads
        std::vector<uint8_t> frame_scratch;  // crop-mode pixel staging
        size_t i;
        // stop promptly once ANY worker hit an error: without the check
        // the remaining threads decode the rest of the batch before the
        // failure is surfaced (wasted work, delayed error)
        while (!io_error.load(std::memory_order_relaxed) &&
               (i = cursor.fetch_add(1)) < count) {
          const RecordIndex& ri = index_[order_[start + i]];
          RecordHeader rh;
          if (!pread_full(fd_, &rh, sizeof(rh), ri.offset)) {
            io_error.store(true);
            return;
          }
          std::memcpy(b->names.data() + i * kNameLen, rh.name, kNameLen);
          std::memcpy(b->bbox.data() + i * 4, rh.bbox, 4 * sizeof(float));
          std::memcpy(b->quat.data() + i * 4, rh.quat, 4 * sizeof(float));
          std::memcpy(b->trans.data() + i * 3, rh.trans, 3 * sizeof(float));
          // payload = [kp2d f32 * n_kp*2][pixel data]
          uint64_t payload_off = ri.offset + sizeof(RecordHeader);
          if (!pread_full(fd_, b->kp2d.data() + i * hdr_.n_kp * 2, kp_bytes,
                          payload_off)) {
            io_error.store(true);
            return;
          }
          size_t px_size = rh.payload_size - kp_bytes;
          uint64_t px_off = payload_off + kp_bytes;
          if (crop_size_ > 0) {
            // host-crop path: resample the box window straight out of the
            // record; raw shards pread ONLY the crop's row block (typically
            // ~40% of the frame), PNG shards decode the full frame first
            CropBox cb = esa_crop_box(rh.bbox, hdr_.width, hdr_.height,
                                      1.05);
            const uint8_t* src;
            if (hdr_.compressed) {
              frame_scratch.resize(frame_bytes);
              scratch.resize(px_size);
              if (!pread_full(fd_, scratch.data(), px_size, px_off)) {
                io_error.store(true);
                return;
              }
              if (!decode_png_gray(scratch.data(), px_size,
                                   frame_scratch.data(), hdr_.height,
                                   hdr_.width)) {
                io_error.store(true);  // corrupt PNG: stale pixels would
                return;                // pair with THIS record's labels
              }
              src = frame_scratch.data() +
                    static_cast<size_t>(cb.y0) * hdr_.width;
            } else {
              size_t row_block = static_cast<size_t>(cb.ys) * hdr_.width;
              frame_scratch.resize(row_block);
              if (!pread_full(fd_, frame_scratch.data(), row_block,
                              px_off + static_cast<size_t>(cb.y0) *
                                           hdr_.width)) {
                io_error.store(true);
                return;
              }
              src = frame_scratch.data();
            }
            size_t crop_px = static_cast<size_t>(crop_size_) * crop_size_;
            resample_crop(src, hdr_.width, cb, crop_size_,
                          b->crops.data() + i * crop_px);
            b->rate[i] = static_cast<float>(crop_size_) / cb.size;
            b->origin[i * 2] = static_cast<float>(cb.x0);
            b->origin[i * 2 + 1] = static_cast<float>(cb.y0);
            continue;
          }
          uint8_t* dst = b->frames.data() + i * frame_bytes;
          if (hdr_.compressed) {
            scratch.resize(px_size);
            if (!pread_full(fd_, scratch.data(), px_size, px_off)) {
              io_error.store(true);
              return;
            }
            if (!decode_png_gray(scratch.data(), px_size, dst, hdr_.height,
                                 hdr_.width)) {
              io_error.store(true);
              return;
            }
          } else {
            if (!pread_full(fd_, dst, std::min(px_size, frame_bytes),
                            px_off)) {
              io_error.store(true);
              return;
            }
          }
        }
      };
      std::vector<std::thread> pool;
      for (int t = 0; t < n_threads_ - 1; ++t) pool.emplace_back(work);
      work();
      for (auto& t : pool) t.join();
      if (io_error.load()) {
        // An I/O or decode error must NOT look like a clean end of
        // epoch: record it so next() can return -1 instead of 0.
        std::lock_guard<std::mutex> lk(mu_);
        error_ = true;
        break;
      }

      std::unique_lock<std::mutex> lk(mu_);
      cv_space_.wait(lk, [this] { return ready_.size() < 3 || stopping_; });
      if (stopping_) return;
      ready_.push(std::move(b));
      lk.unlock();
      cv_ready_.notify_one();
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      epoch_done_ = true;
    }
    cv_ready_.notify_all();
  }

  int fd_;
  ShardHeader hdr_;
  std::vector<RecordIndex> index_;
  std::vector<size_t> order_;
  int batch_size_;
  int n_threads_;
  bool shuffle_;
  bool drop_last_;
  int crop_size_;  // 0 = full frames, >0 = host-cropped f32 output

  std::mutex mu_;
  std::condition_variable cv_ready_, cv_space_;
  std::queue<std::unique_ptr<Batch>> ready_;
  std::vector<std::unique_ptr<Batch>> free_;
  std::thread producer_;
  bool epoch_done_ = false;
  bool stopping_ = false;
  bool error_ = false;  // producer hit an I/O or decode failure
  size_t next_batch_start_ = 0;
};

}  // namespace

extern "C" {

// Record-subrange open: the loader serves only records
// [rec_start, rec_start + rec_count) of the shard.  This is the
// multi-host ingest contract — process i of P opens its contiguous
// slice of the shared shard file, so P hosts stream disjoint data with
// no coordination (the reference's DataLoader has no such notion; its
// DataParallel is single-process, main.py:254).  rec_count == 0 means
// "to the end".
void* loader_open3(const char* path, int batch_size, int n_threads,
                   int shuffle, uint64_t seed, int drop_last, int crop_size,
                   uint64_t rec_start, uint64_t rec_count) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  ShardHeader hdr;
  if (!pread_full(fd, &hdr, sizeof(hdr), 0) || hdr.magic != kMagic) {
    ::close(fd);
    return nullptr;
  }
  if (rec_start > hdr.n_records) {
    ::close(fd);
    return nullptr;
  }
  uint64_t avail = hdr.n_records - rec_start;
  uint64_t take = (rec_count == 0) ? avail : std::min(rec_count, avail);
  std::vector<RecordIndex> index;
  index.reserve(take);
  uint64_t off = sizeof(ShardHeader);
  for (uint64_t i = 0; i < rec_start + take; ++i) {
    RecordHeader rh;
    if (!pread_full(fd, &rh, sizeof(rh), off)) {
      ::close(fd);
      return nullptr;
    }
    if (i >= rec_start) index.push_back({off});
    off += sizeof(RecordHeader) + rh.payload_size;
  }
  return new Loader(fd, hdr, std::move(index), batch_size, n_threads,
                    shuffle != 0, seed, drop_last != 0, crop_size);
}

void* loader_open2(const char* path, int batch_size, int n_threads,
                   int shuffle, uint64_t seed, int drop_last,
                   int crop_size) {
  return loader_open3(path, batch_size, n_threads, shuffle, seed, drop_last,
                      crop_size, 0, 0);
}

void* loader_open(const char* path, int batch_size, int n_threads,
                  int shuffle, uint64_t seed, int drop_last) {
  return loader_open2(path, batch_size, n_threads, shuffle, seed, drop_last,
                      0);
}

void loader_meta(void* handle, uint32_t* out) {
  Loader* l = static_cast<Loader*>(handle);
  const ShardHeader& h = l->header();
  out[0] = h.n_records;
  out[1] = h.height;
  out[2] = h.width;
  out[3] = h.n_kp;
  out[4] = h.compressed;
  out[5] = static_cast<uint32_t>(l->batch_size());
}

int loader_next(void* handle, uint8_t* frames, float* bbox, float* kp2d,
                float* quat, float* trans, char* names) {
  return static_cast<Loader*>(handle)->next(frames, bbox, kp2d, quat, trans,
                                            names);
}

int loader_next_cropped(void* handle, float* crops, float* rate,
                        float* origin, float* bbox, float* kp2d, float* quat,
                        float* trans, char* names) {
  return static_cast<Loader*>(handle)->next_cropped(
      crops, rate, origin, bbox, kp2d, quat, trans, names);
}

void loader_reset(void* handle, uint64_t seed) {
  static_cast<Loader*>(handle)->reset(seed);
}

void loader_close(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
