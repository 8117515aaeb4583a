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
//   loader_meta(handle, out[6])            -> n, h, w, n_kp, compressed, bpr
//   loader_next(handle, frames, bbox, kp2d, quat, trans, names) -> count|0
//   loader_reset(handle, seed)             -> new epoch
//   loader_close(handle)
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
  uint32_t payload_size;
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
  std::vector<float> bbox;
  std::vector<float> kp2d;
  std::vector<float> quat;
  std::vector<float> trans;
  std::vector<char> names;
  int count = 0;
};

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
         bool drop_last)
      : fd_(fd),
        hdr_(hdr),
        index_(std::move(index)),
        batch_size_(batch_size),
        n_threads_(std::max(1, n_threads)),
        shuffle_(shuffle),
        drop_last_(drop_last) {
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
    producer_ = std::thread([this] { produce(); });
  }

  // Returns the number of records copied (0 = epoch finished).
  int next(uint8_t* frames, float* bbox, float* kp2d, float* quat,
           float* trans, char* names) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_ready_.wait(lk, [this] { return !ready_.empty() || epoch_done_; });
    if (ready_.empty()) return 0;
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
    b->frames.resize(count * frame_bytes);
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
        std::vector<uint8_t> scratch;  // PNG payloads only
        size_t i;
        while ((i = cursor.fetch_add(1)) < count) {
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
          uint8_t* dst = b->frames.data() + i * frame_bytes;
          if (hdr_.compressed) {
            scratch.resize(px_size);
            if (!pread_full(fd_, scratch.data(), px_size,
                            payload_off + kp_bytes)) {
              io_error.store(true);
              return;
            }
            decode_png_gray(scratch.data(), px_size, dst, hdr_.height,
                            hdr_.width);
          } else {
            if (!pread_full(fd_, dst, std::min(px_size, frame_bytes),
                            payload_off + kp_bytes)) {
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
      if (io_error.load()) break;

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

  std::mutex mu_;
  std::condition_variable cv_ready_, cv_space_;
  std::queue<std::unique_ptr<Batch>> ready_;
  std::vector<std::unique_ptr<Batch>> free_;
  std::thread producer_;
  bool epoch_done_ = false;
  bool stopping_ = false;
  size_t next_batch_start_ = 0;
};

}  // namespace

extern "C" {

void* loader_open(const char* path, int batch_size, int n_threads,
                  int shuffle, uint64_t seed, int drop_last) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  ShardHeader hdr;
  if (!pread_full(fd, &hdr, sizeof(hdr), 0) || hdr.magic != kMagic) {
    ::close(fd);
    return nullptr;
  }
  std::vector<RecordIndex> index;
  index.reserve(hdr.n_records);
  uint64_t off = sizeof(ShardHeader);
  for (uint32_t i = 0; i < hdr.n_records; ++i) {
    RecordHeader rh;
    if (!pread_full(fd, &rh, sizeof(rh), off)) {
      ::close(fd);
      return nullptr;
    }
    index.push_back({off, rh.payload_size});
    off += sizeof(RecordHeader) + rh.payload_size;
  }
  return new Loader(fd, hdr, std::move(index), batch_size, n_threads,
                    shuffle != 0, seed, drop_last != 0);
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

void loader_reset(void* handle, uint64_t seed) {
  static_cast<Loader*>(handle)->reset(seed);
}

void loader_close(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
