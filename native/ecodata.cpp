// libecodata: native data plane for eco_tpu.
//
// C++ counterpart of the reference's C++ data stack (VideoDataLayer +
// DataTransformer + InternalThread prefetching,
// caffe_3d/src/caffe/layers/video_data_layer.cpp,
// src/caffe/data_transformer.cpp, base_data_layer.cpp): list parsing,
// uniform segment sampling, JPEG frame decode (OpenCV), multi-scale
// fixed-grid crop augmentation, mirror, mean-subtract -- all off the Python
// GIL on a worker pool, double-buffered so the accelerator never waits on
// the host.  Exposed as a plain C ABI for ctypes (no pybind11 in this
// image).
//
// Semantics match eco_tpu/data/{sampler,transform}.py (and through them the
// reference); RNG streams differ (std::mt19937_64 vs numpy) which only
// affects which random augmentation is drawn.

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <mutex>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Record {
  std::string path;
  int num_frames;
  int label;
};

struct Config {
  int batch = 8;
  int segments = 16;
  int new_length = 1;
  int crop = 224;
  int threads = 8;
  bool train = true;
  bool shuffle = true;
  std::string pattern = "img_%04d.jpg";
  float mean[3] = {104.f, 117.f, 123.f};
  bool fix_crop = true;
  bool more_fix_crop = true;
  bool multi_scale = true;
  int max_distort = 1;
  bool mirror = true;
  int new_height = 0;
  int new_width = 0;
  int rank = 0;
  int world = 1;
  // raw mode: emit resized uint8 frames + per-video (h_off, w_off, mirror)
  // augment decisions; crop/mirror/mean run on-device (Pallas).  Requires
  // new_height/new_width; only the fixed-crop-grid augmentation is
  // expressible on-device (matches VideoPipeline(raw=True)).
  bool raw = false;
};

// ---- sampling (video_data_layer.cpp:152-190 semantics) --------------------

void sample_offsets(int n_frames, const Config& c, std::mt19937_64& rng,
                    std::vector<int>* offsets) {
  // integer average_duration, matching the reference (lines_duration_ is
  // vector<int>, so video_data_layer.cpp:156 floors before widening)
  const int avg = n_frames / c.segments;
  offsets->clear();
  for (int i = 0; i < c.segments; ++i) {
    if (c.train) {
      if (avg >= c.new_length) {
        std::uniform_int_distribution<int> d(0, avg - c.new_length);
        offsets->push_back(d(rng) + i * avg);
      } else {
        offsets->push_back(i * avg);
      }
    } else {
      if (avg >= c.new_length)
        offsets->push_back((avg - c.new_length + 1) / 2 + i * avg);
      else
        offsets->push_back(0);
    }
  }
}

// ---- crop geometry (data_transformer.cpp:50-104) ---------------------------

void fill_fix_offsets(int h, int w, int ch, int cw, bool more,
                      std::vector<std::pair<int, int>>* offs) {
  int ho = (h - ch) / 4, wo = (w - cw) / 4;
  offs->assign({{0, 0}, {0, 4 * wo}, {4 * ho, 0}, {4 * ho, 4 * wo},
                {2 * ho, 2 * wo}});
  if (more) {
    offs->insert(offs->end(),
                 {{0, 2 * wo}, {4 * ho, 2 * wo}, {2 * ho, 0}, {2 * ho, 4 * wo},
                  {ho, wo}, {ho, 3 * wo}, {3 * ho, wo}, {3 * ho, 3 * wo}});
  }
}

void fill_crop_sizes(int h, int w, int net, int max_distort,
                     std::vector<std::pair<int, int>>* sizes) {
  static const float ratios[4] = {1.f, .875f, .75f, .66f};
  int base = std::min(h, w);
  sizes->clear();
  for (int i = 0; i < 4; ++i) {
    int ch = int(base * ratios[i]);
    if (std::abs(ch - net) < 3) ch = net;
    for (int j = 0; j < 4; ++j) {
      int cw = int(base * ratios[j]);
      if (std::abs(cw - net) < 3) cw = net;
      if (std::abs(i - j) <= max_distort) sizes->push_back({ch, cw});
    }
  }
}

struct Loader {
  Config cfg;
  std::vector<Record> records;
  size_t cursor = 0;
  std::mt19937_64 shuffle_rng, frame_rng;
  // 2-slot ring: producer fills fill_slot while consumer drains read_slot
  std::vector<float> buf_data[2];
  std::vector<uint8_t> buf_raw[2];     // raw mode: uint8 frames
  std::vector<int32_t> buf_offs[2];    // raw mode: (h_off, w_off) per video
  std::vector<uint8_t> buf_mirror[2];  // raw mode: mirror flag per video
  std::vector<int32_t> buf_label[2];
  int ready_count = 0;  // 0..2 filled, unconsumed slots
  int fill_slot = 0;
  int read_slot = 0;
  bool stop = false;
  bool error = false;
  std::string error_msg;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::thread producer;

  size_t item_floats() const {
    return size_t(cfg.segments) * cfg.new_length * cfg.crop * cfg.crop * 3;
  }
  size_t batch_floats() const { return item_floats() * cfg.batch; }
  size_t item_raw_bytes() const {
    return size_t(cfg.segments) * cfg.new_length * cfg.new_height *
           cfg.new_width * 3;
  }
  size_t batch_raw_bytes() const { return item_raw_bytes() * cfg.batch; }

  void shuffle_records() {
    std::shuffle(records.begin(), records.end(), shuffle_rng);
  }

  void advance(size_t n) {
    cursor += n;
    while (cursor >= records.size()) {
      cursor -= records.size();
      if (cfg.shuffle) shuffle_records();
    }
  }

  // Decode (and resize) one video's sampled frames.
  bool decode_frames(const Record& rec, std::mt19937_64& rng,
                     std::vector<cv::Mat>* frames) {
    std::vector<int> offsets;
    sample_offsets(rec.num_frames, cfg, rng, &offsets);
    const int T = cfg.segments * cfg.new_length;
    frames->clear();
    frames->reserve(T);
    cv::Mat last;
    char namebuf[512];
    for (int s = 0; s < cfg.segments; ++s) {
      for (int j = 0; j < cfg.new_length; ++j) {
        int fidx = std::min(offsets[s] + j, rec.num_frames - 1);
        snprintf(namebuf, sizeof(namebuf), cfg.pattern.c_str(), fidx + 1);
        cv::Mat img = cv::imread(rec.path + "/" + namebuf, cv::IMREAD_COLOR);
        if (img.empty()) {
          if (last.empty()) return false;  // skip unreadable video
          img = last;
        } else {
          if (cfg.new_height > 0 && cfg.new_width > 0)
            cv::resize(img, img, cv::Size(cfg.new_width, cfg.new_height), 0, 0,
                       cv::INTER_LINEAR);
          last = img;
        }
        frames->push_back(img);
      }
    }
    return true;
  }

  // Raw mode: decode only; emit uint8 frames + the augment decision the
  // device side will apply: (h_off, w_off, crop_h, crop_w) + mirror.  With
  // multi_scale the sampled window differs from crop and the device resizes
  // (eco_tpu/ops/resize.py); otherwise crop_h == crop_w == crop.
  bool load_one_raw(const Record& rec, uint64_t seed, uint8_t* out,
                    int32_t* offs, uint8_t* mirror) {
    std::mt19937_64 rng(seed);
    std::vector<cv::Mat> frames;
    if (!decode_frames(rec, rng, &frames)) return false;
    const int H = frames[0].rows, W = frames[0].cols, cs = cfg.crop;
    if (H < cs || W < cs) return false;
    int crop_h = cs, crop_w = cs;
    int h_off = (H - cs) / 2, w_off = (W - cs) / 2;
    bool do_mirror = false;
    if (cfg.train) {
      if (cfg.multi_scale) {
        std::vector<std::pair<int, int>> sizes;
        fill_crop_sizes(H, W, cs, cfg.max_distort, &sizes);
        auto pick = sizes[std::uniform_int_distribution<size_t>(
            0, sizes.size() - 1)(rng)];
        crop_h = pick.first;
        crop_w = pick.second;
      }
      if (cfg.fix_crop) {
        std::vector<std::pair<int, int>> fo;
        fill_fix_offsets(H, W, crop_h, crop_w, cfg.more_fix_crop, &fo);
        auto pick =
            fo[std::uniform_int_distribution<size_t>(0, fo.size() - 1)(rng)];
        h_off = pick.first;
        w_off = pick.second;
      } else {
        h_off = std::uniform_int_distribution<int>(0, H - crop_h)(rng);
        w_off = std::uniform_int_distribution<int>(0, W - crop_w)(rng);
      }
      do_mirror =
          cfg.mirror && std::uniform_int_distribution<int>(0, 1)(rng) == 1;
    }
    offs[0] = h_off;
    offs[1] = w_off;
    offs[2] = crop_h;
    offs[3] = crop_w;
    *mirror = do_mirror ? 1 : 0;
    const size_t frame_bytes = size_t(H) * W * 3;
    for (size_t t = 0; t < frames.size(); ++t) {
      const cv::Mat& f = frames[t];
      uint8_t* dst = out + t * frame_bytes;
      if (f.isContinuous()) {
        std::memcpy(dst, f.ptr<uint8_t>(0), frame_bytes);
      } else {
        for (int y = 0; y < H; ++y)
          std::memcpy(dst + size_t(y) * W * 3, f.ptr<uint8_t>(y), size_t(W) * 3);
      }
    }
    return true;
  }

  // Load + transform one video into out[item_floats()].
  bool load_one(const Record& rec, uint64_t seed, float* out) {
    std::mt19937_64 rng(seed);
    std::vector<cv::Mat> frames;
    if (!decode_frames(rec, rng, &frames)) return false;
    const int H = frames[0].rows, W = frames[0].cols, cs = cfg.crop;
    if (H < cs || W < cs) return false;

    // one augmentation decision per video
    int crop_h = cs, crop_w = cs, h_off = (H - cs) / 2, w_off = (W - cs) / 2;
    bool do_mirror = false;
    if (cfg.train) {
      if (cfg.multi_scale) {
        std::vector<std::pair<int, int>> sizes;
        fill_crop_sizes(H, W, cs, cfg.max_distort, &sizes);
        auto pick = sizes[std::uniform_int_distribution<size_t>(
            0, sizes.size() - 1)(rng)];
        crop_h = pick.first;
        crop_w = pick.second;
      }
      if (cfg.fix_crop) {
        std::vector<std::pair<int, int>> offs;
        fill_fix_offsets(H, W, crop_h, crop_w, cfg.more_fix_crop, &offs);
        auto pick = offs[std::uniform_int_distribution<size_t>(
            0, offs.size() - 1)(rng)];
        h_off = pick.first;
        w_off = pick.second;
      } else {
        h_off = std::uniform_int_distribution<int>(0, H - crop_h)(rng);
        w_off = std::uniform_int_distribution<int>(0, W - crop_w)(rng);
      }
      do_mirror =
          cfg.mirror && std::uniform_int_distribution<int>(0, 1)(rng) == 1;
    }

    for (int t = 0; t < int(frames.size()); ++t) {
      cv::Mat patch = frames[t](cv::Rect(w_off, h_off, crop_w, crop_h));
      cv::Mat sized;
      if (crop_h != cs || crop_w != cs)
        cv::resize(patch, sized, cv::Size(cs, cs), 0, 0, cv::INTER_LINEAR);
      else
        sized = patch;
      float* dst = out + size_t(t) * cs * cs * 3;
      for (int y = 0; y < cs; ++y) {
        const uint8_t* row = sized.ptr<uint8_t>(y);
        float* drow = dst + size_t(y) * cs * 3;
        for (int x = 0; x < cs; ++x) {
          int sx = do_mirror ? (cs - 1 - x) : x;
          const uint8_t* px = row + sx * 3;
          float* dpx = drow + x * 3;
          dpx[0] = float(px[0]) - cfg.mean[0];  // B
          dpx[1] = float(px[1]) - cfg.mean[1];  // G
          dpx[2] = float(px[2]) - cfg.mean[2];  // R
        }
      }
    }
    return true;
  }

  void fill_batch(int slot) {
    // per-slot item loader: f32 transformed path or raw uint8 path
    struct Item {
      Record rec;
      uint64_t seed;
      int idx;
    };
    float* data = cfg.raw ? nullptr : buf_data[slot].data();
    uint8_t* raw = cfg.raw ? buf_raw[slot].data() : nullptr;
    int32_t* offs = cfg.raw ? buf_offs[slot].data() : nullptr;
    uint8_t* mirrors = cfg.raw ? buf_mirror[slot].data() : nullptr;
    int32_t* labels = buf_label[slot].data();

    auto load_item = [&](const Record& rec, uint64_t seed, int i) -> bool {
      try {  // cv::Exception must not escape the thread (std::terminate)
        if (cfg.raw)
          return load_one_raw(rec, seed, raw + size_t(i) * item_raw_bytes(),
                              offs + 4 * i, mirrors + i);
        return load_one(rec, seed, data + size_t(i) * item_floats());
      } catch (const std::exception&) {
        return false;
      }
    };

    std::vector<Item> items;
    for (int i = 0; i < cfg.batch; ++i) {
      const Record& rec = records[cursor % records.size()];
      advance(1);
      items.push_back({rec, frame_rng(), i});
    }
    advance(size_t(cfg.world - 1) * cfg.batch);  // MPI-style cursor shard
    std::atomic<size_t> next(0);
    std::vector<uint8_t> ok(items.size(), 0);
    auto worker = [&]() {
      size_t i;
      while ((i = next.fetch_add(1)) < items.size()) {
        Item& it = items[i];
        labels[it.idx] = it.rec.label;
        ok[i] = load_item(it.rec, it.seed, it.idx) ? 1 : 0;
      }
    };
    std::vector<std::thread> pool;
    int nthreads = std::max(1, std::min<int>(cfg.threads, cfg.batch));
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
    // SKIP unreadable videos (reference video_data_layer.cpp:195-216):
    // replace failed slots with the next readable records so data and
    // labels always correspond.
    for (size_t i = 0; i < items.size(); ++i) {
      if (ok[i]) continue;
      size_t attempts = records.size();
      bool good = false;
      while (attempts-- && !good) {
        const Record& rec = records[cursor % records.size()];
        advance(1);
        labels[items[i].idx] = rec.label;
        good = load_item(rec, frame_rng(), items[i].idx);
      }
      if (!good) {
        fprintf(stderr,
                "ecodata: no readable videos while refilling batch slot %zu; "
                "zero-filling\n", i);
        if (cfg.raw) {
          std::memset(raw + size_t(items[i].idx) * item_raw_bytes(), 0,
                      item_raw_bytes());
          offs[2 * items[i].idx] = offs[2 * items[i].idx + 1] = 0;
          mirrors[items[i].idx] = 0;
        } else {
          std::memset(data + size_t(items[i].idx) * item_floats(), 0,
                      item_floats() * sizeof(float));
        }
      }
    }
  }

  void producer_loop() {
    for (;;) {
      int slot;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] { return stop || ready_count < 2; });
        if (stop) return;
        slot = fill_slot;
      }
      fill_batch(slot);
      {
        std::lock_guard<std::mutex> lk(mu);
        fill_slot ^= 1;
        ++ready_count;
      }
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

Loader* eco_loader_create(const char* list_path, int batch, int segments,
                          int new_length, int crop, int threads, int train,
                          int shuffle, uint64_t seed, const char* pattern,
                          float mean_b, float mean_g, float mean_r,
                          int fix_crop, int more_fix_crop, int multi_scale,
                          int max_distort, int mirror, int new_height,
                          int new_width, int rank, int world, int raw) {
  auto* l = new Loader();
  Config& c = l->cfg;
  c.batch = batch;
  c.segments = segments;
  c.new_length = new_length;
  c.crop = crop;
  c.threads = threads;
  c.train = train != 0;
  c.shuffle = shuffle != 0;
  c.pattern = pattern;
  c.mean[0] = mean_b;
  c.mean[1] = mean_g;
  c.mean[2] = mean_r;
  c.fix_crop = fix_crop != 0;
  c.more_fix_crop = more_fix_crop != 0;
  c.multi_scale = multi_scale != 0;
  c.max_distort = max_distort;
  c.mirror = mirror != 0;
  c.new_height = new_height;
  c.new_width = new_width;
  c.rank = rank;
  c.world = world;
  c.raw = raw != 0;
  if (c.raw && (new_height <= 0 || new_width <= 0)) {
    delete l;
    return nullptr;  // raw mode needs a fixed decode size
  }

  std::ifstream f(list_path);
  if (!f) {
    delete l;
    return nullptr;
  }
  std::string line;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    Record r;
    if (ss >> r.path >> r.num_frames >> r.label) l->records.push_back(r);
  }
  if (l->records.empty()) {
    delete l;
    return nullptr;
  }
  l->shuffle_rng.seed(seed);
  l->frame_rng.seed(seed + 1);
  if (c.shuffle) l->shuffle_records();
  l->cursor = size_t(rank) * batch % l->records.size();
  for (int s = 0; s < 2; ++s) {
    if (c.raw) {
      l->buf_raw[s].resize(l->batch_raw_bytes());
      l->buf_offs[s].resize(size_t(batch) * 4);
      l->buf_mirror[s].resize(batch);
    } else {
      l->buf_data[s].resize(l->batch_floats());
    }
    l->buf_label[s].resize(batch);
  }
  l->producer = std::thread([l] { l->producer_loop(); });
  return l;
}

// Copies the next batch into caller buffers. data: batch*S*L*crop*crop*3
// floats (channels-last BGR, mean-subtracted); labels: batch int32.
int eco_loader_next(Loader* l, float* data, int32_t* labels) {
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_ready.wait(lk, [&] { return l->stop || l->ready_count > 0; });
  if (l->stop) return -1;
  if (l->cfg.raw) return -2;  // use eco_loader_next_raw
  int slot = l->read_slot;
  std::memcpy(data, l->buf_data[slot].data(),
              l->batch_floats() * sizeof(float));
  std::memcpy(labels, l->buf_label[slot].data(),
              l->cfg.batch * sizeof(int32_t));
  l->read_slot ^= 1;
  --l->ready_count;
  lk.unlock();
  l->cv_free.notify_one();
  return 0;
}

// Raw mode: copies the next batch of resized uint8 frames + augment
// decisions.  data: batch*S*L*new_height*new_width*3 uint8 (channels-last
// BGR); offs: batch*4 int32 (h_off, w_off, crop_h, crop_w); mirror: batch
// uint8; labels: batch int32.
int eco_loader_next_raw(Loader* l, uint8_t* data, int32_t* offs,
                        uint8_t* mirror, int32_t* labels) {
  std::unique_lock<std::mutex> lk(l->mu);
  l->cv_ready.wait(lk, [&] { return l->stop || l->ready_count > 0; });
  if (l->stop) return -1;
  if (!l->cfg.raw) return -2;
  int slot = l->read_slot;
  std::memcpy(data, l->buf_raw[slot].data(), l->batch_raw_bytes());
  std::memcpy(offs, l->buf_offs[slot].data(),
              size_t(l->cfg.batch) * 4 * sizeof(int32_t));
  std::memcpy(mirror, l->buf_mirror[slot].data(), l->cfg.batch);
  std::memcpy(labels, l->buf_label[slot].data(),
              l->cfg.batch * sizeof(int32_t));
  l->read_slot ^= 1;
  --l->ready_count;
  lk.unlock();
  l->cv_free.notify_one();
  return 0;
}

int eco_loader_num_videos(Loader* l) { return int(l->records.size()); }

void eco_loader_destroy(Loader* l) {
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
  }
  l->cv_free.notify_all();
  l->cv_ready.notify_all();
  if (l->producer.joinable()) l->producer.join();
  delete l;
}

}  // extern "C"
