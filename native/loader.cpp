// videocad_tpu native data loader.
//
// Replaces the reference's torch DataLoader worker processes + per-item
// pickle/PIL decode (SURVEY.md §2.2: data_loader.py:186-196, 441-449) with
// a C++ thread pool streaming packed .vcb sequence files into padded,
// ready-to-ship uint8 batches. Python talks to it over a C ABI via ctypes
// (videocad_tpu/data/native.py).
//
// .vcb layout (little endian), one file per sequence:
//   char[4]  magic "VCB1"
//   u32      version (1, 2 or 3)
//   u32      T, H, W, C, act_dim
//   u32      V                      (version >= 2 only; v1 implies V = 0)
//   u32      CH, CW, CC             (version >= 3 only; the CAD image's own
//                                    shape — v1/v2 imply CH,CW,CC = H,W,C.
//                                    Carries preprocessed GenCAD Canny edge
//                                    images, 256x256x3, whose shape differs
//                                    from the frames': reference
//                                    data_loader.py:455-469)
//   u8       cad_image[CH*CW*CC]
//   u8       views[V*H*W*C]         (version >= 2; the multiview renders,
//                                    reference data_loader.py:417-429)
//   u8       frames[T*H*W*C]
//   i32      actions[T*act_dim]
//
// Batches pad T up to a fixed bucket length: frames with 0, actions with -1
// (loss ignore value), matching videocad_tpu.data.collate semantics.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x31424356;  // "VCB1"
// Sanity bound on the per-row timestep count: a corrupt header must never
// drive allocation or seek math (the longest real sequence is ~190 steps;
// this is 3 orders of magnitude of headroom).
constexpr uint32_t kMaxT = 1u << 20;

// Frames dominate batch bytes (231 MB at the flagship shapes), so the hot
// path avoids every avoidable pass over them: rows are fread() DIRECTLY
// into the (uninitialized) batch buffer and only the padding tail is
// zeroed — the first revision memset the full buffer, read into a
// temporary Sequence and copied it over, ~3 passes of extra traffic that
// halved the per-core assembly rate.
//
// Reads a row into place. Returns true on success with *t_out = the
// number of (bucket-clamped) timesteps written; on failure nothing
// meaningful is written. Nothing here allocates proportionally to the
// untrusted header T: the frames/actions reads are bucket-clamped and the
// remainder is fseek'd past, so a corrupt T is rejected (kMaxT) or simply
// runs the reads off EOF and fails cleanly.
bool read_vcb_into(const std::string& path, uint32_t h, uint32_t w,
                   uint32_t c, uint32_t act_dim, uint32_t num_views,
                   uint32_t cad_h, uint32_t cad_w, uint32_t cad_c,
                   uint32_t bucket_len, uint8_t* cad_dst, uint8_t* views_dst,
                   uint8_t* frames_dst, float* actions_dst,
                   uint32_t* t_out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  uint32_t header[7];
  if (std::fread(header, sizeof(uint32_t), 7, f) != 7 ||
      header[0] != kMagic || header[1] < 1 || header[1] > 3 ||
      header[2] > kMaxT || header[3] != h || header[4] != w ||
      header[5] != c || header[6] != act_dim) {
    std::fclose(f);
    return false;
  }
  uint32_t v = 0;
  if (header[1] >= 2 &&
      std::fread(&v, sizeof(uint32_t), 1, f) != 1) {
    std::fclose(f);
    return false;
  }
  if (v != num_views) {
    std::fclose(f);
    return false;
  }
  // v1/v2 files carry the CAD image at the frames' shape; v3 declares its
  // own. Either way it must match what the caller allocated for.
  uint32_t cdims[3] = {h, w, c};
  if (header[1] >= 3 &&
      std::fread(cdims, sizeof(uint32_t), 3, f) != 3) {
    std::fclose(f);
    return false;
  }
  if (cdims[0] != cad_h || cdims[1] != cad_w || cdims[2] != cad_c) {
    std::fclose(f);
    return false;
  }
  const uint32_t t = header[2];
  const uint32_t tt = std::min(t, bucket_len);
  const size_t img = static_cast<size_t>(h) * w * c;
  const size_t cad_img = static_cast<size_t>(cad_h) * cad_w * cad_c;
  bool ok = std::fread(cad_dst, 1, cad_img, f) == cad_img;
  if (v > 0) {
    ok = ok && std::fread(views_dst, 1, img * v, f) == img * v;
  }
  ok = ok && std::fread(frames_dst, 1, img * tt, f) == img * tt;
  if (ok && t > tt) {
    ok = std::fseek(f, static_cast<long>(img * (t - tt)), SEEK_CUR) == 0;
  }
  std::vector<int32_t> actions(static_cast<size_t>(tt) * act_dim);
  ok = ok && std::fread(actions.data(), sizeof(int32_t), actions.size(),
                        f) == actions.size();
  std::fclose(f);
  if (!ok) return false;
  for (size_t i = 0; i < actions.size(); ++i) {
    actions_dst[i] = static_cast<float>(actions[i]);
  }
  *t_out = tt;
  return true;
}

struct Batch {
  // frames/cad/views are raw arrays: new[] leaves POD storage
  // uninitialized, letting assemble() write each byte exactly once
  // (fread or tail zero).
  std::unique_ptr<uint8_t[]> frames;  // [B, L, H, W, C]
  size_t frames_size = 0;
  std::vector<float> actions;         // [B, L, act_dim], pad -1
  std::unique_ptr<uint8_t[]> cad;     // [B, H, W, C]
  size_t cad_size = 0;
  std::unique_ptr<uint8_t[]> views;   // [B, V, H, W, C] (V > 0 only)
  size_t views_size = 0;
  std::vector<int32_t> indices;       // source sequence index per row
};

class Loader {
 public:
  // cad_h/cad_w/cad_c <= 0 default to the frames' shape (v1/v2 stores).
  Loader(std::vector<std::string> paths, int batch_size, int bucket_len,
         int h, int w, int c, int act_dim, int num_views, int cad_h,
         int cad_w, int cad_c, int prefetch, int num_threads, int host_id,
         int num_hosts)
      : paths_(std::move(paths)),
        batch_size_(batch_size),
        bucket_len_(bucket_len),
        h_(h), w_(w), c_(c), act_dim_(act_dim),
        num_views_(num_views < 0 ? 0 : num_views),
        cad_h_(cad_h > 0 ? cad_h : h),
        cad_w_(cad_w > 0 ? cad_w : w),
        cad_c_(cad_c > 0 ? cad_c : c),
        prefetch_(prefetch < 1 ? 1 : prefetch),
        num_threads_(num_threads < 1 ? 1 : num_threads),
        num_hosts_(num_hosts < 1 ? 1 : num_hosts),
        host_id_(host_id) {}

  ~Loader() { stop(); }

  // A host_id outside [0, num_hosts) is a misconfigured multi-host launch:
  // wrapping it silently would duplicate one host's shard and starve
  // another. Checked at creation (vcb_loader_create returns null).
  bool valid() const { return host_id_ >= 0 && host_id_ < num_hosts_; }

  int num_batches() const {
    // Per-host share (DistributedSampler semantics: every host consumes
    // 1/num_hosts of the globally shuffled order — reference
    // data_loader.py:177-183), drop_last.
    return static_cast<int>(paths_.size() / num_hosts_) / batch_size_;
  }

  int num_views() const { return num_views_; }

  long long skipped_rows() const { return skipped_rows_.load(); }

  void start_epoch(int epoch, uint64_t seed, bool shuffle) {
    stop();
    // Global permutation first, then this host's strided slice — hosts see
    // different, disjoint subsets each epoch, reshuffled globally.
    std::vector<size_t> global(paths_.size());
    for (size_t i = 0; i < global.size(); ++i) global[i] = i;
    if (shuffle) {
      std::mt19937_64 rng(seed + static_cast<uint64_t>(epoch));
      std::shuffle(global.begin(), global.end(), rng);
    }
    order_.clear();
    for (size_t i = host_id_; i < global.size();
         i += static_cast<size_t>(num_hosts_)) {
      order_.push_back(global[i]);
    }
    skipped_rows_.store(0);
    next_batch_.store(0);
    emitted_ = 0;
    stopping_ = false;
    {
      std::lock_guard<std::mutex> lock(mu_);
      pending_.clear();
    }
    for (int i = 0; i < num_threads_; ++i) {
      workers_.emplace_back([this] { work(); });
    }
  }

  // Copies the next batch into caller buffers (views_out ignored when the
  // loader was created with num_views == 0). Returns 1 on success,
  // 0 at end of epoch.
  int next(uint8_t* frames_out, float* actions_out, uint8_t* cad_out,
           uint8_t* views_out, int32_t* indices_out) {
    const int total = num_batches();
    if (emitted_ >= total) return 0;
    Batch batch;
    {
      std::unique_lock<std::mutex> lock(mu_);
      // Batches must come out in order: wait for batch id == emitted_.
      cv_.wait(lock, [this] {
        return stopping_ || pending_.count(emitted_) > 0;
      });
      if (stopping_) return 0;
      const int id = emitted_;
      batch = std::move(pending_[id]);
      pending_.erase(id);
      // Advance under the lock, BEFORE the notify: workers read emitted_
      // in their cv predicate (an unlocked increment would race it), and
      // a pre-increment notify would wake them on the stale bound,
      // shrinking the effective prefetch window by one cycle.
      ++emitted_;
      cv_.notify_all();
    }
    std::memcpy(frames_out, batch.frames.get(), batch.frames_size);
    std::memcpy(actions_out, batch.actions.data(),
                batch.actions.size() * sizeof(float));
    std::memcpy(cad_out, batch.cad.get(), batch.cad_size);
    if (num_views_ > 0 && views_out != nullptr) {
      std::memcpy(views_out, batch.views.get(), batch.views_size);
    }
    std::memcpy(indices_out, batch.indices.data(),
                batch.indices.size() * sizeof(int32_t));
    if (emitted_ >= total) stop();
    return 1;
  }

 private:
  void work() {
    const int total = num_batches();
    while (!stopping_) {
      const int batch_id = next_batch_.fetch_add(1);
      if (batch_id >= total) return;
      Batch batch = assemble(batch_id);
      std::unique_lock<std::mutex> lock(mu_);
      cv_.wait(lock, [this, batch_id] {
        // Bound memory: keep at most `prefetch_` batches ahead of the reader.
        return stopping_ ||
               batch_id < emitted_ + prefetch_ + num_threads_;
      });
      if (stopping_) return;
      pending_[batch_id] = std::move(batch);
      cv_.notify_all();
    }
  }

  Batch assemble(int batch_id) {
    const size_t img = static_cast<size_t>(h_) * w_ * c_;
    const size_t cad_img = static_cast<size_t>(cad_h_) * cad_w_ * cad_c_;
    const size_t row = static_cast<size_t>(bucket_len_) * img;
    const size_t views_row = static_cast<size_t>(num_views_) * img;
    Batch batch;
    batch.frames_size = static_cast<size_t>(batch_size_) * row;
    batch.frames.reset(new uint8_t[batch.frames_size]);
    batch.actions.assign(
        static_cast<size_t>(batch_size_) * bucket_len_ * act_dim_, -1.0f);
    batch.cad_size = static_cast<size_t>(batch_size_) * cad_img;
    batch.cad.reset(new uint8_t[batch.cad_size]);
    if (num_views_ > 0) {
      batch.views_size = static_cast<size_t>(batch_size_) * views_row;
      batch.views.reset(new uint8_t[batch.views_size]);
    }
    batch.indices.assign(batch_size_, -1);
    for (int b = 0; b < batch_size_; ++b) {
      const size_t idx = order_[batch_id * batch_size_ + b];
      batch.indices[b] = static_cast<int32_t>(idx);
      uint8_t* frames_dst = batch.frames.get() + static_cast<size_t>(b) * row;
      uint8_t* cad_dst = batch.cad.get() + static_cast<size_t>(b) * cad_img;
      uint8_t* views_dst =
          num_views_ > 0
              ? batch.views.get() + static_cast<size_t>(b) * views_row
              : nullptr;
      float* actions_dst =
          &batch.actions[static_cast<size_t>(b) * bucket_len_ * act_dim_];
      uint32_t t = 0;
      if (!read_vcb_into(paths_[idx], h_, w_, c_, act_dim_, num_views_,
                         cad_h_, cad_w_, cad_c_, bucket_len_, cad_dst,
                         views_dst, frames_dst, actions_dst, &t)) {
        // Zero the row (all actions stay -1 => fully masked in the loss)
        // but COUNT it — silent corruption must surface; the Python side
        // raises above its threshold (data/native.py).
        std::memset(frames_dst, 0, row);
        std::memset(cad_dst, 0, cad_img);
        if (views_dst != nullptr) std::memset(views_dst, 0, views_row);
        // actions_dst needs no rewrite: read_vcb_into writes actions only
        // after every read succeeded, and the whole actions buffer was
        // pre-filled with -1 (fully masked in the loss).
        skipped_rows_.fetch_add(1);
        std::fprintf(stderr,
                     "[vcb_loader] skipping corrupt/mismatched row: %s\n",
                     paths_[idx].c_str());
        continue;
      }
      // Zero only the padding tail; the valid prefix was read in place.
      std::memset(frames_dst + static_cast<size_t>(t) * img, 0,
                  (static_cast<size_t>(bucket_len_) - t) * img);
    }
    return batch;
  }

  void stop() {
    stopping_ = true;
    cv_.notify_all();
    for (auto& worker : workers_) {
      if (worker.joinable()) worker.join();
    }
    workers_.clear();
  }

  std::vector<std::string> paths_;
  const int batch_size_, bucket_len_, h_, w_, c_, act_dim_, num_views_,
      cad_h_, cad_w_, cad_c_, prefetch_, num_threads_, num_hosts_, host_id_;
  std::atomic<long long> skipped_rows_{0};
  std::vector<size_t> order_;
  std::vector<std::thread> workers_;
  std::atomic<int> next_batch_{0};
  int emitted_ = 0;
  std::atomic<bool> stopping_{false};
  std::mutex mu_;
  std::condition_variable cv_;
  std::map<int, Batch> pending_;
};

}  // namespace

extern "C" {

void* vcb_loader_create(const char** paths, int num_paths, int batch_size,
                        int bucket_len, int h, int w, int c, int act_dim,
                        int num_views, int cad_h, int cad_w, int cad_c,
                        int prefetch, int num_threads, int host_id,
                        int num_hosts) {
  std::vector<std::string> path_vec(paths, paths + num_paths);
  auto* loader =
      new Loader(std::move(path_vec), batch_size, bucket_len, h, w, c,
                 act_dim, num_views, cad_h, cad_w, cad_c, prefetch,
                 num_threads, host_id, num_hosts);
  if (!loader->valid()) {
    std::fprintf(stderr,
                 "[vcb_loader] host_id %d out of range [0, %d)\n", host_id,
                 num_hosts);
    delete loader;
    return nullptr;
  }
  return loader;
}

long long vcb_loader_skipped_rows(void* handle) {
  return static_cast<Loader*>(handle)->skipped_rows();
}

int vcb_loader_num_batches(void* handle) {
  return static_cast<Loader*>(handle)->num_batches();
}

void vcb_loader_start_epoch(void* handle, int epoch, uint64_t seed,
                            int shuffle) {
  static_cast<Loader*>(handle)->start_epoch(epoch, seed, shuffle != 0);
}

int vcb_loader_next(void* handle, uint8_t* frames, float* actions,
                    uint8_t* cad, uint8_t* views, int32_t* indices) {
  return static_cast<Loader*>(handle)->next(frames, actions, cad, views,
                                            indices);
}

void vcb_loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// Standalone .vcb writer so converters need no Python-side binary packing.
// Picks the lowest version that can carry the payload: 1 (byte-identical
// to the original format) for frame-shaped CAD + no views, 2 when views
// are present, 3 when the CAD image has its own shape (GenCAD edge
// images). cad_h/cad_w/cad_c <= 0 mean "frame-shaped".
int vcb_write(const char* path, uint32_t t, uint32_t h, uint32_t w,
              uint32_t c, uint32_t act_dim, uint32_t num_views,
              int cad_h, int cad_w, int cad_c,
              const uint8_t* cad, const uint8_t* views,
              const uint8_t* frames, const int32_t* actions) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 0;
  uint32_t cdims[3] = {cad_h > 0 ? static_cast<uint32_t>(cad_h) : h,
                       cad_w > 0 ? static_cast<uint32_t>(cad_w) : w,
                       cad_c > 0 ? static_cast<uint32_t>(cad_c) : c};
  const bool cad_own_shape =
      cdims[0] != h || cdims[1] != w || cdims[2] != c;
  const uint32_t version = cad_own_shape ? 3 : (num_views > 0 ? 2 : 1);
  uint32_t header[7] = {kMagic, version, t, h, w, c, act_dim};
  const size_t img = static_cast<size_t>(h) * w * c;
  const size_t cad_img = static_cast<size_t>(cdims[0]) * cdims[1] * cdims[2];
  bool ok = std::fwrite(header, sizeof(uint32_t), 7, f) == 7;
  if (version >= 2) {
    ok = ok && std::fwrite(&num_views, sizeof(uint32_t), 1, f) == 1;
  }
  if (version >= 3) {
    ok = ok && std::fwrite(cdims, sizeof(uint32_t), 3, f) == 3;
  }
  ok = ok && std::fwrite(cad, 1, cad_img, f) == cad_img;
  if (num_views > 0) {
    ok = ok && std::fwrite(views, 1, img * num_views, f) == img * num_views;
  }
  ok = ok && std::fwrite(frames, 1, img * t, f) == img * t;
  ok = ok && std::fwrite(actions, sizeof(int32_t),
                         static_cast<size_t>(t) * act_dim, f) ==
                 static_cast<size_t>(t) * act_dim;
  std::fclose(f);
  return ok ? 1 : 0;
}

}  // extern "C"
