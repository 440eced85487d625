// Host-RAM transition replay store — the native shared-memory component.
//
// The reference parks Atari replay in host RAM inside the learner process
// (uint8 states, xt/agent/dqn/atari_dqn.py:39-44) and moves bulk data
// between processes through the Arrow plasma_store C++ server
// (zeus/common/ipc/share_by_plasma.py). On TPU the device-HBM ring
// (xingtian_tpu/ops/replay.py) is the fast path; this store is the
// host-side equivalent for buffers larger than HBM (e.g. 1M Atari
// transitions): a C++ ring that stores each observation ONCE and
// reconstructs (obs, next_obs) pairs at sample time, with multi-threaded
// row gather.
//
// Layout: slot i holds (obs_i, action_i, reward_i, done_i) where obs_i is
// the observation the action was taken from. next_obs of slot i is
// slot (i+1)'s obs — valid unless i is the most recently written slot.
// Sampling excludes the write boundary; terminal transitions return a
// zero next_obs (the TD target masks it by done anyway).
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <functional>
#include <random>
#include <thread>
#include <vector>

namespace {

struct ReplayStore {
  int64_t capacity;
  int64_t obs_bytes;
  bool explicit_next;            // store next_obs per slot (batched feeds)
  std::vector<uint8_t> obs;      // capacity * obs_bytes
  std::vector<uint8_t> next_obs; // capacity * obs_bytes iff explicit_next
  std::vector<int32_t> action;   // capacity
  std::vector<float> reward;     // capacity
  std::vector<uint8_t> done;     // capacity
  int64_t head = 0;              // next write slot
  int64_t size = 0;              // valid slots
  int64_t total_added = 0;
};

int unsigned_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n > 16 ? 16 : n);
}

void parallel_rows(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  int nt = unsigned_threads();
  if (n < 64) { fn(0, n); return; }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk > n ? n : lo + chunk;
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// mode 0: successor-slot next_obs (single time-contiguous stream feeds
//         only — half the RAM); mode 1: explicit next_obs per slot
//         (arbitrary batched/interleaved feeds, e.g. [T, B] rollouts).
void* replay_create(int64_t capacity, int64_t obs_bytes, int explicit_next) {
  auto* s = new ReplayStore();
  s->capacity = capacity;
  s->obs_bytes = obs_bytes;
  s->explicit_next = explicit_next != 0;
  s->obs.resize(capacity * obs_bytes);
  if (s->explicit_next) s->next_obs.resize(capacity * obs_bytes);
  s->action.resize(capacity);
  s->reward.resize(capacity);
  s->done.resize(capacity);
  return s;
}

void replay_destroy(void* h) { delete static_cast<ReplayStore*>(h); }

int64_t replay_size(void* h) { return static_cast<ReplayStore*>(h)->size; }

int64_t replay_total_added(void* h) {
  return static_cast<ReplayStore*>(h)->total_added;
}

// Append n transitions (ring overwrite). `next_obs` may be null in
// successor mode, and is required in explicit mode.
void replay_add(void* h, int64_t n, const uint8_t* obs,
                const uint8_t* next_obs, const int32_t* action,
                const float* reward, const uint8_t* done) {
  auto* s = static_cast<ReplayStore*>(h);
  for (int64_t i = 0; i < n; ++i) {
    int64_t slot = s->head;
    std::memcpy(s->obs.data() + slot * s->obs_bytes,
                obs + i * s->obs_bytes, s->obs_bytes);
    if (s->explicit_next) {
      std::memcpy(s->next_obs.data() + slot * s->obs_bytes,
                  next_obs + i * s->obs_bytes, s->obs_bytes);
    }
    s->action[slot] = action[i];
    s->reward[slot] = reward[i];
    s->done[slot] = done[i];
    s->head = (s->head + 1) % s->capacity;
    if (s->size < s->capacity) s->size += 1;
    s->total_added += 1;
  }
}

// Sample `batch` transitions uniformly (excluding the newest slot, whose
// next_obs is not yet written). Outputs:
//   obs_out/next_obs_out: batch*obs_bytes u8; action/reward/done: batch.
// Returns 0 on success, -1 if fewer than 2 valid transitions.
int replay_sample(void* h, int64_t batch, uint64_t seed,
                  uint8_t* obs_out, uint8_t* next_obs_out,
                  int32_t* action_out, float* reward_out, float* done_out) {
  auto* s = static_cast<ReplayStore*>(h);
  if (s->size < 2) return -1;
  const int64_t newest = (s->head - 1 + s->capacity) % s->capacity;
  const bool exclude_newest = !s->explicit_next;  // next undefined there
  std::vector<int64_t> idx(batch);
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int64_t> dist(0, s->size - 1);
  for (int64_t i = 0; i < batch; ++i) {
    int64_t k = dist(rng);
    while (exclude_newest && k == newest) k = dist(rng);
    idx[i] = k;
  }
  const int64_t ob = s->obs_bytes;
  parallel_rows(batch, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t k = idx[i];
      std::memcpy(obs_out + i * ob, s->obs.data() + k * ob, ob);
      action_out[i] = s->action[k];
      reward_out[i] = s->reward[k];
      done_out[i] = static_cast<float>(s->done[k]);
      if (s->explicit_next) {
        std::memcpy(next_obs_out + i * ob, s->next_obs.data() + k * ob, ob);
      } else if (s->done[k]) {
        std::memset(next_obs_out + i * ob, 0, ob);  // masked by done
      } else {
        const int64_t nk = (k + 1) % s->capacity;
        std::memcpy(next_obs_out + i * ob, s->obs.data() + nk * ob, ob);
      }
    }
  });
  return 0;
}

}  // extern "C"
