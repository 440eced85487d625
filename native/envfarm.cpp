// Native host environment farm.
//
// The reference's performance-critical native surface is third-party IPC:
// Arrow plasma shared memory + libzmq shuttling pickled trajectories
// between ~100 Python processes (reference zeus/common/ipc/*,
// xt/framework/broker.py:478-505 — explorer *processes* with CPU pinning
// exist precisely so env stepping scales across cores).  In the
// TPU-native design, device-side envs need none of that — but
// *host-side* simulators (the AtariEnv/StarCraft role) still need a fast
// farm, and Python threads cannot provide one: numpy preprocessing holds
// the GIL, so a thread farm saturates ~3.6k steps/s on 2 cores no matter
// how many workers run (measured, docs/perf_notes_r4.md §2).  This
// module is the GIL-free answer: environment dynamics AND the full Atari
// preprocessing stack in C++, stepped by a persistent pthread pool over a
// shared-memory batch (zero-copy numpy views via ctypes), one
// device<->host round trip per vectorized step.  The calling Python
// thread releases the GIL for the duration of the batched step (ctypes
// foreign calls drop it), so behaviour-policy inference runs concurrently
// with stepping.
//
// Env model mirrors xingtian_tpu.envs.core / envs.host: step() auto-resets
// on done and returns the fresh observation; `done` flags the boundary.
//
// Envs:
//  * CartPole   — float32[4] obs, dynamics identical to envs/classic.py.
//  * AtariStub  — uint8[84,84,4] obs; FakeAtariCore dynamics + the full
//    wrapper-stack preprocessing of envs/ale.py, op-for-op: action
//    repeat ×4 with a pixel max over the last two raw frames, BT.601
//    luma, area/index-map resize, 4-frame uint8 stack cleared on episode
//    boundaries, noop + fire reset, life-loss episodic done with
//    real_done game resets (reference xt/environment/gym/
//    atari_wrappers.py:26-129 + atari_env.py:33-103).  Exact output
//    parity with the Python FakeALE adapter is proven in
//    tests/test_native.py (max_noops=1 makes the whole pipeline
//    deterministic).
//
// Build: make (g++ -O3 -march=native -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <memory>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Generic env interface (obs written into caller-owned batch memory)
// ---------------------------------------------------------------------------
struct EnvBase {
  virtual ~EnvBase() = default;
  // Deterministic seeded reset (the farm protocol's reset(seed)).
  virtual void reset_seeded(uint64_t seed) = 0;
  // One macro step; auto-resets internally on done so observe() always
  // returns the post-boundary observation.  Returns done.
  virtual bool step(int action, float* reward) = 0;
  virtual void observe(void* out) const = 0;
};

// ---------------------------------------------------------------------------
// CartPole-v0 dynamics (identical constants to envs/classic.py)
// ---------------------------------------------------------------------------
struct CartPole : EnvBase {
  static constexpr int kObsDim = 4;
  static constexpr float kGravity = 9.8f, kMassCart = 1.0f, kMassPole = 0.1f;
  static constexpr float kTotalMass = kMassCart + kMassPole;
  static constexpr float kLength = 0.5f, kPoleMassLength = kMassPole * kLength;
  static constexpr float kForceMag = 10.0f, kTau = 0.02f;
  static constexpr float kThetaLimit = 12.0f * 2.0f * (float)M_PI / 360.0f;
  static constexpr float kXLimit = 2.4f;
  static constexpr int kMaxSteps = 200;

  float x = 0, x_dot = 0, theta = 0, theta_dot = 0;
  int t = 0;
  std::mt19937 rng;

  void reset() {
    std::uniform_real_distribution<float> d(-0.05f, 0.05f);
    x = d(rng); x_dot = d(rng); theta = d(rng); theta_dot = d(rng);
    t = 0;
  }

  void reset_seeded(uint64_t seed) override {
    rng.seed(seed * 0x9E3779B97F4A7C15ull + 1);
    reset();
  }

  bool step(int action, float* reward) override {
    const float force = action == 1 ? kForceMag : -kForceMag;
    const float cos_t = std::cos(theta), sin_t = std::sin(theta);
    const float temp =
        (force + kPoleMassLength * theta_dot * theta_dot * sin_t) / kTotalMass;
    const float theta_acc =
        (kGravity * sin_t - cos_t * temp) /
        (kLength * (4.0f / 3.0f - kMassPole * cos_t * cos_t / kTotalMass));
    const float x_acc = temp - kPoleMassLength * theta_acc * cos_t / kTotalMass;
    x += kTau * x_dot;
    x_dot += kTau * x_acc;
    theta += kTau * theta_dot;
    theta_dot += kTau * theta_acc;
    ++t;
    *reward = 1.0f;
    const bool terminated =
        std::fabs(x) > kXLimit || std::fabs(theta) > kThetaLimit;
    const bool done = terminated || t >= kMaxSteps;
    if (done) reset();           // auto-reset; observe() is fresh
    return done;
  }

  void observe(void* out) const override {
    float* o = static_cast<float*>(out);
    o[0] = x; o[1] = x_dot; o[2] = theta; o[3] = theta_dot;
  }
};

// ---------------------------------------------------------------------------
// FakeAtariCore — the deterministic synthetic emulator of envs/ale.py
// (FakeAtariCore): 64x48 RGB frames encoding the internal tick, one of 3
// lives lost every life_len raw steps, game over at 0 lives, FIRE at
// action 1, reward for action 2 on ticks divisible by 5.
// ---------------------------------------------------------------------------
struct FakeCore {
  static constexpr int kH = 48, kW = 64, kActions = 4, kLifeLen = 40;
  int t = 0;
  int lives = 3;

  void reset(int64_t seed) {          // seed < 0 == Python's seed=None
    t = seed < 0 ? 0 : (int)((uint64_t)seed % 7u);
    lives = 3;
  }

  // → (reward, game_over); frame is rendered separately on demand
  float step(int action, bool* over) {
    ++t;
    const float r = (action == 2 && t % 5 == 0) ? 1.0f : 0.0f;
    if (t % kLifeLen == 0) --lives;
    *over = lives <= 0;
    return r;
  }

  // Render the current raw RGB frame (h, w, 3) uint8 — same content as
  // FakeAtariCore._frame: red plane = t % 251, green scanline at row
  // (t*3) % h, blue zero.
  void frame(uint8_t* rgb) const {
    const uint8_t red = (uint8_t)(t % 251);
    std::memset(rgb, 0, (size_t)kH * kW * 3);
    for (int i = 0; i < kH * kW; ++i) rgb[i * 3] = red;
    uint8_t* row = rgb + (size_t)((t * 3) % kH) * kW * 3;
    for (int x = 0; x < kW; ++x) row[x * 3 + 1] = 255;
  }
};

// ---------------------------------------------------------------------------
// AtariStub — FakeCore + the full preprocessing stack, mirroring
// envs/ale.py AtariPreprocessor + ALEAtari op-for-op (all float math in
// double, exactly like numpy's float64 default).
// ---------------------------------------------------------------------------
struct AtariStub : EnvBase {
  static constexpr int kDim = 84, kStack = 4, kRepeat = 4;
  FakeCore core;
  int max_noops;
  std::mt19937 rng;                     // noop-count rng (preprocessor rng)
  uint8_t stack[kDim * kDim * kStack];  // [H, W, S] like numpy
  int prev_lives = 0;
  bool real_done = true;
  // scratch raw frames (per-env so worker threads never share)
  uint8_t f_a[FakeCore::kH * FakeCore::kW * 3];
  uint8_t f_b[FakeCore::kH * FakeCore::kW * 3];

  explicit AtariStub(int noops) : max_noops(noops) {
    std::memset(stack, 0, sizeof(stack));
  }

  // -- frame ops (rgb_to_gray + resize_area + clip/cast, ale.py:194-234) --
  void proc_into_stack(const uint8_t* rgb) {
    // shift stack left one slot: [.., 1:] + new frame
    for (int p = 0; p < kDim * kDim; ++p) {
      uint8_t* px = stack + (size_t)p * kStack;
      std::memmove(px, px + 1, kStack - 1);
    }
    constexpr int h = FakeCore::kH, w = FakeCore::kW;
    // index-map resize (h,w not divisible by 84): ys = floor(i*h/dim)
    for (int i = 0; i < kDim; ++i) {
      const int y = (int)((int64_t)i * h / kDim);
      for (int j = 0; j < kDim; ++j) {
        const int x = (int)((int64_t)j * w / kDim);
        const uint8_t* p = rgb + ((size_t)y * w + x) * 3;
        const double g = p[0] * 0.299 + p[1] * 0.587 + p[2] * 0.114;
        const double c = g < 0.0 ? 0.0 : (g > 255.0 ? 255.0 : g);
        stack[((size_t)i * kDim + j) * kStack + (kStack - 1)] = (uint8_t)c;
      }
    }
  }

  void clear_stack() { std::memset(stack, 0, sizeof(stack)); }

  // -- wrapper-stack semantics (ale.py:244-304) --------------------------
  void game_reset(int64_t seed) {
    core.reset(seed);
    core.frame(f_a);
    // noop reset: 1..max_noops noop steps (atari_wrappers.py:41-50)
    std::uniform_int_distribution<int> d(1, max_noops);
    const int noops = max_noops > 1 ? d(rng) : 1;
    for (int i = 0; i < noops; ++i) {
      bool over = false;
      core.step(0, &over);
      core.frame(f_a);
      if (over) { core.reset(-1); core.frame(f_a); }
    }
    // fire reset (FakeCore has FIRE; atari_wrappers.py:106-119)
    for (int a : {1, 2 % FakeCore::kActions}) {
      bool over = false;
      core.step(a, &over);
      core.frame(f_a);
      if (over) { core.reset(-1); core.frame(f_a); }
    }
  }

  // preprocessor reset — seed < 0 == Python's None (ale.py:261-274)
  void pre_reset(int64_t seed) {
    if (real_done) {
      game_reset(seed);
    } else {
      // life lost, game still running: continue with one noop
      bool over = false;
      core.step(0, &over);
      core.frame(f_a);
      if (over) game_reset(seed);
    }
    prev_lives = core.lives;
    real_done = false;
    clear_stack();
    proc_into_stack(f_a);
  }

  void reset_seeded(uint64_t seed) override {
    real_done = true;               // a farm-level reset is a fresh game
    rng.seed(seed * 0x2545F4914F6CDD1Dull + 7);
    pre_reset((int64_t)seed);
  }

  bool step(int action, float* reward) override {
    // action repeat ×4 with pixel max over the last two raw frames
    // (ale.py:276-291)
    float total = 0.0f;
    bool over = false;
    bool have_prev = false;
    for (int i = 0; i < kRepeat; ++i) {
      total += core.step(action, &over);
      if (i == kRepeat - 2) { core.frame(f_b); have_prev = true; }
      if (i == kRepeat - 1) core.frame(f_a);
      if (over) { core.frame(f_a); break; }
    }
    if (have_prev) {                // merged = max(f_prev, f_last)
      for (size_t i = 0; i < sizeof(f_a); ++i)
        f_a[i] = std::max(f_a[i], f_b[i]);
    }
    real_done = over;
    bool done = over;
    // life-loss episodic done (ale.py:295-299)
    const int lives = core.lives;
    if (lives > 0 && lives < prev_lives) done = true;
    prev_lives = lives;
    if (done) clear_stack();        // boundary clears the stack
    proc_into_stack(f_a);
    *reward = total;
    if (done) pre_reset(-1);        // farm protocol: auto-reset obs
    return done;
  }

  void observe(void* out) const override {
    std::memcpy(out, stack, sizeof(stack));
  }
};

// ---------------------------------------------------------------------------
// Farm: N env instances + a persistent worker pool
// ---------------------------------------------------------------------------
struct Farm {
  std::vector<std::unique_ptr<EnvBase>> envs;
  int n = 0;
  int obs_dims[3] = {0, 0, 0};
  int obs_rank = 0;
  int obs_dtype = 0;     // 0 = float32, 1 = uint8
  int n_actions = 2;
  size_t obs_bytes = 0;  // per-env observation bytes

  // worker pool
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::atomic<int> next_index{0};
  std::atomic<int> remaining{0};
  uint64_t generation = 0;
  bool shutting_down = false;
  int chunk = 64;

  // current batch pointers (valid during a step_batch call)
  const int32_t* actions = nullptr;
  uint8_t* obs_out = nullptr;
  float* rew_out = nullptr;
  uint8_t* done_out = nullptr;

  Farm(const char* name, int n_envs, int n_threads, uint64_t seed,
       int max_noops)
      : n(n_envs) {
    envs.reserve(n);
    if (std::strcmp(name, "CartPole") == 0) {
      for (int i = 0; i < n; ++i) {
        auto e = std::make_unique<CartPole>();
        e->reset_seeded(seed + (uint64_t)i);
        envs.push_back(std::move(e));
      }
      obs_rank = 1; obs_dims[0] = CartPole::kObsDim;
      obs_dtype = 0; n_actions = 2;
      obs_bytes = sizeof(float) * CartPole::kObsDim;
    } else if (std::strcmp(name, "AtariStub") == 0) {
      for (int i = 0; i < n; ++i) {
        auto e = std::make_unique<AtariStub>(max_noops);
        e->reset_seeded(seed + (uint64_t)i);
        envs.push_back(std::move(e));
      }
      obs_rank = 3;
      obs_dims[0] = AtariStub::kDim; obs_dims[1] = AtariStub::kDim;
      obs_dims[2] = AtariStub::kStack;
      obs_dtype = 1; n_actions = FakeCore::kActions;
      obs_bytes = (size_t)AtariStub::kDim * AtariStub::kDim * AtariStub::kStack;
    } else {
      n = 0;           // caller checks farm_ok()
      return;
    }
    const int nw = n_threads > 0 ? n_threads : 1;
    // chunk sized so each thread sweeps ~8 chunks per batch (load balance
    // without contention; pixel envs are ~30 µs/step, CartPole ~0.1 µs)
    chunk = std::max(1, std::min(64, n / (nw * 8) + 1));
    workers.reserve(nw);
    for (int w = 0; w < nw; ++w) {
      workers.emplace_back([this] { worker_loop(); });
    }
  }

  bool ok() const { return n > 0; }

  ~Farm() {
    {
      std::lock_guard<std::mutex> lk(mu);
      shutting_down = true;
      ++generation;
    }
    cv_work.notify_all();
    for (auto& t : workers) t.join();
  }

  void worker_loop() {
    uint64_t seen_gen = 0;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return shutting_down || generation != seen_gen; });
        if (shutting_down) return;
        seen_gen = generation;
      }
      // grab chunks of envs until the batch is exhausted
      for (;;) {
        const int start = next_index.fetch_add(chunk);
        if (start >= n) break;
        const int end = start + chunk < n ? start + chunk : n;
        for (int i = start; i < end; ++i) {
          float reward = 0.0f;
          bool done = envs[i]->step(actions[i], &reward);
          envs[i]->observe(obs_out + (size_t)i * obs_bytes);
          rew_out[i] = reward;
          done_out[i] = done ? 1 : 0;
        }
        if (remaining.fetch_sub(end - start) == end - start) {
          cv_done.notify_one();
        }
      }
    }
  }

  void step_batch(const int32_t* acts, void* obs, float* rew, uint8_t* done) {
    {
      std::lock_guard<std::mutex> lk(mu);
      actions = acts; obs_out = static_cast<uint8_t*>(obs);
      rew_out = rew; done_out = done;
      // order matters for workers racing in via next_index (not only via
      // the generation wakeup): remaining must be live before the index
      // resets, or a racing fetch_sub would corrupt the countdown.
      remaining.store(n);
      next_index.store(0);
      ++generation;
    }
    cv_work.notify_all();
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [&] { return remaining.load() == 0; });
  }

  void reset_all(uint64_t seed_base, void* obs) {
    uint8_t* out = static_cast<uint8_t*>(obs);
    for (int i = 0; i < n; ++i) {
      envs[i]->reset_seeded(seed_base + (uint64_t)i);
      envs[i]->observe(out + (size_t)i * obs_bytes);
    }
  }
};

}  // namespace

extern "C" {

void* farm_create2(const char* env_name, int n_envs, int n_threads,
                   uint64_t seed, int max_noops) {
  Farm* f = new Farm(env_name, n_envs, n_threads, seed, max_noops);
  if (!f->ok()) { delete f; return nullptr; }
  return f;
}

void* farm_create(const char* env_name, int n_envs, int n_threads,
                  uint64_t seed) {
  return farm_create2(env_name, n_envs, n_threads, seed, 30);
}

int farm_obs_rank(void* farm) { return static_cast<Farm*>(farm)->obs_rank; }

void farm_obs_dims(void* farm, int32_t* out) {
  Farm* f = static_cast<Farm*>(farm);
  for (int i = 0; i < f->obs_rank; ++i) out[i] = f->obs_dims[i];
}

int farm_obs_dtype(void* farm) { return static_cast<Farm*>(farm)->obs_dtype; }

int farm_n_actions(void* farm) { return static_cast<Farm*>(farm)->n_actions; }

// kept for back-compat with round-4 callers (CartPole float obs)
int farm_obs_dim(void* farm) { return static_cast<Farm*>(farm)->obs_dims[0]; }

void farm_reset(void* farm, void* obs_out) {
  static_cast<Farm*>(farm)->reset_all(0, obs_out);
}

void farm_reset_seeded(void* farm, uint64_t seed_base, void* obs_out) {
  static_cast<Farm*>(farm)->reset_all(seed_base, obs_out);
}

void farm_step(void* farm, const int32_t* actions, void* obs_out,
               float* rew_out, uint8_t* done_out) {
  static_cast<Farm*>(farm)->step_batch(actions, obs_out, rew_out, done_out);
}

void farm_destroy(void* farm) { delete static_cast<Farm*>(farm); }

}  // extern "C"
