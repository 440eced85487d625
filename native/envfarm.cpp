// Native host environment farm.
//
// The reference's performance-critical native surface is third-party IPC:
// Arrow plasma shared memory + libzmq shuttling pickled trajectories
// between ~100 Python processes (reference zeus/common/ipc/*,
// xt/framework/broker.py).  In the TPU-native design, device-side envs
// need none of that — but *host-side* simulators (the AtariEnv/StarCraft
// role) still need a fast farm.  This module is that farm: environment
// dynamics in C++, stepped by a persistent pthread pool over a
// shared-memory batch (zero-copy numpy views via ctypes), one
// device<->host round trip per vectorized step.
//
// Env model mirrors xingtian_tpu.envs.core: step() auto-resets on done
// and returns the fresh observation; `done` flags the boundary.
//
// Build: make (g++ -O3 -march=native -shared -fPIC).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// CartPole-v0 dynamics (identical constants to envs/classic.py)
// ---------------------------------------------------------------------------
struct CartPole {
  static constexpr int kObsDim = 4;
  static constexpr float kGravity = 9.8f, kMassCart = 1.0f, kMassPole = 0.1f;
  static constexpr float kTotalMass = kMassCart + kMassPole;
  static constexpr float kLength = 0.5f, kPoleMassLength = kMassPole * kLength;
  static constexpr float kForceMag = 10.0f, kTau = 0.02f;
  static constexpr float kThetaLimit = 12.0f * 2.0f * (float)M_PI / 360.0f;
  static constexpr float kXLimit = 2.4f;
  static constexpr int kMaxSteps = 200;

  float x, x_dot, theta, theta_dot;
  int t;
  std::mt19937 rng;

  void reset() {
    std::uniform_real_distribution<float> d(-0.05f, 0.05f);
    x = d(rng); x_dot = d(rng); theta = d(rng); theta_dot = d(rng);
    t = 0;
  }

  // returns done; writes reward
  bool step(int action, float* reward) {
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
    return terminated || t >= kMaxSteps;
  }

  void observe(float* out) const {
    out[0] = x; out[1] = x_dot; out[2] = theta; out[3] = theta_dot;
  }
};

// ---------------------------------------------------------------------------
// Farm: N env instances + a persistent worker pool
// ---------------------------------------------------------------------------
struct Farm {
  std::vector<CartPole> envs;
  int n = 0;
  int obs_dim = CartPole::kObsDim;

  // worker pool
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::atomic<int> next_index{0};
  std::atomic<int> remaining{0};
  uint64_t generation = 0;
  bool shutting_down = false;

  // current batch pointers (valid during a step_batch call)
  const int32_t* actions = nullptr;
  float* obs_out = nullptr;
  float* rew_out = nullptr;
  uint8_t* done_out = nullptr;

  explicit Farm(int n_envs, int n_threads, uint64_t seed) : n(n_envs) {
    envs.resize(n);
    for (int i = 0; i < n; ++i) {
      envs[i].rng.seed(seed + (uint64_t)i * 0x9E3779B97F4A7C15ull);
      envs[i].reset();
    }
    const int nw = n_threads > 0 ? n_threads : 1;
    workers.reserve(nw);
    for (int w = 0; w < nw; ++w) {
      workers.emplace_back([this] { worker_loop(); });
    }
  }

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
      constexpr int kChunk = 64;
      for (;;) {
        const int start = next_index.fetch_add(kChunk);
        if (start >= n) break;
        const int end = start + kChunk < n ? start + kChunk : n;
        for (int i = start; i < end; ++i) {
          float reward = 0.0f;
          bool done = envs[i].step(actions[i], &reward);
          if (done) envs[i].reset();  // auto-reset; obs below is fresh
          envs[i].observe(obs_out + (size_t)i * obs_dim);
          rew_out[i] = reward;
          done_out[i] = done ? 1 : 0;
        }
        if (remaining.fetch_sub(end - start) == end - start) {
          cv_done.notify_one();
        }
      }
    }
  }

  void step_batch(const int32_t* acts, float* obs, float* rew, uint8_t* done) {
    {
      std::lock_guard<std::mutex> lk(mu);
      actions = acts; obs_out = obs; rew_out = rew; done_out = done;
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

  void reset_all(float* obs) {
    for (int i = 0; i < n; ++i) {
      envs[i].reset();
      envs[i].observe(obs + (size_t)i * obs_dim);
    }
  }
};

}  // namespace

extern "C" {

void* farm_create(const char* env_name, int n_envs, int n_threads,
                  uint64_t seed) {
  if (std::strcmp(env_name, "CartPole") != 0) return nullptr;
  return new Farm(n_envs, n_threads, seed);
}

int farm_obs_dim(void* farm) { return static_cast<Farm*>(farm)->obs_dim; }

void farm_reset(void* farm, float* obs_out) {
  static_cast<Farm*>(farm)->reset_all(obs_out);
}

void farm_step(void* farm, const int32_t* actions, float* obs_out,
               float* rew_out, uint8_t* done_out) {
  static_cast<Farm*>(farm)->step_batch(actions, obs_out, rew_out, done_out);
}

void farm_destroy(void* farm) { delete static_cast<Farm*>(farm); }

}  // extern "C"
