// Host-side trajectory store for the RL data path.
//
// The reference delegates rollout storage/batching to Ray RLlib's C++-backed
// sample collectors (SURVEY.md §2.9-2.10: the only process boundary in the
// system). This is the TPU build's native equivalent: a lock-guarded episode
// ring buffer with a zero-padding batch sampler, bound to Python via ctypes
// (no pybind11 in the image). The sampler emits exactly the fixed-shape
// [B, T_max, F] + taus[B] layout SparseGCM consumes (zero-padded ragged
// windows, reference sparse_gcm.py:73-99), so device code never sees ragged
// data.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <vector>

namespace {

struct Episode {
  std::vector<float> obs;      // T * obs_dim
  std::vector<int32_t> acts;   // T
  std::vector<float> rews;     // T
  int32_t T = 0;
};

struct ReplayBuffer {
  std::mutex mu;
  size_t capacity_steps;
  int obs_dim;
  size_t total_steps = 0;
  uint64_t appended_episodes = 0;
  std::deque<Episode> episodes;
};

}  // namespace

extern "C" {

void* rb_create(size_t capacity_steps, int obs_dim) {
  auto* rb = new ReplayBuffer();
  rb->capacity_steps = capacity_steps;
  rb->obs_dim = obs_dim;
  return rb;
}

void rb_destroy(void* h) { delete static_cast<ReplayBuffer*>(h); }

// Append one episode; evicts oldest episodes when over capacity.
// Returns the running episode counter.
int64_t rb_append_episode(void* h, const float* obs, const int32_t* acts,
                          const float* rews, int32_t T) {
  auto* rb = static_cast<ReplayBuffer*>(h);
  std::lock_guard<std::mutex> lock(rb->mu);
  Episode ep;
  ep.T = T;
  ep.obs.assign(obs, obs + static_cast<size_t>(T) * rb->obs_dim);
  ep.acts.assign(acts, acts + T);
  ep.rews.assign(rews, rews + T);
  rb->total_steps += T;
  rb->episodes.push_back(std::move(ep));
  while (rb->total_steps > rb->capacity_steps && rb->episodes.size() > 1) {
    rb->total_steps -= rb->episodes.front().T;
    rb->episodes.pop_front();
  }
  return static_cast<int64_t>(++rb->appended_episodes);
}

int32_t rb_num_episodes(void* h) {
  auto* rb = static_cast<ReplayBuffer*>(h);
  std::lock_guard<std::mutex> lock(rb->mu);
  return static_cast<int32_t>(rb->episodes.size());
}

int64_t rb_total_steps(void* h) {
  auto* rb = static_cast<ReplayBuffer*>(h);
  std::lock_guard<std::mutex> lock(rb->mu);
  return static_cast<int64_t>(rb->total_steps);
}

// Sample B episodes uniformly (with replacement) and write zero-padded
// fixed-shape batches: obs_out [B, T_max, F], act_out [B, T_max],
// rew_out [B, T_max], taus_out [B] = min(episode length, T_max).
// Episodes longer than T_max contribute their first T_max steps.
void rb_sample_batch(void* h, int32_t B, int32_t T_max, uint64_t seed,
                     float* obs_out, int32_t* act_out, float* rew_out,
                     int32_t* taus_out) {
  auto* rb = static_cast<ReplayBuffer*>(h);
  std::lock_guard<std::mutex> lock(rb->mu);
  const int F = rb->obs_dim;
  std::memset(obs_out, 0, sizeof(float) * B * T_max * F);
  std::memset(act_out, 0, sizeof(int32_t) * B * T_max);
  std::memset(rew_out, 0, sizeof(float) * B * T_max);
  std::memset(taus_out, 0, sizeof(int32_t) * B);
  if (rb->episodes.empty()) return;
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<size_t> pick(0, rb->episodes.size() - 1);
  for (int b = 0; b < B; ++b) {
    const Episode& ep = rb->episodes[pick(rng)];
    const int32_t tau = std::min(ep.T, T_max);
    taus_out[b] = tau;
    std::memcpy(obs_out + static_cast<size_t>(b) * T_max * F, ep.obs.data(),
                sizeof(float) * tau * F);
    std::memcpy(act_out + static_cast<size_t>(b) * T_max, ep.acts.data(),
                sizeof(int32_t) * tau);
    std::memcpy(rew_out + static_cast<size_t>(b) * T_max, ep.rews.data(),
                sizeof(float) * tau);
  }
}

// Pack a ragged edge list (lengths[i] edges each, concatenated sink/source
// rows) into the fixed [B, 2, max_edges] sentinel layout — the native
// counterpart of util.pack_hidden's per-batch loop (util.py:343-351).
// Returns the number of batches that overflowed (their tails truncated).
int32_t pack_edges(const int64_t* sinks, const int64_t* sources,
                   const int64_t* lengths, int32_t B, int32_t max_edges,
                   int32_t edge_fill, int64_t* out /* B*2*max_edges */) {
  int32_t overflowed = 0;
  size_t off = 0;
  for (int b = 0; b < B; ++b) {
    int64_t len = lengths[b];
    if (len > max_edges) {
      ++overflowed;
      len = max_edges;
    }
    int64_t* row_sink = out + static_cast<size_t>(b) * 2 * max_edges;
    int64_t* row_src = row_sink + max_edges;
    for (int64_t e = 0; e < max_edges; ++e) {
      row_sink[e] = e < len ? sinks[off + e] : edge_fill;
      row_src[e] = e < len ? sources[off + e] : edge_fill;
    }
    off += static_cast<size_t>(lengths[b]);
  }
  return overflowed;
}

}  // extern "C"
