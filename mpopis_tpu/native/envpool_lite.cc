// envpool_lite — a minimal native batched-environment engine for MuJoCo.
//
// TPU-native equivalent of the reference's external envpool dependency (the
// C++ thread-pool batched env engine reached through PyCall at
// src/envs/envpool_env.jl:35-61): steps K MuJoCo environments in parallel on
// host threads, with TRUE snapshot/restore (qpos/qvel/time/ctrl copies)
// instead of envpool's restore-by-replay workaround
// (envpool_env.jl:112-125,167-182).
//
// Exposed as a plain C API consumed from Python via ctypes (no pybind11).
// Task-specific observation/reward follow the gymnasium v4 definitions so
// action-sequence replays cross-check against gym exactly (the reference's
// make_mujoco_gif.py correctness scheme).

#include <mujoco/mujoco.h>

#include <cmath>
#include <cstring>
#include <functional>
#include <string>
#include <thread>
#include <vector>

namespace {

enum TaskId : int {
  kHalfCheetah = 0,
  kSwimmer = 1,
  kHopper = 2,
  kWalker2d = 3,
  kAnt = 4,
};

// ---------------------------------------------------------------------------
// Parallel-for over env indices (OpenMP).
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) : nthreads_(n > 0 ? n : 1) {}

  void ParallelFor(int n, const std::function<void(int)>& fn) {
#pragma omp parallel for schedule(static) num_threads(nthreads_)
    for (int i = 0; i < n; ++i) fn(i);
  }

 private:
  int nthreads_;
};

struct Snapshot {
  std::vector<double> qpos, qvel, act;
  double time;
};

struct Engine {
  mjModel* model = nullptr;
  std::vector<mjData*> data;
  std::vector<Snapshot> snaps;
  ThreadPool* pool = nullptr;
  int num_envs = 0;
  int frame_skip = 5;
  int task = kHalfCheetah;
  int obs_dim = 0;
  double dt() const { return model->opt.timestep * frame_skip; }
};

int ObsDim(const Engine& e) {
  const int nq = e.model->nq, nv = e.model->nv;
  switch (e.task) {
    case kHalfCheetah:  // qpos[1:] + qvel
    case kHopper:       // qpos[1:] + clip(qvel, ±10)
    case kWalker2d:
      return (nq - 1) + nv;
    case kSwimmer:  // qpos[2:] + qvel
      return (nq - 2) + nv;
    case kAnt:  // qpos[2:] + qvel (v4 default: no contact forces)
      return (nq - 2) + nv;
  }
  return nq + nv;
}

void GetObs(const Engine& e, int i, double* out) {
  const mjData* d = e.data[i];
  const int nq = e.model->nq, nv = e.model->nv;
  int skip = (e.task == kSwimmer || e.task == kAnt) ? 2 : 1;
  int k = 0;
  for (int j = skip; j < nq; ++j) out[k++] = d->qpos[j];
  for (int j = 0; j < nv; ++j) {
    double v = d->qvel[j];
    if (e.task == kHopper || e.task == kWalker2d) {
      v = std::fmin(std::fmax(v, -10.0), 10.0);
    }
    out[k++] = v;
  }
}

double Reward(const Engine& e, int i, const double* action, double x_before) {
  const mjData* d = e.data[i];
  double ctrl2 = 0.0;
  for (int j = 0; j < e.model->nu; ++j) ctrl2 += action[j] * action[j];
  const double x_vel = (d->qpos[0] - x_before) / e.dt();
  switch (e.task) {
    case kHalfCheetah:
      return x_vel - 0.1 * ctrl2;
    case kSwimmer:
      return x_vel - 1e-4 * ctrl2;
    case kHopper:
      return 1.0 + x_vel - 1e-3 * ctrl2;  // healthy_reward + forward - ctrl
    case kWalker2d:
      return 1.0 + x_vel - 1e-3 * ctrl2;
    case kAnt:
      return 1.0 + x_vel - 0.5 * ctrl2;  // healthy + forward - ctrl (no contact cost)
  }
  return 0.0;
}

void StepOne(Engine& e, int i, const double* actions, double* obs, double* rew) {
  mjData* d = e.data[i];
  const double* a = actions + i * e.model->nu;
  const double x_before = d->qpos[0];
  for (int j = 0; j < e.model->nu; ++j) d->ctrl[j] = a[j];
  for (int f = 0; f < e.frame_skip; ++f) mj_step(e.model, d);
  if (rew) rew[i] = Reward(e, i, a, x_before);
  if (obs) GetObs(e, i, obs + i * e.obs_dim);
}

}  // namespace

extern "C" {

// Returns an opaque handle, or nullptr on failure (check epl_last_error).
static thread_local char g_error[1024];

const char* epl_last_error() { return g_error; }

void* epl_create(const char* xml_path, int num_envs, int frame_skip,
                 int task_id, int num_threads) {
  char err[512] = {0};
  mjModel* m = mj_loadXML(xml_path, nullptr, err, sizeof(err));
  if (!m) {
    snprintf(g_error, sizeof(g_error), "mj_loadXML failed: %s", err);
    return nullptr;
  }
  auto* e = new Engine;
  e->model = m;
  e->num_envs = num_envs;
  e->frame_skip = frame_skip;
  e->task = task_id;
  e->obs_dim = ObsDim(*e);
  e->data.resize(num_envs);
  e->snaps.resize(num_envs);
  for (int i = 0; i < num_envs; ++i) e->data[i] = mj_makeData(m);
  int nthreads = num_threads > 0
                     ? num_threads
                     : static_cast<int>(std::thread::hardware_concurrency());
  if (nthreads > num_envs) nthreads = num_envs;
  e->pool = new ThreadPool(nthreads);
  return e;
}

int epl_obs_dim(void* h) { return static_cast<Engine*>(h)->obs_dim; }
int epl_action_dim(void* h) { return static_cast<Engine*>(h)->model->nu; }
int epl_num_envs(void* h) { return static_cast<Engine*>(h)->num_envs; }
double epl_dt(void* h) { return static_cast<Engine*>(h)->dt(); }

void epl_ctrl_range(void* h, double* low, double* high) {
  Engine* e = static_cast<Engine*>(h);
  for (int j = 0; j < e->model->nu; ++j) {
    low[j] = e->model->actuator_ctrlrange[2 * j];
    high[j] = e->model->actuator_ctrlrange[2 * j + 1];
  }
}

// Deterministic reset (reset_noise_scale = 0): qpos0 / zero qvel.
void epl_reset(void* h, double* obs) {
  Engine* e = static_cast<Engine*>(h);
  e->pool->ParallelFor(e->num_envs, [&](int i) {
    mj_resetData(e->model, e->data[i]);
    mj_forward(e->model, e->data[i]);
    if (obs) GetObs(*e, i, obs + i * e->obs_dim);
  });
}

// actions: (num_envs, nu) row-major; obs: (num_envs, obs_dim); rew: (num_envs)
void epl_step(void* h, const double* actions, double* obs, double* rew) {
  Engine* e = static_cast<Engine*>(h);
  e->pool->ParallelFor(e->num_envs,
                       [&](int i) { StepOne(*e, i, actions, obs, rew); });
}

void epl_snapshot(void* h) {
  Engine* e = static_cast<Engine*>(h);
  e->pool->ParallelFor(e->num_envs, [&](int i) {
    Snapshot& s = e->snaps[i];
    const mjData* d = e->data[i];
    s.qpos.assign(d->qpos, d->qpos + e->model->nq);
    s.qvel.assign(d->qvel, d->qvel + e->model->nv);
    s.act.assign(d->act, d->act + e->model->na);
    s.time = d->time;
  });
}

void epl_restore(void* h) {
  Engine* e = static_cast<Engine*>(h);
  e->pool->ParallelFor(e->num_envs, [&](int i) {
    const Snapshot& s = e->snaps[i];
    mjData* d = e->data[i];
    std::memcpy(d->qpos, s.qpos.data(), sizeof(double) * e->model->nq);
    std::memcpy(d->qvel, s.qvel.data(), sizeof(double) * e->model->nv);
    if (e->model->na)
      std::memcpy(d->act, s.act.data(), sizeof(double) * e->model->na);
    d->time = s.time;
    mj_forward(e->model, d);
  });
}

// Broadcast env 0's current physics state to all envs.
void epl_sync_from_first(void* h) {
  Engine* e = static_cast<Engine*>(h);
  const mjData* src = e->data[0];
  e->pool->ParallelFor(e->num_envs, [&](int i) {
    if (i == 0) return;
    mjData* d = e->data[i];
    std::memcpy(d->qpos, src->qpos, sizeof(double) * e->model->nq);
    std::memcpy(d->qvel, src->qvel, sizeof(double) * e->model->nv);
    if (e->model->na) std::memcpy(d->act, src->act, sizeof(double) * e->model->na);
    d->time = src->time;
    mj_forward(e->model, d);
  });
}

void epl_destroy(void* h) {
  Engine* e = static_cast<Engine*>(h);
  delete e->pool;
  for (auto* d : e->data) mj_deleteData(d);
  mj_deleteModel(e->model);
  delete e;
}

}  // extern "C"
