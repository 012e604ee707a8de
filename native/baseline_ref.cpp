// Native scalar CPU baseline proxy for the reference renderer.
//
// The reference (msakuta/ray-rust) publishes no performance numbers and no
// Rust toolchain exists in this image, so `bench.py`'s `vs_baseline` divides
// by a documented ESTIMATE (BENCH_NOTES.md). This program replaces the
// per-core part of that estimate with a MEASUREMENT: a C++ float32
// transliteration of the reference's trace semantics — the same role
// tests/oracle.py plays for correctness, here optimized the way the Rust
// binary is (scalar f32 math, -O3, scanline thread pool with an atomic row
// counter mirroring src/render.rs:836-898). It is a stand-in, not the Rust
// binary; BENCH_NOTES documents the remaining extrapolation (thread count).
//
// Semantics are written from the reference spec (citations inline) and match
// tests/oracle.py function-for-function; `--dump out.f32` writes the raw
// (H, W, 3) f32 frame so tests can pin this implementation against the
// checked-in oracle goldens (a second, independent-language golden source).
//
// Build:  g++ -O3 -march=native -std=c++17 -o baseline_ref baseline_ref.cpp -lpthread
// Run:    ./baseline_ref WIDTH HEIGHT [THREADS] [--dump out.f32]

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

// flags (render.rs:14-18)
static const int OUTONLY = 1;
static const int INONLY = 2;

static const int MAX_REFLECTIONS = 3;   // render.rs:11
static const int MAX_REFRACTIONS = 10;  // render.rs:12
static const float INF_F = std::numeric_limits<float>::infinity();
static const float EPS_F = std::numeric_limits<float>::epsilon();
static const float PI_F = 3.14159265358979323846f;

struct V {
  float x, y, z;
};
static inline V v3(float x, float y, float z) { return V{x, y, z}; }
static inline float dot(V a, V b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V add(V a, V b) { return V{a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V sub(V a, V b) { return V{a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V scale(V a, float s) { return V{a.x * s, a.y * s, a.z * s}; }
static inline V normalized(V a) {
  float ln = std::sqrt(dot(a, a));
  return V{a.x / ln, a.y / ln, a.z / ln};
}

struct Q {
  float x, y, z, w;
};
static inline Q qmul(Q a, Q b) {  // quat.rs:63-72
  return Q{a.y * b.z - a.z * b.y + a.x * b.w + a.w * b.x,
           a.z * b.x - a.x * b.z + a.y * b.w + a.w * b.y,
           a.x * b.y - a.y * b.x + a.z * b.w + a.w * b.z,
           -a.x * b.x - a.y * b.y - a.z * b.z + a.w * b.w};
}
static inline V qtransform(Q q, V v) {  // quat.rs:74-80
  Q qr = qmul(q, Q{v.x, v.y, v.z, 0.0f});
  Q c = Q{-q.x, -q.y, -q.z, q.w};
  Q r = qmul(qr, c);
  return V{r.x, r.y, r.z};
}
static inline Q qrotation(float p, float sx, float sy, float sz) {  // quat.rs:92-95
  float s = std::sin(p / 2.0f);
  return Q{s * sx, s * sy, s * sz, std::cos(p / 2.0f)};
}
static inline Q from_pyr(V pyr) {  // quat.rs:129-134
  Q mx = qrotation(pyr.z, 1, 0, 0);
  Q my = qrotation(pyr.y, 0, 0, 1);
  Q mp = qrotation(pyr.x, 0, 1, 0);
  return qmul(qmul(mx, my), mp);
}

static inline float fmod_ref(float f, float freq) {  // modutil.rs:1-3
  return f - std::floor(f / freq) * freq;
}

// ---------------------------------------------------------------------------
// Scene model (default scene only, src/main.rs:154-276; trace mode)
// ---------------------------------------------------------------------------
enum Kind { SPHERE, FLOOR };
enum Pattern { SOLID, GRADATION };

struct Mat {
  float diffuse[3];
  float specular[3];
  int pn;
  float t, n;
  Pattern pattern;
  float pattern_scale, pattern_angle_scale;
};

struct Obj {
  Kind kind;
  Mat mat;
  V org;
  float r;
  V normal;
  // uvmap is ZX for the floor (main.rs:208-212); spheres in the default
  // scene have no pattern, so only ZX is implemented here.
};

struct Env {
  V camera_pos;
  Q camera_rot;
  int xres, yres;
  float xfov, yfov;
  std::vector<Obj> objects;
  V light;
};

static Env default_env(int xres, int yres) {
  Mat floor_m{{1.0f, 1.0f, 0.0f}, {0, 0, 0}, 0,  0.0f, 0.0f,
              GRADATION,          300.0f,    0.2f};
  Mat mirror{{0, 0, 0}, {1.0f, 1.0f, 1.0f}, 24, 0.0f, 0.0f, SOLID, 1.0f, 1.0f};
  Mat red{{0.8f, 0, 0}, {0, 0, 0}, 24, 0.0f, 0.0f, SOLID, 1.0f, 1.0f};
  Mat glass{{0, 0, 0}, {0, 0, 0}, 0, 1.0f, 1.5f, SOLID, 1.0f, 1.0f};
  Env env;
  env.objects = {
      Obj{FLOOR, floor_m, v3(0, -300, 0), 0, v3(0, 1, 0)},
      Obj{SPHERE, mirror, v3(0, -30, 172), 80, {}},
      Obj{SPHERE, mirror, v3(-200, -30, 172), 80, {}},
      Obj{SPHERE, red, v3(-200, -200, 172), 80, {}},
      Obj{SPHERE, glass, v3(70, -200, 150), 100, {}},
  };
  env.camera_pos = v3(0, -150, -300);
  env.camera_rot = from_pyr(v3(0.0f, -PI_F / 2.0f, -PI_F / 2.0f));
  env.xres = xres;
  env.yres = yres;
  env.xfov = 1.0f;
  env.yfov = (float)yres / (float)xres;
  env.light = normalized(v3(50, 60, -50));
  return env;
}

// procedural sky (main.rs:231-260)
static void sky(const Env& env, V d, float out[3]) {
  float phi = std::atan2(d.z, d.x);
  float the = std::asin(d.y);
  float dd1 = std::fmod(50.0f * PI_F + phi * 10.0f * PI_F, 2.0f * PI_F) - PI_F;
  float dd2 = std::fmod(50.0f * PI_F + the * 10.0f * PI_F, 2.0f * PI_F) - PI_F;
  out[0] = 0.5f / (15.0f * (dd1 * dd1 * dd2 * dd2) + 1.0f);
  out[1] = 0.25f - d.y / 4.0f;
  out[2] = 0.25f - d.y / 4.0f;
  float dt = dot(env.light, d);
  if (dt > 0.9f) {
    if (0.9995f < dt) {
      out[0] = out[1] = out[2] = 2.0f;
      return;
    }
    if (0.995f < dt) {
      float dd = (dt - 0.995f) * 150.0f;
      out[0] += dd;
      out[1] += dd;
      out[2] += dd;
    }
    float dot2 = dt - 0.9f;
    out[0] += dot2 * 5.0f;
    out[1] += dot2 * 5.0f;
  }
}

// per-object hit (render.rs:447-471, 557-569)
static float obj_raycast(const Obj& o, V vi, V eye, float ray_length,
                         int flags) {
  if (o.kind == SPHERE) {
    V wpt = sub(vi, o.org);
    float b = 2.0f * dot(eye, wpt);
    float c = dot(wpt, wpt) - o.r * o.r;
    float d2 = b * b - 4.0f * c;
    if (d2 >= EPS_F) {
      float d = std::sqrt(d2);
      float t0 = (-b - d) / 2.0f;
      if (0 == (flags & OUTONLY) && t0 >= 0.0f && t0 < ray_length) return t0;
      if (0 == (flags & INONLY) && 0.0f < (t0 + d) && t0 + d < ray_length)
        return t0 + d;
    }
    return ray_length;
  }
  V wpt = sub(vi, o.org);
  float w = dot(o.normal, eye);
  if (w <= 0.0f) {
    float t0 = (-dot(o.normal, wpt)) / w;
    if (t0 >= 0.0f && t0 < ray_length) return t0;
  }
  return ray_length;
}

// nearest hit, linear scan (render.rs:993-1018)
static float raycast(const Env& env, V vi, V eye, int ig, int flags,
                     int* ret_idx) {
  float t = INF_F;
  int idx = 0;
  for (int i = 0; i < (int)env.objects.size(); i++) {
    if (i == ig) continue;
    float ot = obj_raycast(env.objects[i], vi, eye, t, flags);
    if (ot < t) {
      t = ot;
      idx = i;
    }
  }
  *ret_idx = idx;
  return t;
}

static inline V obj_normal(const Obj& o, V pos) {  // render.rs:443-445,553-555
  if (o.kind == SPHERE) return normalized(sub(pos, o.org));
  return o.normal;
}

static void raytrace(const Env& env, V vi, V eye, int lev, int ig, int flags,
                     float ret[3]);

// shading (render.rs:1020-1140)
static void shading(const Env& env, int idx, V n, V pt, V eye, int nest,
                    float out[3]) {
  const Obj& obj = env.objects[idx];
  float li = dot(env.light, n);
  float ln2 = 2.0f * li;
  V rtl = sub(scale(n, ln2), env.light);
  float diffuse_intensity = li > 0.0f ? li : 0.0f;
  V reflected_ray = add(pt, scale(env.light, EPS_F));
  float reflection_intensity = 0.0f;
  if (obj.mat.pn != 0) {
    float ri = -dot(rtl, eye);
    if (ri > 0.0f) reflection_intensity = std::pow(ri, (float)obj.mat.pn);
  }
  // shadow (render.rs:1048-1082)
  int si;
  float st = raycast(env, reflected_ray, env.light, idx, 0, &si);
  bool lit = !(st < INF_F) || 0.0f < env.objects[si].mat.t;
  float k1 = 0.2f, k2 = 0.0f;
  if (lit) {
    k1 = k1 + diffuse_intensity;
    if (k1 > 1.0f) k1 = 1.0f;
    k2 = reflection_intensity;
  }
  // pattern diffuse (render.rs:220-233 uv ZX; 310-314 gradation)
  float kd[3] = {obj.mat.diffuse[0], obj.mat.diffuse[1], obj.mat.diffuse[2]};
  if (obj.mat.pattern == GRADATION) {
    V rel = sub(pt, obj.org);
    float u = rel.z / obj.mat.pattern_scale;
    float v = rel.x / obj.mat.pattern_scale;
    kd[0] = kd[0] * fmod_ref(u, 1.0f);
    kd[1] = kd[1] * fmod_ref(v, 1.0f);
  }
  // pseudo-refraction (render.rs:1093-1132)
  if (nest < MAX_REFRACTIONS && 0.0f < obj.mat.t) {
    float sp = dot(eye, n);
    float fm = obj.mat.t;
    float frac = obj.mat.n;
    float reference = sp * ((sp > 0.0f ? frac : 1.0f / frac) - 1.0f);
    V ray = normalized(add(eye, scale(n, reference)));
    V pt3 = add(pt, scale(ray, EPS_F));
    float fc2[3];
    raytrace(env, pt3, ray, nest, idx, sp < 0.0f ? OUTONLY : INONLY, fc2);
    for (int c = 0; c < 3; c++)
      out[c] = (kd[c] * k1 + k2) * (1.0f - fm) + fc2[c] * fm;
    return;
  }
  for (int c = 0; c < 3; c++) out[c] = kd[c] * k1 + k2;
}

// Whitted loop (render.rs:1142-1224); IGNORE flags are never set by any
// caller in the reference (vestigial), so the per-channel guards are elided.
static void raytrace(const Env& env, V vi, V eye, int lev, int ig, int flags,
                     float ret[3]) {
  float fcs[3] = {1.0f, 1.0f, 1.0f};
  ret[0] = ret[1] = ret[2] = 0.0f;
  for (;;) {
    lev += 1;
    int idx;
    float t = raycast(env, vi, eye, ig, flags, &idx);
    if (t < INF_F) {
      V pt = add(scale(eye, t), vi);
      const Obj& obj = env.objects[idx];
      V n = obj_normal(obj, pt);
      float face[3];
      shading(env, idx, n, pt, eye, lev, face);
      for (int c = 0; c < 3; c++) {
        ret[c] += face[c] * fcs[c];
        fcs[c] *= obj.mat.specular[c];
      }
      if (idx == 0) break;
      if (fcs[0] + fcs[1] + fcs[2] <= 0.1f) break;
      if (lev >= MAX_REFLECTIONS) break;
      vi = pt;
      float en2 = -2.0f * dot(eye, n);
      eye = add(eye, scale(n, en2));
      if (dot(n, eye) < 0.0f)
        flags = (flags & ~INONLY) | OUTONLY;
      else
        flags = (flags & ~OUTONLY) | INONLY;
      ig = idx;
    } else {
      float fc2[3];
      sky(env, eye, fc2);
      for (int c = 0; c < 3; c++) ret[c] += fc2[c] * fcs[c];
    }
    if (!(t < INF_F && lev < MAX_REFLECTIONS)) break;
  }
}

int main(int argc, char** argv) {
  int W = argc > 1 ? std::atoi(argv[1]) : 1920;
  int H = argc > 2 ? std::atoi(argv[2]) : 1080;
  int threads = argc > 3 && argv[3][0] != '-' ? std::atoi(argv[3])
                                              : (int)std::thread::hardware_concurrency();
  const char* dump = nullptr;
  for (int i = 1; i < argc - 1; i++)
    if (!std::strcmp(argv[i], "--dump")) dump = argv[i + 1];

  Env env = default_env(W, H);
  std::vector<float> img((size_t)W * H * 3);

  // scanline pool with atomic work-stealing row counter (render.rs:836-898)
  auto t0 = std::chrono::steady_clock::now();
  std::atomic<int> row{0};
  std::vector<std::thread> pool;
  for (int w = 0; w < threads; w++) {
    pool.emplace_back([&]() {
      for (;;) {
        int iy = row.fetch_add(1);
        if (iy >= H) return;
        for (int ix = 0; ix < W; ix++) {
          // camera ray (render.rs:808-815)
          V eye = v3(1.0f,
                     (float)(ix - W / 2) * 2.0f * env.xfov / (float)W,
                     -(float)(iy - H / 2) * 2.0f * env.yfov / (float)H);
          eye = normalized(qtransform(env.camera_rot, eye));
          float* px = &img[((size_t)iy * W + ix) * 3];
          raytrace(env, env.camera_pos, eye, 0, -1, 0, px);
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  double secs = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
                    .count();

  if (dump) {
    FILE* f = std::fopen(dump, "wb");
    std::fwrite(img.data(), sizeof(float), img.size(), f);
    std::fclose(f);
  }
  double mrays = (double)W * H / secs / 1e6;
  std::printf("{\"w\": %d, \"h\": %d, \"threads\": %d, \"seconds\": %.4f, "
              "\"primary_mrays\": %.4f}\n",
              W, H, threads, secs, mrays);
  return 0;
}
