// cpu_proxy: C++ stand-in for the reference Go CPU renderer, used ONLY to
// measure the missing performance baseline (BASELINE.md first task).
//
// The image has no Go toolchain and no network (attempt log in
// BASELINE.md), so this is a line-faithful C++17 port of the reference's
// CPU-contract hot path, written fresh from the behavioral spec in
// SURVEY.md §3.4:
//   * integrator  rayColorOpt            (internal/engine/renderer.go:286-404)
//   * materials   scatter/emitted        (internal/engine/materials.go:67-224)
//   * primitives  sphere/plane/box hit   (internal/engine/objects.go:37-222)
//   * camera      newCamera/getRay       (internal/engine/camera.go:19-74)
//   * driver      renderIntoCPU          (internal/engine/renderer.go:44-246)
// Same float64 math, same recursion, same linear object scan, same 32x32
// tile queue with NumCPU worker threads.  The RNG is xorshift64* — faster
// than Go's math/rand, i.e. GENEROUS to the baseline.
//
// Input: a flat text scene dump produced by baseline/export_scene.py.
// Output: timing + Mrays/s on stdout (one JSON line), PPM image optional.

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

struct V3 {
  double x = 0, y = 0, z = 0;
  V3 operator+(V3 o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator-(V3 o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator*(double s) const { return {x * s, y * s, z * s}; }
  V3 operator*(V3 o) const { return {x * o.x, y * o.y, z * o.z}; }
  double dot(V3 o) const { return x * o.x + y * o.y + z * o.z; }
  V3 cross(V3 o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double len2() const { return dot(*this); }
  double len() const { return std::sqrt(len2()); }
  V3 norm() const {
    double l = len();
    return l > 0 ? V3{x / l, y / l, z / l} : V3{0, 0, 0};
  }
};

// xorshift64* per-thread RNG (generous stand-in for Go math/rand)
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9E3779B97F4A7C15ull) {}
  double next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return double((s * 0x2545F4914F6CDD1Dull) >> 11) * (1.0 / 9007199254740992.0);
  }
};

// math.go:66-85 randomInUnitSphere (rejection loop, as the reference)
static V3 rand_in_unit_sphere(Rng &r) {
  for (;;) {
    V3 p{2 * r.next() - 1, 2 * r.next() - 1, 2 * r.next() - 1};
    if (p.len2() < 1.0) return p;
  }
}

// math.go:94-131 randomCosineDirection via ONB around n
static V3 cosine_direction(Rng &r, V3 n) {
  double r1 = r.next(), r2 = r.next();
  double z = std::sqrt(1.0 - r2);
  double phi = 2.0 * M_PI * r1;
  double x = std::cos(phi) * std::sqrt(r2);
  double y = std::sin(phi) * std::sqrt(r2);
  V3 a = std::fabs(n.x) > 0.9 ? V3{0, 1, 0} : V3{1, 0, 0};
  V3 v = n.cross(a).norm();
  V3 u = n.cross(v);
  return (u * x + v * y + n * z).norm();
}

static V3 reflect(V3 v, V3 n) { return v - n * (2 * v.dot(n)); }

// math.go:48-64 refract (Snell), TIR-safe
static V3 refract(V3 uv, V3 n, double etai_over_etat) {
  double cos_theta = std::fmin((uv * -1.0).dot(n), 1.0);
  V3 r_perp = (uv + n * cos_theta) * etai_over_etat;
  double k = 1.0 - r_perp.len2();
  V3 r_par = n * -std::sqrt(std::fabs(k));
  return r_perp + r_par;
}

// materials.go:226-231 Schlick
static double reflectance(double cosine, double ref_idx) {
  double r0 = (1 - ref_idx) / (1 + ref_idx);
  r0 *= r0;
  return r0 + (1 - r0) * std::pow(1 - cosine, 5.0);
}

enum MatType { LAMBERT = 0, METAL = 1, DIELECTRIC = 2, EMISSIVE = 3, MIRROR = 4 };
enum ObjType { SPHERE = 0, PLANE = 1, BOX = 2 };

struct Material {
  int typ;
  double rough, ior, smoothness;
  V3 albedo;
  double reflectivity;
  V3 emit;  // already emit*power
  V3 absorption;
  double absorption_scale;
  V3 tint;
};

struct Object {
  int typ, mat;
  V3 pos, size;
};

struct Scene {
  std::vector<Material> mats;
  std::vector<Object> objs;
  // camera
  V3 cpos, ctarget, cup;
  double fov, aperture, focus, aspect;
  // sky: 0 legacy bg, 1 solid, 2 gradient
  int sky_mode;
  V3 sky_a, sky_b;
};

struct HitRec {
  double t;
  V3 p, normal;
  bool front_face;
  int mat;
  int obj;
};

// objects.go:37-89 sphere.hit
static bool hit_sphere(const Object &o, V3 ro, V3 rd, double tmin, double tmax,
                       HitRec &rec) {
  V3 oc = ro - o.pos;
  double a = rd.len2();
  double half_b = oc.dot(rd);
  double c = oc.len2() - o.size.x * o.size.x;
  double disc = half_b * half_b - a * c;
  if (disc < 0) return false;
  double sq = std::sqrt(disc);
  double root = (-half_b - sq) / a;
  if (root < tmin || root > tmax) {
    root = (-half_b + sq) / a;
    if (root < tmin || root > tmax) return false;
  }
  rec.t = root;
  rec.p = ro + rd * root;
  V3 out_n = (rec.p - o.pos) * (1.0 / o.size.x);
  rec.front_face = rd.dot(out_n) < 0;
  rec.normal = rec.front_face ? out_n : out_n * -1.0;
  return true;
}

// objects.go:98-133 plane.hit (+Y normal fixed)
static bool hit_plane(const Object &o, V3 ro, V3 rd, double tmin, double tmax,
                      HitRec &rec) {
  if (std::fabs(rd.y) < 1e-8) return false;
  double t = (o.pos.y - ro.y) / rd.y;
  if (t < tmin || t > tmax) return false;
  rec.t = t;
  rec.p = ro + rd * t;
  V3 out_n{0, 1, 0};
  rec.front_face = rd.dot(out_n) < 0;
  rec.normal = rec.front_face ? out_n : out_n * -1.0;
  return true;
}

// objects.go:141-222 box.hit (slab + nearest-face normal)
static bool hit_box(const Object &o, V3 ro, V3 rd, double tmin, double tmax,
                    HitRec &rec) {
  V3 half = o.size * 0.5;
  V3 lo = o.pos - half, hi = o.pos + half;
  double t0 = tmin, t1 = tmax;
  const double ro_[3] = {ro.x, ro.y, ro.z}, rd_[3] = {rd.x, rd.y, rd.z};
  const double lo_[3] = {lo.x, lo.y, lo.z}, hi_[3] = {hi.x, hi.y, hi.z};
  for (int a = 0; a < 3; a++) {
    double inv = 1.0 / rd_[a];
    double ta = (lo_[a] - ro_[a]) * inv, tb = (hi_[a] - ro_[a]) * inv;
    if (inv < 0) std::swap(ta, tb);
    t0 = ta > t0 ? ta : t0;
    t1 = tb < t1 ? tb : t1;
    if (t1 <= t0) return false;
  }
  rec.t = t0;
  rec.p = ro + rd * t0;
  V3 l = rec.p - o.pos;
  const double eps = 1e-4;
  V3 out_n{0, 0, 0};
  if (std::fabs(std::fabs(l.x) - half.x) < eps)
    out_n = {l.x > 0 ? 1.0 : -1.0, 0, 0};
  else if (std::fabs(std::fabs(l.y) - half.y) < eps)
    out_n = {0, l.y > 0 ? 1.0 : -1.0, 0};
  else
    out_n = {0, 0, l.z > 0 ? 1.0 : -1.0};
  rec.front_face = rd.dot(out_n) < 0;
  rec.normal = rec.front_face ? out_n : out_n * -1.0;
  return true;
}

static bool hit_object(const Object &o, V3 ro, V3 rd, double tmin, double tmax,
                       HitRec &rec) {
  switch (o.typ) {
    case SPHERE: return hit_sphere(o, ro, rd, tmin, tmax, rec);
    case PLANE: return hit_plane(o, ro, rd, tmin, tmax, rec);
    default: return hit_box(o, ro, rd, tmin, tmax, rec);
  }
}

// renderer.go:293-302 linear closest-hit scan
static bool hit_world(const Scene &sc, V3 ro, V3 rd, double tmin, double tmax,
                      HitRec &rec) {
  bool any = false;
  double closest = tmax;
  HitRec tmp;
  for (size_t i = 0; i < sc.objs.size(); i++) {
    if (hit_object(sc.objs[i], ro, rd, tmin, closest, tmp)) {
      any = true;
      closest = tmp.t;
      tmp.mat = sc.objs[i].mat;
      tmp.obj = int(i);
      rec = tmp;
    }
  }
  return any;
}

static V3 sky_color(const Scene &sc, V3 rd) {
  V3 u = rd.norm();
  if (sc.sky_mode == 2) {
    double t = 0.5 * (u.y + 1.0);
    return sc.sky_a * (1.0 - t) + sc.sky_b * t;  // horizon -> zenith
  }
  if (sc.sky_mode == 1) return sc.sky_a;
  double t = 0.5 * (u.y + 1.0);
  return V3{1, 1, 1} * (1.0 - t) + sc.sky_a * t;  // legacy background blend
}

// materials.go:74-224 scatter
static bool scatter(const Scene &sc, Rng &rng, const Material &m, V3 rd,
                    const HitRec &rec, V3 &attenuation, V3 &sorig, V3 &sdir) {
  V3 unit_d = rd.norm();
  switch (m.typ) {
    case LAMBERT: {
      V3 dir = cosine_direction(rng, rec.normal);
      if (m.rough > 0)
        dir = (dir + rand_in_unit_sphere(rng) * (m.rough * 0.1)).norm();
      sorig = rec.p;
      sdir = dir;
      attenuation = m.albedo;
      return true;
    }
    case METAL: {
      double rough = m.smoothness > 0 ? 1.0 - m.smoothness : m.rough;
      if (rough < 0) rough = 0;
      if (rough > 1) rough = 1;
      V3 refl = reflect(unit_d, rec.normal);
      V3 dir = refl;
      if (rough > 1e-6) {
        double alpha = rough * rough;
        V3 cos_l = cosine_direction(rng, refl);
        V3 blend = refl * (1.0 - alpha) + cos_l * alpha;
        dir = blend.len2() < 1e-8 ? refl : blend.norm();
        if (dir.dot(rec.normal) <= 0) dir = refl;
      }
      sorig = rec.p;
      sdir = dir;
      attenuation = m.albedo;
      return dir.dot(rec.normal) > 0;
    }
    case DIELECTRIC: {
      double ior = m.ior == 0 ? 1.5 : m.ior;
      attenuation = {1, 1, 1};
      double ratio = rec.front_face ? 1.0 / ior : ior;
      double cos_t = std::fmin((unit_d * -1.0).dot(rec.normal), 1.0);
      double sin_t = std::sqrt(std::fmax(0.0, 1.0 - cos_t * cos_t));
      bool cannot = ratio * sin_t > 1.0;
      V3 dir;
      if (cannot || reflectance(cos_t, ratio) > rng.next())
        dir = reflect(unit_d, rec.normal);
      else
        dir = refract(unit_d, rec.normal, ratio);
      sorig = rec.p;
      sdir = dir;
      return true;
    }
    case EMISSIVE: return false;  // absorbs (materials.go:202-203)
    default: {  // MIRROR: perfect reflect
      V3 dir = reflect(unit_d, rec.normal);
      sorig = rec.p;
      sdir = dir;
      attenuation = m.albedo;
      return dir.dot(rec.normal) > 0;
    }
  }
}

static thread_local long g_segments = 0;

// renderer.go:286-404 rayColorOpt (recursive), incl. the dielectric
// backface exit scan for Beer-Lambert (:316-371) and RR (:373-393)
static V3 ray_color(const Scene &sc, Rng &rng, V3 ro, V3 rd, int depth,
                    int max_depth) {
  if (depth <= 0) return {0, 0, 0};
  g_segments++;
  HitRec rec;
  if (!hit_world(sc, ro, rd, 0.001, 1e18, rec)) return sky_color(sc, rd);

  const Material &m = sc.mats[rec.mat];
  V3 emitted = m.emit;
  V3 attenuation, sorig, sdir;
  if (!scatter(sc, rng, m, rd, rec, attenuation, sorig, sdir)) return emitted;

  // dielectric Beer-Lambert exit scan (renderer.go:316-371)
  if (m.typ == DIELECTRIC && rec.front_face) {
    HitRec ex;
    bool found = false;
    double best = 1e18;
    HitRec tmp;
    for (size_t i = 0; i < sc.objs.size(); i++) {
      if (sc.mats[sc.objs[i].mat].typ != DIELECTRIC) continue;
      if (hit_object(sc.objs[i], sorig, sdir, 1e-4, best, tmp) &&
          !tmp.front_face) {
        double d2 = (tmp.p - sorig).len2();
        if (d2 > 1e-8 && d2 < 1000.0) {
          found = true;
          best = tmp.t;
          ex = tmp;
        }
      }
    }
    if (found) {
      double dist = (ex.p - sorig).len();
      if (m.absorption.x > 0 || m.absorption.y > 0 || m.absorption.z > 0) {
        attenuation = {std::exp(-m.absorption.x * dist),
                       std::exp(-m.absorption.y * dist),
                       std::exp(-m.absorption.z * dist)};
      }
      sorig = ex.p;
    }
  }

  // russian roulette (renderer.go:373-393)
  int remaining = depth;  // this recursion counts down from max
  if (remaining <= 3) {
    double p = std::fmax(attenuation.x, std::fmax(attenuation.y, attenuation.z));
    if (p > 0.95) p = 0.95;
    if (p < 1e-6 || rng.next() > p) return emitted;
    attenuation = attenuation * (1.0 / p);
  }
  (void)max_depth;
  V3 nc = ray_color(sc, rng, sorig, sdir, depth - 1, max_depth);
  return emitted + attenuation * nc;
}

struct Camera {
  V3 origin, ll, horiz, vert, u, v, w;
  double lens_radius;
};

// camera.go:19-74
static Camera make_camera(const Scene &sc, double aspect) {
  Camera c;
  double theta = sc.fov * M_PI / 180.0;
  double h = std::tan(theta / 2);
  double vh = 2.0 * h, vw = aspect * vh;
  c.w = (sc.cpos - sc.ctarget).norm();
  c.u = sc.cup.cross(c.w).norm();
  c.v = c.w.cross(c.u);
  double focus = sc.focus != 0 ? sc.focus : (sc.cpos - sc.ctarget).len();
  c.origin = sc.cpos;
  c.horiz = c.u * (vw * focus);
  c.vert = c.v * (vh * focus);
  c.ll = c.origin - c.horiz * 0.5 - c.vert * 0.5 - c.w * focus;
  c.lens_radius = sc.aperture / 2;
  return c;
}

static void get_ray(const Camera &c, Rng &rng, double s, double t, V3 &ro,
                    V3 &rd) {
  V3 off{0, 0, 0};
  if (c.lens_radius > 0) {
    V3 rdisk = rand_in_unit_sphere(rng) * c.lens_radius;  // unit BALL (camera.go:62)
    off = c.u * rdisk.x + c.v * rdisk.y;
  }
  ro = c.origin + off;
  rd = c.ll + c.horiz * s + c.vert * t - c.origin - off;
}

static Scene load_scene(const char *path) {
  std::ifstream f(path);
  if (!f) {
    std::cerr << "cannot open " << path << "\n";
    std::exit(1);
  }
  Scene sc;
  std::string tok;
  int n;
  f >> tok >> n;  // materials N
  sc.mats.resize(n);
  for (auto &m : sc.mats)
    f >> m.typ >> m.rough >> m.ior >> m.smoothness >> m.albedo.x >>
        m.albedo.y >> m.albedo.z >> m.reflectivity >> m.emit.x >> m.emit.y >>
        m.emit.z >> m.absorption.x >> m.absorption.y >> m.absorption.z >>
        m.absorption_scale >> m.tint.x >> m.tint.y >> m.tint.z;
  f >> tok >> n;  // objects N
  sc.objs.resize(n);
  for (auto &o : sc.objs)
    f >> o.typ >> o.mat >> o.pos.x >> o.pos.y >> o.pos.z >> o.size.x >>
        o.size.y >> o.size.z;
  f >> tok >> sc.cpos.x >> sc.cpos.y >> sc.cpos.z >> sc.ctarget.x >>
      sc.ctarget.y >> sc.ctarget.z >> sc.cup.x >> sc.cup.y >> sc.cup.z >>
      sc.fov >> sc.aperture >> sc.focus >> sc.aspect;
  f >> tok >> sc.sky_mode >> sc.sky_a.x >> sc.sky_a.y >> sc.sky_a.z >>
      sc.sky_b.x >> sc.sky_b.y >> sc.sky_b.z;
  return sc;
}

int main(int argc, char **argv) {
  if (argc < 5) {
    std::cerr << "usage: cpu_proxy scene.txt W H spp [depth] [threads] [out.ppm]\n";
    return 2;
  }
  Scene sc = load_scene(argv[1]);
  int W = std::atoi(argv[2]), H = std::atoi(argv[3]), spp = std::atoi(argv[4]);
  int depth = argc > 5 ? std::atoi(argv[5]) : 10;
  int threads = argc > 6 ? std::atoi(argv[6])
                         : int(std::thread::hardware_concurrency());
  if (threads < 1) threads = 1;
  const char *out = argc > 7 ? argv[7] : nullptr;

  double aspect = sc.aspect != 0 ? sc.aspect : double(W) / double(H);
  Camera cam = make_camera(sc, aspect);

  std::vector<unsigned char> img(size_t(W) * H * 3, 0);
  // 32x32 tile queue (renderer.go:132-157)
  const int TILE = 32;
  int tx = (W + TILE - 1) / TILE, ty = (H + TILE - 1) / TILE;
  std::atomic<int> next_tile{0};
  std::atomic<long> total_segments{0};

  auto t0 = std::chrono::steady_clock::now();
  auto worker = [&](int wid) {
    Rng rng(0x853C49E6748FEA9Bull ^ (uint64_t(wid) * 0x9E3779B97F4A7C15ull));
    g_segments = 0;
    for (;;) {
      int t = next_tile.fetch_add(1);
      if (t >= tx * ty) break;
      int x0 = (t % tx) * TILE, y0 = (t / tx) * TILE;
      int x1 = std::min(x0 + TILE, W), y1 = std::min(y0 + TILE, H);
      for (int y = y0; y < y1; y++) {
        for (int x = x0; x < x1; x++) {
          V3 col{0, 0, 0};
          for (int s = 0; s < spp; s++) {
            double u = (x + rng.next()) / double(W - 1);
            double v = ((H - 1 - y) + rng.next()) / double(H - 1);
            V3 ro, rd;
            get_ray(cam, rng, u, v, ro, rd);
            col = col + ray_color(sc, rng, ro, rd, depth, depth);
          }
          col = col * (1.0 / spp);
          auto g = [](double c) {
            c = std::sqrt(c);
            if (c < 0) c = 0;
            if (c > 0.999) c = 0.999;
            return (unsigned char)(256 * c);
          };
          size_t i = (size_t(y) * W + x) * 3;
          img[i] = g(col.x);
          img[i + 1] = g(col.y);
          img[i + 2] = g(col.z);
        }
      }
    }
    total_segments += g_segments;
  };

  std::vector<std::thread> pool;
  for (int i = 0; i < threads; i++) pool.emplace_back(worker, i);
  for (auto &th : pool) th.join();
  double secs = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
                    .count();

  if (out) {
    std::ofstream o(out, std::ios::binary);
    o << "P6\n" << W << " " << H << "\n255\n";
    o.write((char *)img.data(), img.size());
  }

  long segs = total_segments.load();
  printf(
      "{\"w\":%d,\"h\":%d,\"spp\":%d,\"depth\":%d,\"threads\":%d,"
      "\"secs\":%.3f,\"segments\":%ld,\"mrays\":%.3f}\n",
      W, H, spp, depth, threads, secs, segs, segs / secs / 1e6);
  return 0;
}
