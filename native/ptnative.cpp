// ptnative — native runtime components for path_tracer_ai_tpu.
//
// Plays the role the reference implements in C++ on the host side:
//   - OBJ geometry parsing (reference: vendored tinyobjloader, scene.cpp:11-28)
//   - acceleration-structure build (reference: BVH::build, bvh.hpp:27-72)
//
// Exposed as a C ABI consumed via ctypes (path_tracer_ai_tpu.accel.native).
// The Python implementations remain as fallbacks; outputs are byte-identical
// (same Morton ordering / stable sort) so either path can serve either
// engine.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Morton-ordered cluster build.
//
// Input:  t triangle vertex triples (v0,v1,v2 interleaved float32 [t][3][3])
// Output: order[t]   — triangle indices sorted by 30-bit Morton code of the
//                      centroid (matches accel/morton.py morton3d_np exactly)
// Returns 0 on success.
// ---------------------------------------------------------------------------

static inline uint32_t part1by2(uint32_t x) {
  x &= 0x3FF;
  x = (x | (x << 16)) & 0x030000FF;
  x = (x | (x << 8)) & 0x0300F00F;
  x = (x | (x << 4)) & 0x030C30C3;
  x = (x | (x << 2)) & 0x09249249;
  return x;
}

int pt_morton_order(const float* verts, int64_t t, int32_t* order_out) {
  if (t <= 0) return 1;
  std::vector<float> cx(t), cy(t), cz(t);
  float mnx = 1e30f, mny = 1e30f, mnz = 1e30f;
  float mxx = -1e30f, mxy = -1e30f, mxz = -1e30f;
  for (int64_t i = 0; i < t; ++i) {
    const float* v = verts + i * 9;
    cx[i] = (v[0] + v[3] + v[6]) / 3.0f;
    cy[i] = (v[1] + v[4] + v[7]) / 3.0f;
    cz[i] = (v[2] + v[5] + v[8]) / 3.0f;
    mnx = std::min(mnx, cx[i]); mxx = std::max(mxx, cx[i]);
    mny = std::min(mny, cy[i]); mxy = std::max(mxy, cy[i]);
    mnz = std::min(mnz, cz[i]); mxz = std::max(mxz, cz[i]);
  }
  const float ex = std::max(mxx - mnx, 1e-12f);
  const float ey = std::max(mxy - mny, 1e-12f);
  const float ez = std::max(mxz - mnz, 1e-12f);
  const float scale = 1024.0f;
  std::vector<uint32_t> codes(t);
  for (int64_t i = 0; i < t; ++i) {
    // mirror morton3d_np: q = clip((p-min)/extent, 0, 1-1e-7); cell = min(q*1024, 1023)
    auto cell = [](float v, float mn, float e, float s) -> uint32_t {
      float q = (v - mn) / e;
      q = std::min(std::max(q, 0.0f), 1.0f - 1e-7f);
      uint32_t c = (uint32_t)(q * s);
      return std::min(c, 1023u);
    };
    uint32_t qx = cell(cx[i], mnx, ex, scale);
    uint32_t qy = cell(cy[i], mny, ey, scale);
    uint32_t qz = cell(cz[i], mnz, ez, scale);
    codes[i] = (part1by2(qx) << 2) | (part1by2(qy) << 1) | part1by2(qz);
  }
  std::vector<int32_t> idx(t);
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(),
                   [&](int32_t a, int32_t b) { return codes[a] < codes[b]; });
  std::memcpy(order_out, idx.data(), t * sizeof(int32_t));
  return 0;
}

// ---------------------------------------------------------------------------
// OBJ parsing (geometry subset: v/vn/vt/f with fan triangulation, negative
// indices, usemtl face material slots; mtllib names are returned for Python
// to parse — MTL files are tiny, the OBJ body is the hot part).
//
// Two-call protocol:
//   pt_obj_parse(path, &handle)       -> sizes via pt_obj_counts
//   pt_obj_read(handle, ...buffers)   -> fills caller-allocated buffers
//   pt_obj_free(handle)
// ---------------------------------------------------------------------------

struct ObjHandle {
  std::vector<float> vertices;   // 3 per v
  std::vector<float> normals;    // 3 per vn
  std::vector<float> texcoords;  // 2 per vt
  std::vector<int32_t> v_idx;    // 3 per tri
  std::vector<int32_t> n_idx;
  std::vector<int32_t> t_idx;
  std::vector<int32_t> mat_ids;  // 1 per tri (slot index in usemtl order)
  std::vector<char> usemtl_names;  // NUL-separated unique names in order
  std::vector<char> mtllib_names;  // NUL-separated mtllib args in order
  int32_t n_usemtl = 0;
  int32_t n_mtllib = 0;
};

static inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

// Face triangulation: fan for convex faces, ear clipping for concave.
// EXACT twin of objloader.py _triangulate_face — same double-precision
// expressions, evaluation order, and ear-selection order, so the native
// and Python parsers emit byte-identical triangle streams.
static void triangulate_face(const std::vector<int32_t>& fv,
                             const std::vector<float>& vertices,
                             std::vector<int>& out) {
  const int n = (int)fv.size();
  auto fan = [&]() {
    for (int k = 1; k + 1 < n; ++k) {
      out.push_back(0); out.push_back(k); out.push_back(k + 1);
    }
  };
  if (n < 3) return;
  if (n == 3) { out.push_back(0); out.push_back(1); out.push_back(2); return; }
  const long vcount = (long)(vertices.size() / 3);
  for (int k = 0; k < n; ++k)
    if (fv[k] < 0 || fv[k] >= vcount) { fan(); return; }

  // Newell normal (double precision).
  double nx = 0.0, ny = 0.0, nz = 0.0;
  for (int i = 0; i < n; ++i) {
    const int j = (i + 1) % n;
    const double xi = vertices[3 * fv[i] + 0], yi = vertices[3 * fv[i] + 1],
                 zi = vertices[3 * fv[i] + 2];
    const double xj = vertices[3 * fv[j] + 0], yj = vertices[3 * fv[j] + 1],
                 zj = vertices[3 * fv[j] + 2];
    nx += (yi - yj) * (zi + zj);
    ny += (zi - zj) * (xi + xj);
    nz += (xi - xj) * (yi + yj);
  }
  const double ax = std::fabs(nx), ay = std::fabs(ny), az = std::fabs(nz);
  std::vector<double> u(n), v(n);
  double sgn;
  if (ax >= ay && ax >= az) {
    sgn = nx >= 0.0 ? 1.0 : -1.0;
    for (int k = 0; k < n; ++k) {
      u[k] = vertices[3 * fv[k] + 1]; v[k] = vertices[3 * fv[k] + 2];
    }
  } else if (ay >= az) {
    sgn = ny >= 0.0 ? 1.0 : -1.0;
    for (int k = 0; k < n; ++k) {
      u[k] = vertices[3 * fv[k] + 2]; v[k] = vertices[3 * fv[k] + 0];
    }
  } else {
    sgn = nz >= 0.0 ? 1.0 : -1.0;
    for (int k = 0; k < n; ++k) {
      u[k] = vertices[3 * fv[k] + 0]; v[k] = vertices[3 * fv[k] + 1];
    }
  }
  if (ax == 0.0 && ay == 0.0 && az == 0.0) { fan(); return; }

  double scale = 0.0;
  for (int k = 0; k < n; ++k) {
    scale = std::max(scale, std::fabs(u[k]));
    scale = std::max(scale, std::fabs(v[k]));
  }
  const double eps = 1e-12 * scale * scale;

  auto cross2 = [&](int a, int b, int c) -> double {
    return (u[b] - u[a]) * (v[c] - v[b]) - (v[b] - v[a]) * (u[c] - u[b]);
  };

  bool convex = true;
  for (int i = 0; i < n; ++i) {
    if (sgn * cross2(i, (i + 1) % n, (i + 2) % n) < -eps) {
      convex = false;
      break;
    }
  }
  if (convex) { fan(); return; }

  auto inside = [&](int m, int a, int b, int c) -> bool {
    return sgn * cross2(a, b, m) > eps && sgn * cross2(b, c, m) > eps &&
           sgn * cross2(c, a, m) > eps;
  };

  std::vector<int> live(n);
  for (int k = 0; k < n; ++k) live[k] = k;
  while ((int)live.size() > 3) {
    bool clipped = false;
    for (int idx = 0; idx < (int)live.size(); ++idx) {
      const int a = idx ? live[idx - 1] : live.back();
      const int b = live[idx];
      const int c = live[(idx + 1) % live.size()];
      if (sgn * cross2(a, b, c) <= eps) continue;  // reflex or flat
      bool blocked = false;
      for (int m : live) {
        if (m == a || m == b || m == c) continue;
        if (inside(m, a, b, c)) { blocked = true; break; }
      }
      if (blocked) continue;
      out.push_back(a); out.push_back(b); out.push_back(c);
      live.erase(live.begin() + idx);
      clipped = true;
      break;
    }
    if (!clipped) {
      // degenerate remainder: complete with a fan, like the Python twin
      for (size_t k = 1; k + 1 < live.size(); ++k) {
        out.push_back(live[0]); out.push_back(live[k]);
        out.push_back(live[k + 1]);
      }
      return;
    }
  }
  out.push_back(live[0]); out.push_back(live[1]); out.push_back(live[2]);
}

int pt_obj_parse(const char* path, void** handle_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(sz + 1);
  if (sz > 0 && std::fread(buf.data(), 1, sz, f) != (size_t)sz) {
    std::fclose(f);
    return 2;
  }
  std::fclose(f);
  buf[sz] = '\0';

  auto* h = new ObjHandle();
  std::vector<std::pair<std::string, int>> mat_slots;  // name -> slot
  int cur_mat = -1;

  const char* p = buf.data();
  const char* end = buf.data() + sz;
  // per-face corner scratch
  std::vector<int32_t> fv, ft, fn;
  std::vector<int> tri_scratch;

  while (p < end) {
    const char* line_end = (const char*)memchr(p, '\n', end - p);
    if (!line_end) line_end = end;
    const char* q = skip_ws(p, line_end);

    if (q + 1 < line_end && q[0] == 'v' &&
        (q[1] == ' ' || q[1] == '\t')) {
      char* np_;
      float a = std::strtof(q + 1, &np_);
      float b = std::strtof(np_, &np_);
      float c = std::strtof(np_, &np_);
      h->vertices.push_back(a);
      h->vertices.push_back(b);
      h->vertices.push_back(c);
    } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 'n' &&
               (q[2] == ' ' || q[2] == '\t')) {
      char* np_;
      float a = std::strtof(q + 2, &np_);
      float b = std::strtof(np_, &np_);
      float c = std::strtof(np_, &np_);
      h->normals.push_back(a);
      h->normals.push_back(b);
      h->normals.push_back(c);
    } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 't' &&
               (q[2] == ' ' || q[2] == '\t')) {
      char* np_;
      float a = std::strtof(q + 2, &np_);
      float b = std::strtof(np_, &np_);
      h->texcoords.push_back(a);
      h->texcoords.push_back(b);
    } else if (q < line_end && q[0] == 'f' &&
               (q + 1 == line_end || q[1] == ' ' || q[1] == '\t')) {
      fv.clear(); ft.clear(); fn.clear();
      const char* r = q + 1;
      while (r < line_end) {
        r = skip_ws(r, line_end);
        if (r >= line_end) break;
        // parse i[/j[/k]] with negative-relative resolution
        char* np_;
        long vi = std::strtol(r, &np_, 10);
        if (np_ == r) break;
        r = np_;
        long ti = 0, ni = 0;
        bool has_t = false, has_n = false;
        if (r < line_end && *r == '/') {
          ++r;
          if (r < line_end && *r != '/') {
            ti = std::strtol(r, &np_, 10);
            has_t = true;
            r = np_;
          }
          if (r < line_end && *r == '/') {
            ++r;
            ni = std::strtol(r, &np_, 10);
            has_n = (np_ != r);
            r = np_;
          }
        }
        auto resolve = [](long i, size_t count) -> int32_t {
          if (i > 0) return (int32_t)(i - 1);
          if (i < 0) return (int32_t)((long)count + i);
          return -1;
        };
        fv.push_back(resolve(vi, h->vertices.size() / 3));
        ft.push_back(has_t ? resolve(ti, h->texcoords.size() / 2) : -1);
        fn.push_back(has_n ? resolve(ni, h->normals.size() / 3) : -1);
      }
      // triangulation (matches objloader.py _triangulate_face exactly:
      // fan for convex faces, ear clipping for concave — same double-
      // precision expressions, same ear-selection order, so both parsers
      // stay byte-identical)
      tri_scratch.clear();
      triangulate_face(fv, h->vertices, tri_scratch);
      for (size_t k = 0; k + 3 <= tri_scratch.size(); k += 3) {
        int ia = tri_scratch[k], ib = tri_scratch[k + 1],
            ic = tri_scratch[k + 2];
        h->v_idx.push_back(fv[ia]); h->v_idx.push_back(fv[ib]); h->v_idx.push_back(fv[ic]);
        h->t_idx.push_back(ft[ia]); h->t_idx.push_back(ft[ib]); h->t_idx.push_back(ft[ic]);
        h->n_idx.push_back(fn[ia]); h->n_idx.push_back(fn[ib]); h->n_idx.push_back(fn[ic]);
        h->mat_ids.push_back(cur_mat);
      }
    } else if (line_end - q > 7 && std::strncmp(q, "usemtl", 6) == 0 &&
               (q[6] == ' ' || q[6] == '\t')) {
      const char* name_start = skip_ws(q + 6, line_end);
      const char* name_end = line_end;
      while (name_end > name_start &&
             std::isspace((unsigned char)name_end[-1]))
        --name_end;
      std::string name(name_start, name_end);
      cur_mat = -1;
      for (auto& s : mat_slots)
        if (s.first == name) { cur_mat = s.second; break; }
      if (cur_mat == -1) {
        // record the usemtl name; Python maps it to MTL-file order
        cur_mat = (int)mat_slots.size();
        mat_slots.emplace_back(name, cur_mat);
        h->usemtl_names.insert(h->usemtl_names.end(), name.begin(), name.end());
        h->usemtl_names.push_back('\0');
        h->n_usemtl++;
      }
    } else if (line_end - q > 7 && std::strncmp(q, "mtllib", 6) == 0 &&
               (q[6] == ' ' || q[6] == '\t')) {
      const char* r = q + 6;
      while (r < line_end) {
        r = skip_ws(r, line_end);
        const char* ns = r;
        while (r < line_end && !std::isspace((unsigned char)*r)) ++r;
        if (r > ns) {
          h->mtllib_names.insert(h->mtllib_names.end(), ns, r);
          h->mtllib_names.push_back('\0');
          h->n_mtllib++;
        }
      }
    }
    p = line_end + 1;
  }

  *handle_out = h;
  return 0;
}

void pt_obj_counts(void* handle, int64_t* nv, int64_t* nn, int64_t* nt,
                   int64_t* nf, int64_t* usemtl_bytes, int32_t* n_usemtl,
                   int64_t* mtllib_bytes, int32_t* n_mtllib) {
  auto* h = (ObjHandle*)handle;
  *nv = h->vertices.size() / 3;
  *nn = h->normals.size() / 3;
  *nt = h->texcoords.size() / 2;
  *nf = h->mat_ids.size();
  *usemtl_bytes = (int64_t)h->usemtl_names.size();
  *n_usemtl = h->n_usemtl;
  *mtllib_bytes = (int64_t)h->mtllib_names.size();
  *n_mtllib = h->n_mtllib;
}

void pt_obj_read(void* handle, float* vertices, float* normals,
                 float* texcoords, int32_t* v_idx, int32_t* n_idx,
                 int32_t* t_idx, int32_t* mat_ids, char* usemtl_names,
                 char* mtllib_names) {
  auto* h = (ObjHandle*)handle;
  auto cp = [](auto& vec, auto* dst) {
    if (!vec.empty()) std::memcpy(dst, vec.data(), vec.size() * sizeof(vec[0]));
  };
  cp(h->vertices, vertices);
  cp(h->normals, normals);
  cp(h->texcoords, texcoords);
  cp(h->v_idx, v_idx);
  cp(h->n_idx, n_idx);
  cp(h->t_idx, t_idx);
  cp(h->mat_ids, mat_ids);
  cp(h->usemtl_names, usemtl_names);
  cp(h->mtllib_names, mtllib_names);
}

void pt_obj_free(void* handle) { delete (ObjHandle*)handle; }

// ---------------------------------------------------------------------------
// Median-split cluster ordering (the production accel build,
// clusters._median_split_order; reference role: BVH::buildRecursive's
// nth_element median split, bvh.hpp:44-72).
//
// Input:  centers [t][3] float32 triangle centroids, cluster size s
// Output: order[t] — triangles of each split-emitted leaf contiguous.
// Contract vs the Python fallback: identical split STRUCTURE (same sizes,
// same pivot rule: half = clamp(round_up(n/2, s), s, n-1)); the two sides
// of every split are equal as sets except when centroid values tie exactly
// at the pivot (both partitions are then valid median splits). Traversal is
// exact under any valid order, so images are unaffected.
// Returns 0 on success.
// ---------------------------------------------------------------------------

int pt_split_order(const float* centers, int64_t t, int64_t cluster_size,
                   int32_t* order_out) {
  if (t <= 0 || cluster_size <= 0) return 1;
  const int64_t s = cluster_size;
  std::vector<int32_t> idx(t);
  std::iota(idx.begin(), idx.end(), 0);
  // Stack of [begin, end) ranges over idx; process left halves first so
  // leaves are emitted left-to-right (matches the Python stack order).
  std::vector<std::pair<int64_t, int64_t>> stack;
  stack.emplace_back(0, t);
  int64_t out_pos = 0;
  while (!stack.empty()) {
    auto [b, e] = stack.back();
    stack.pop_back();
    const int64_t n = e - b;
    if (n <= s) {
      std::memcpy(order_out + out_pos, idx.data() + b, n * sizeof(int32_t));
      out_pos += n;
      continue;
    }
    float mn[3] = {1e30f, 1e30f, 1e30f};
    float mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = b; i < e; ++i) {
      const float* c = centers + (int64_t)idx[i] * 3;
      for (int a = 0; a < 3; ++a) {
        mn[a] = std::min(mn[a], c[a]);
        mx[a] = std::max(mx[a], c[a]);
      }
    }
    int axis = 0;
    float best = mx[0] - mn[0];
    for (int a = 1; a < 3; ++a) {
      if (mx[a] - mn[a] > best) { best = mx[a] - mn[a]; axis = a; }
    }
    int64_t half = ((n / 2 + s - 1) / s) * s;
    half = std::min(std::max(half, s), n - 1);
    std::nth_element(
        idx.begin() + b, idx.begin() + b + half - 1, idx.begin() + e,
        [&](int32_t x, int32_t y) {
          return centers[(int64_t)x * 3 + axis] <
                 centers[(int64_t)y * 3 + axis];
        });
    stack.emplace_back(b + half, e);  // right pushed first,
    stack.emplace_back(b, b + half);  // left processed (emitted) first
  }
  return out_pos == t ? 0 : 2;
}

}  // extern "C"
