// Native scene-precompute kernels for rtmm-tpu.
//
// C++ port of the host-side precompute passes (the equivalent of the
// reference's framework/src/mesh.cpp: displacement scales :386-420,
// hierarchical min/max heights :119-198, triangle deltas :248-384, plus the
// leaf stitching of shaders/intersection.hlsl:339-376). The Python package
// falls back to the NumPy implementation (rtmm_tpu/ops/precompute.py) when
// this library is absent; tests assert both produce identical tables.
//
// Exposed via a plain C ABI for ctypes. All arrays are caller-allocated.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

struct V3 {
    float x, y, z;
};
struct V2 {
    float x, y;
};

static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 add(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 mul(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}
static inline V3 normalize(V3 a) {
    float n = std::sqrt(dot(a, a));
    if (n < 1e-20f) n = 1e-20f;
    return mul(a, 1.0f / n);
}
static inline float cross2(V2 a, V2 b) { return a.x * b.y - a.y * b.x; }
static inline V2 sub2(V2 a, V2 b) { return {a.x - b.x, a.y - b.y}; }

static inline int64_t grid_index(int64_t x, int64_t y) {
    return x * (x + 1) / 2 + y;
}

constexpr float BIG = 1e30f;

// expandTriangle (intersection.hlsl:151-172) in double precision, matching
// rtmm_tpu/ops/precompute.py::expand_triangle.
static void expand_triangle(const double v[3][2], double delta,
                            float out[3][2]) {
    double ods[3][2];
    const int e[3][2] = {{0, 1}, {1, 2}, {2, 0}};
    for (int i = 0; i < 3; i++) {
        double dx = v[e[i][1]][0] - v[e[i][0]][0];
        double dy = v[e[i][1]][1] - v[e[i][0]][1];
        double ox = dy, oy = -dx;
        double n = std::sqrt(ox * ox + oy * oy);
        if (n < 1e-20) n = 1e-20;
        ods[i][0] = delta * ox / n;
        ods[i][1] = delta * oy / n;
    }
    auto isect = [](const double p1[2], const double p2[2],
                    const double p3[2], const double p4[2], float out[2]) {
        double val1 = p1[0] * p2[1] - p1[1] * p2[0];
        double val2 = p3[0] * p4[1] - p3[1] * p4[0];
        double den = (p1[0] - p2[0]) * (p3[1] - p4[1])
                   - (p1[1] - p2[1]) * (p3[0] - p4[0]);
        if (std::fabs(den) < 1e-20) den = 1e-20;
        out[0] = (float)((val1 * (p3[0] - p4[0]) - (p1[0] - p2[0]) * val2)
                         / den);
        out[1] = (float)((val1 * (p3[1] - p4[1]) - (p1[1] - p2[1]) * val2)
                         / den);
    };
    double a0[2] = {v[0][0] + ods[0][0], v[0][1] + ods[0][1]};
    double a1[2] = {v[1][0] + ods[0][0], v[1][1] + ods[0][1]};
    double b1[2] = {v[1][0] + ods[1][0], v[1][1] + ods[1][1]};
    double b2[2] = {v[2][0] + ods[1][0], v[2][1] + ods[1][1]};
    double c2[2] = {v[2][0] + ods[2][0], v[2][1] + ods[2][1]};
    double c0[2] = {v[0][0] + ods[2][0], v[0][1] + ods[2][1]};
    isect(a0, a1, c2, c0, out[0]);
    isect(a0, a1, b1, b2, out[1]);
    isect(b1, b2, c2, c0, out[2]);
}

}  // namespace

extern "C" {

// Per-micro-vertex displacement scales (mesh.cpp:386-420, robust dot-ratio
// variant matching precompute.displacement_scales).
//   positions (M,3), displacements (M,3), present (M,), bases/dirs (3,3)
void rtmm_displacement_scales(const float* positions, const float* disps,
                              const uint8_t* present, int64_t m,
                              const float* base_pos, const float* base_dir,
                              float* out_scales) {
    V3 a = {base_pos[0], base_pos[1], base_pos[2]};
    V3 b = {base_pos[3], base_pos[4], base_pos[5]};
    V3 c = {base_pos[6], base_pos[7], base_pos[8]};
    V3 da = {base_dir[0], base_dir[1], base_dir[2]};
    V3 db = {base_dir[3], base_dir[4], base_dir[5]};
    V3 dc = {base_dir[6], base_dir[7], base_dir[8]};
    V3 v0 = sub(b, a), v1 = sub(c, a);
    double d00 = dot(v0, v0), d01 = dot(v0, v1), d11 = dot(v1, v1);
    double denom = d00 * d11 - d01 * d01;
    if (denom == 0.0) denom = 1.0;
    for (int64_t i = 0; i < m; i++) {
        V3 p = {positions[3 * i], positions[3 * i + 1], positions[3 * i + 2]};
        V3 v2 = sub(p, a);
        double d20 = dot(v2, v0), d21 = dot(v2, v1);
        double beta = (d11 * d20 - d01 * d21) / denom;
        double gamma = (d00 * d21 - d01 * d20) / denom;
        double alpha = 1.0 - beta - gamma;
        V3 dir = add(add(mul(da, (float)alpha), mul(db, (float)beta)),
                     mul(dc, (float)gamma));
        V3 dsp = {disps[3 * i], disps[3 * i + 1], disps[3 * i + 2]};
        float dd = dot(dir, dir);
        float s = dd == 0.0f ? 0.0f : dot(dsp, dir) / dd;
        out_scales[i] = present[i] ? s : -1.0f;
    }
}

// Face -> node membership digits for levels 0..level (subdivision.py::
// face_node_paths, exact integer arithmetic). face_coords: (F,3,2) finest
// grid coords. out_paths: (F, level+1).
void rtmm_face_node_paths(const int64_t* face_coords, int64_t f, int level,
                          int64_t* out_paths) {
    const int64_t s0 = ((int64_t)1) << level;
    for (int64_t i = 0; i < f; i++) {
        // x3 coordinates
        int64_t mx = 0, my = 0;
        for (int k = 0; k < 3; k++) {
            mx += face_coords[i * 6 + 2 * k];
            my += face_coords[i * 6 + 2 * k + 1];
        }
        int64_t c[3][2] = {{0, 0}, {3 * s0, 0}, {3 * s0, 3 * s0}};
        int64_t node = 0;
        out_paths[i * (level + 1)] = 0;
        for (int l = 0; l < level; l++) {
            int64_t uv0[2] = {(c[0][0] + c[1][0]) / 2, (c[0][1] + c[1][1]) / 2};
            int64_t uv1[2] = {(c[1][0] + c[2][0]) / 2, (c[1][1] + c[2][1]) / 2};
            int64_t uv2[2] = {(c[2][0] + c[0][0]) / 2, (c[2][1] + c[0][1]) / 2};
            auto x2 = [](int64_t ax, int64_t ay, int64_t bx, int64_t by) {
                return ax * by - ay * bx;
            };
            int64_t area = x2(c[1][0] - c[0][0], c[1][1] - c[0][1],
                              c[2][0] - c[0][0], c[2][1] - c[0][1]);
            int64_t aa = x2(c[1][0] - mx, c[1][1] - my,
                            c[2][0] - mx, c[2][1] - my);
            int64_t bb = x2(mx - c[0][0], my - c[0][1],
                            c[2][0] - c[0][0], c[2][1] - c[0][1]);
            int64_t gg = x2(c[1][0] - c[0][0], c[1][1] - c[0][1],
                            mx - c[0][0], my - c[0][1]);
            int digit;
            if (2 * aa > area) {          // near v0
                digit = 0;
                c[1][0] = uv0[0]; c[1][1] = uv0[1];
                c[2][0] = uv2[0]; c[2][1] = uv2[1];
            } else if (2 * bb > area) {   // near v1
                digit = 1;
                c[0][0] = uv0[0]; c[0][1] = uv0[1];
                c[2][0] = uv1[0]; c[2][1] = uv1[1];
            } else if (2 * gg > area) {   // near v2
                digit = 3;
                c[0][0] = uv2[0]; c[0][1] = uv2[1];
                c[1][0] = uv1[0]; c[1][1] = uv1[1];
            } else {                       // center
                digit = 2;
                int64_t n0[2] = {uv0[0], uv0[1]};
                c[0][0] = n0[0];  c[0][1] = n0[1];
                c[1][0] = uv1[0]; c[1][1] = uv1[1];
                c[2][0] = uv2[0]; c[2][1] = uv2[1];
            }
            node = 4 * node + digit;
            out_paths[i * (level + 1) + l + 1] = node;
        }
    }
}

// Hierarchical node min/max heights (mesh.cpp:119-198). Scatters per-face
// vertex heights into level-ordered nodes 0..level-1.
//   paths: (F, level+1) from rtmm_face_node_paths; fheights: (F,3);
//   out_minmax: (NI, 2) pre-filled by caller.
void rtmm_node_minmax(const int64_t* paths, const float* fheights, int64_t f,
                      int level, float* out_minmax) {
    int64_t offset = 0;
    for (int l = 0; l < level; l++) {
        int64_t count = ((int64_t)1) << (2 * l);
        for (int64_t n = 0; n < count; n++) {
            out_minmax[2 * (offset + n)] = BIG;
            out_minmax[2 * (offset + n) + 1] = -BIG;
        }
        for (int64_t i = 0; i < f; i++) {
            int64_t node = offset + paths[i * (level + 1) + l];
            for (int k = 0; k < 3; k++) {
                float h = fheights[3 * i + k];
                out_minmax[2 * node] = std::min(out_minmax[2 * node], h);
                out_minmax[2 * node + 1] =
                    std::max(out_minmax[2 * node + 1], h);
            }
        }
        // empty-node sentinels (prune always)
        for (int64_t n = 0; n < count; n++) {
            if (out_minmax[2 * (offset + n)] > out_minmax[2 * (offset + n) + 1]) {
                out_minmax[2 * (offset + n)] = BIG;
                out_minmax[2 * (offset + n) + 1] = -BIG;
            }
        }
        offset += count;
    }
}

// Node deltas + delta-expanded node vertices (mesh.cpp:248-384 +
// intersection.hlsl:151-172).
//   paths: (F, level+1); fpts: (F,3,2) projected displaced face points;
//   corner2d: flat per-level corner positions, levels 0..level-1 packed
//   level-ordered ((NI,3,2)); out_delta: (NI,); out_verts: (NI,3,2).
void rtmm_node_deltas(const int64_t* paths, const float* fpts, int64_t f,
                      int level, const float* corner2d, float* out_delta,
                      float* out_verts) {
    int64_t ni = (( (int64_t)1 << (2 * level)) - 1) / 3;
    for (int64_t n = 0; n < ni; n++) out_delta[n] = 0.0f;
    int64_t offset = 0;
    for (int l = 0; l < level; l++) {
        int64_t count = ((int64_t)1) << (2 * l);
        for (int64_t i = 0; i < f; i++) {
            int64_t node = offset + paths[i * (level + 1) + l];
            const float* c = corner2d + node * 6;
            V2 cv[3] = {{c[0], c[1]}, {c[2], c[3]}, {c[4], c[5]}};
            bool ccw = cross2(sub2(cv[1], cv[0]), sub2(cv[2], cv[0])) > 0.0f;
            for (int k = 0; k < 3; k++) {
                V2 p = {fpts[i * 6 + 2 * k], fpts[i * 6 + 2 * k + 1]};
                for (int e = 0; e < 3; e++) {
                    V2 a = cv[e], b = cv[(e + 1) % 3];
                    V2 ab = sub2(b, a), ap = sub2(p, a);
                    float len2 = ab.x * ab.x + ab.y * ab.y;
                    float t = len2 == 0.0f ? 0.0f
                        : (ap.x * ab.x + ap.y * ab.y) / len2;
                    t = std::clamp(t, 0.0f, 1.0f);
                    float dx = p.x - (a.x + t * ab.x);
                    float dy = p.y - (a.y + t * ab.y);
                    float dist = std::sqrt(dx * dx + dy * dy);
                    float cr = cross2(ab, ap);
                    bool outside = ccw ? (cr <= 0.0f) : (cr > 0.0f);
                    if (outside && dist > out_delta[node])
                        out_delta[node] = dist;
                }
            }
        }
        offset += count;
    }
    for (int64_t n = 0; n < ni; n++) {
        const float* c = corner2d + n * 6;
        double v[3][2] = {{c[0], c[1]}, {c[2], c[3]}, {c[4], c[5]}};
        float out[3][2];
        expand_triangle(v, out_delta[n], out);
        std::memcpy(out_verts + n * 6, out, 6 * sizeof(float));
    }
}

int rtmm_native_version() { return 1; }

}  // extern "C"
