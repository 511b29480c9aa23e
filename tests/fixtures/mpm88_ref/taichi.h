// Minimal shim for the reference's `#include "taichi.h"` so that
// /root/reference/mls-mpm88.cpp compiles UNMODIFIED on plain g++ with
// zero network access (the real single-header taichi.h is a download
// the build environment cannot fetch). Only the symbols that file uses
// are provided; numerics (float32 `real`, truncating cast<int>,
// closed-form 2x2 polar/SVD with non-negative singular values) follow
// the published MLS-MPM conventions the reference relies on. The GUI
// surface is a no-op: the fixture harness never runs the reference's
// main() (it is renamed via -Dmain=... and only advance()/add_object()
// are driven).
#pragma once
#include <algorithm>
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

namespace taichi {

using real = float;

inline real operator""_f(long double v) { return static_cast<real>(v); }
inline real operator""_f(unsigned long long v) {
  return static_cast<real>(v);
}

template <typename T>
inline T clamp(T v, T lo, T hi) {
  return std::max(lo, std::min(hi, v));
}

// compile-time integer power (taichi's pow<N>; used by tetris.cpp for
// pow<1>(Jp) and pow<2>(n/80.0))
template <int N, typename T>
inline T pow(T v) {
  T r = T(1);
  for (int i = 0; i < N; i++) r *= v;
  return r;
}

// deterministic RNG for Vec::rand() — fixture reproducibility
inline std::mt19937 &rng_() {
  static std::mt19937 gen(42u);
  return gen;
}
inline real rand_real() {
  return std::uniform_real_distribution<real>(0.0f, 1.0f)(rng_());
}

struct Vector3;

template <typename T>
struct Vector2D {
  T x = 0, y = 0;
  Vector2D() = default;
  explicit Vector2D(T a) : x(a), y(a) {}
  Vector2D(T a, T b) : x(a), y(b) {}
  explicit Vector2D(const Vector3 &v);  // takes (x, y); defined below
  template <typename S>
  Vector2D<S> cast() const {
    return Vector2D<S>(static_cast<S>(x), static_cast<S>(y));
  }
  Vector2D operator+(const Vector2D &o) const { return {x + o.x, y + o.y}; }
  Vector2D operator-(const Vector2D &o) const { return {x - o.x, y - o.y}; }
  Vector2D operator*(const Vector2D &o) const { return {x * o.x, y * o.y}; }
  Vector2D operator*(T s) const { return {x * s, y * s}; }
  Vector2D &operator+=(const Vector2D &o) {
    x += o.x;
    y += o.y;
    return *this;
  }
  static Vector2D rand() { return {rand_real(), rand_real()}; }
};
template <typename T>
inline Vector2D<T> operator*(T s, const Vector2D<T> &v) {
  return v * s;
}
template <typename T>
inline Vector2D<T> sqr(const Vector2D<T> &v) {
  return {v.x * v.x, v.y * v.y};
}

using Vector2 = Vector2D<real>;
using Vector2i = Vector2D<int>;

struct Vector3 {
  real d[3] = {0, 0, 0};
  Vector3() = default;
  explicit Vector3(real a) : d{a, a, a} {}
  Vector3(real a, real b, real c) : d{a, b, c} {}
  Vector3(const Vector2 &v, real c) : d{v.x, v.y, c} {}
  real &operator[](int i) { return d[i]; }
  real operator[](int i) const { return d[i]; }
  Vector3 operator+(const Vector3 &o) const {
    return {d[0] + o.d[0], d[1] + o.d[1], d[2] + o.d[2]};
  }
  Vector3 &operator+=(const Vector3 &o) {
    d[0] += o.d[0];
    d[1] += o.d[1];
    d[2] += o.d[2];
    return *this;
  }
  Vector3 &operator/=(real s) {
    d[0] /= s;
    d[1] /= s;
    d[2] /= s;
    return *this;
  }
  Vector3 operator*(real s) const { return {d[0] * s, d[1] * s, d[2] * s}; }
};
inline Vector3 operator*(real s, const Vector3 &v) { return v * s; }

template <>
inline Vector2D<real>::Vector2D(const Vector3 &v) : x(v.d[0]), y(v.d[1]) {}

struct Matrix2 {
  real m[2][2] = {{0, 0}, {0, 0}};
  Matrix2() = default;
  // implicit on purpose: taichi's Matrix(scalar) is a DIAGONAL matrix,
  // and the reference relies on `Matrix + scalar` meaning `+ scalar*I`
  // (the lambda*(J-1)*J pressure term in mls-mpm88.cpp:28)
  Matrix2(real diag) : m{{diag, 0}, {0, diag}} {}
  Matrix2(real a, real b, real c, real d) : m{{a, b}, {c, d}} {}
  real *operator[](int i) { return m[i]; }
  const real *operator[](int i) const { return m[i]; }
  Matrix2 operator+(const Matrix2 &o) const {
    return {m[0][0] + o.m[0][0], m[0][1] + o.m[0][1], m[1][0] + o.m[1][0],
            m[1][1] + o.m[1][1]};
  }
  Matrix2 operator-(const Matrix2 &o) const {
    return {m[0][0] - o.m[0][0], m[0][1] - o.m[0][1], m[1][0] - o.m[1][0],
            m[1][1] - o.m[1][1]};
  }
  Matrix2 operator*(const Matrix2 &o) const {
    return {m[0][0] * o.m[0][0] + m[0][1] * o.m[1][0],
            m[0][0] * o.m[0][1] + m[0][1] * o.m[1][1],
            m[1][0] * o.m[0][0] + m[1][1] * o.m[1][0],
            m[1][0] * o.m[0][1] + m[1][1] * o.m[1][1]};
  }
  Matrix2 operator*(real s) const {
    return {m[0][0] * s, m[0][1] * s, m[1][0] * s, m[1][1] * s};
  }
  Matrix2 &operator+=(const Matrix2 &o) {
    *this = *this + o;
    return *this;
  }
  Vector2 operator*(const Vector2 &v) const {
    return {m[0][0] * v.x + m[0][1] * v.y, m[1][0] * v.x + m[1][1] * v.y};
  }
  static Matrix2 outer_product(const Vector2 &a, const Vector2 &b) {
    return {a.x * b.x, a.x * b.y, a.y * b.x, a.y * b.y};
  }
};
inline Matrix2 operator*(real s, const Matrix2 &o) { return o * s; }
inline Matrix2 transposed(const Matrix2 &o) {
  return {o.m[0][0], o.m[1][0], o.m[0][1], o.m[1][1]};
}
inline real determinant(const Matrix2 &o) {
  return o.m[0][0] * o.m[1][1] - o.m[0][1] * o.m[1][0];
}

// closed-form 2x2 polar decomposition: F = R S, R a rotation
inline void polar_decomp(const Matrix2 &F, Matrix2 &R, Matrix2 &S) {
  real x = F.m[0][0] + F.m[1][1];
  real y = F.m[1][0] - F.m[0][1];
  real scale = 1.0f / std::sqrt(std::max(x * x + y * y, 1e-30f));
  real c = x * scale, s = y * scale;
  R = Matrix2(c, -s, s, c);
  S = transposed(R) * F;
}

// closed-form 2x2 SVD with non-negative singular values: F = U sig V^T
inline void svd(const Matrix2 &F, Matrix2 &U, Matrix2 &sig, Matrix2 &V) {
  Matrix2 R, S;
  polar_decomp(F, R, S);
  real c, s;
  if (std::abs(S.m[0][1]) < 1e-10f) {
    sig = Matrix2(S.m[0][0], 0, 0, S.m[1][1]);
    c = 1;
    s = 0;
  } else {
    real tao = 0.5f * (S.m[0][0] - S.m[1][1]);
    real w = std::sqrt(tao * tao + S.m[0][1] * S.m[0][1]);
    real t = tao > 0 ? S.m[0][1] / (tao + w) : S.m[0][1] / (tao - w);
    c = 1.0f / std::sqrt(t * t + 1);
    s = -t * c;
    sig = Matrix2(0);
    sig.m[0][0] = c * c * S.m[0][0] - 2 * c * s * S.m[0][1] +
                  s * s * S.m[1][1];
    sig.m[1][1] = s * s * S.m[0][0] + 2 * c * s * S.m[0][1] +
                  c * c * S.m[1][1];
  }
  if (sig.m[0][0] < sig.m[1][1]) {
    std::swap(sig.m[0][0], sig.m[1][1]);
    V = Matrix2(-s, -c, c, -s);
  } else {
    V = Matrix2(c, -s, s, c);
  }
  U = R * V;
}

// --- no-op GUI surface (the reference main() is compiled but never run)
struct Canvas {
  struct Chain {
    Chain &radius(int) { return *this; }
    Chain &color(int) { return *this; }
    void close() {}
  };
  void clear(int) {}
  Chain rect(const Vector2 &, const Vector2 &) { return {}; }
  Chain circle(const Vector2 &) { return {}; }
  struct Img {
    void write_as_image(const char *) {}
  } img;
};
struct GUI {
  Canvas canvas;
  GUI(const char *, int, int) {}
  Canvas &get_canvas() { return canvas; }
  void update() {}
};

}  // namespace taichi
